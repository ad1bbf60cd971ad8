"""Settle BASELINE config 3 (VERDICT r4 #4): batched reads at
TURBO_READOPT with the spectral cache -- hybrid-depth pack sweep
(FHERAM_BATCH_PACK_DEEP), _BATCH_CHUNK re-probe, and the B=512/1024
sliced numbers, all scan-slope in ONE process.

Usage: FHERAM_NTT=pallas python scripts/batch_settle_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_2_18_TURBO_READOPT as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.ram.ram import read_batch_impl
from fhe_ram_tpu.ram.address import spectral_cache


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    rnd = np.random.default_rng(5)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    tpu = jax.devices()[0]
    ram_dev = jax.device_put(ram_ct, tpu)
    atk = jax.device_put(ekp.atk_glwe, tpu)
    cache = jax.jit(lambda d: spectral_cache(par, ctx, d))(ram_dev)
    jax.block_until_ready(cache)

    Bmax = int(os.environ.get("FHERAM_SETTLE_BMAX", "1024"))
    print("encrypting addresses...", flush=True)
    aps = [address_mod.prepare(ctx, address_mod.encrypt(
        par, ctx, s_ntt, int(rnd.integers(0, par.max_addr)), src))
        for _ in range(Bmax)]
    # stage on HOST; device_put only the probed slice (B=1024 coords are
    # ~10 GB at the turbo GGSW size -- they cannot sit in HBM en bloc
    # next to the spectral cache)
    coords_all = tuple(
        np.stack([np.asarray(a.coordinates[i]) for a in aps], 0)
        for i in range(len(aps[0].coordinates)))
    print("addresses ready", flush=True)

    def probe(B, deep, chunk, kb=4):
        ram_mod._BATCH_PACK_DEEP = deep
        ram_mod._BATCH_CHUNK = chunk
        c = jax.device_put(
            jax.tree.map(lambda x: x[:B], coords_all), tpu)

        def k_batch(kk):
            def fn(d, cc, atk_in, cache_in):
                def body(carry, i):
                    cs = jax.tree.map(lambda x: jnp.roll(x, i, axis=0), cc)
                    y = read_batch_impl(par, ctx, d, cs, atk_in, cache_in)
                    return carry + jnp.sum(y[0, 0, :, 0, 0]), None
                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                      jnp.arange(kk))
                return acc
            return jax.jit(fn)

        b1, bk = k_batch(1), k_batch(kb)
        t0 = time.time()
        np.asarray(b1(ram_dev, c, atk, cache))
        np.asarray(bk(ram_dev, c, atk, cache))
        print(f"B={B} deep={deep} chunk={chunk}: compile {time.time()-t0:.0f}s",
              flush=True)

        def best(f, n=5):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                np.asarray(f(ram_dev, c, atk, cache))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        slope_s = (best(bk) - best(b1)) / (kb - 1)
        rps = B / slope_s
        print(f"B={B} deep={deep} chunk={chunk}: {rps:.1f} reads/s "
              f"({slope_s*1e3/B:.3f} ms/read)", flush=True)
        return rps

    results = {}
    only = os.environ.get("FHERAM_SETTLE_ONLY")
    if only:  # e.g. FHERAM_SETTLE_ONLY=512,1024 -- publish runs only
        deep = int(os.environ.get("FHERAM_SETTLE_DEEP", "0"))
        for B in [int(x) for x in only.split(",")]:
            try:
                results[(B, deep, 64)] = probe(B, deep, 64, kb=2)
            except Exception as e:
                print(f"B={B}: DOES NOT FIT one call "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        print({k: round(v, 1) for k, v in results.items()}, flush=True)
        return
    # hybrid-depth sweep at B=64 (per-address trees are 64-leaf: deep=8
    # folds the last 3 levels, deep=16 the last 4)
    for deep in (0, 8, 16):
        results[(64, deep, 64)] = probe(64, deep, 64)
    best_deep = max((0, 8, 16), key=lambda d: results[(64, d, 64)])
    # chunk re-probe at B=256 (chunk only matters when B > chunk)
    for chunk in (64, 128):
        results[(256, best_deep, chunk)] = probe(256, best_deep, chunk,
                                                 kb=3)
    best_chunk = max((64, 128),
                     key=lambda ch: results[(256, best_deep, ch)])
    # publish the large-batch sliced numbers
    for B in (512, 1024):
        results[(B, best_deep, best_chunk)] = probe(B, best_deep,
                                                    best_chunk, kb=2)
    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
