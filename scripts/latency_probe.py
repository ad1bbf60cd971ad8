"""True read-latency probe: run k reads inside one jitted scan, fetch one
tiny result; per-read time = (T_k - T_0) / k.

Robust against async-dispatch timing artifacts (block_until_ready over
the axon tunnel does not reliably wait)."""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_CODE_2_14, PARAMS_2_18_WIDE, PARAMS_2_14_WIDE,
    PARAMS_2_18_TURBO, PARAMS_2_18_READOPT, PARAMS_2_14_READOPT)

CONFIGS = {
    "2_18": PARAMS_README_2_18,
    "2_14": PARAMS_CODE_2_14,
    "2_18w": PARAMS_2_18_WIDE,
    "2_14w": PARAMS_2_14_WIDE,
    "2_18t": PARAMS_2_18_TURBO,
    "2_18r": PARAMS_2_18_READOPT,
    "2_14r": PARAMS_2_14_READOPT,
}
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2_14")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cached", action="store_true",
                    help="use the spectral data cache (read-heavy mode)")
    args = ap.parse_args()
    par = CONFIGS[args.config]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    import contextlib
    # the pallas NTT backend cannot lower on CPU, and client-side
    # transforms must share the server's spectrum order -> run client
    # ops on the TPU when it is selected
    client_dev = (jax.default_device(cpu)
                  if os.environ.get("FHERAM_NTT") != "pallas"
                  else contextlib.nullcontext())
    with client_dev:
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        ekp = keys.prepare(par, keys.keygen(par, sk, src))
        rnd = np.random.default_rng(5)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        idxs = [int(rnd.integers(0, par.max_addr)) for _ in range(args.k)]
        aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
               for i in idxs]
        coords_stacked = tuple(
            jnp.stack([a.coordinates[i] for a in aps], axis=0)
            for i in range(len(aps[0].coordinates))
        )

    ram_dev = jax.device_put(ram_ct, tpu)
    atk_dev = jax.device_put(ekp.atk_glwe, tpu)
    coords_dev = jax.device_put(coords_stacked, tpu)

    cache_dev = None
    if args.cached:
        from fhe_ram_tpu.ram.address import spectral_cache

        cache_dev = jax.jit(lambda d: spectral_cache(par, ctx, d))(ram_dev)

    def k_reads(k):
        def body(carry, cs):
            if cache_dev is not None:
                out = ram_mod.read_batch_impl(
                    par, ctx, ram_dev_ref[0],
                    jax.tree.map(lambda c: c[None], cs), atk_ref[0],
                    cache_ref[0])[0]
            else:
                out = ram_mod.read_impl(par, ctx, ram_dev_ref[0], cs,
                                        atk_ref[0])
            return carry + jnp.sum(out[:, :, 0, 0]), None

        def fn(data_in, coords_in, atk_in, cache_in):
            ram_dev_ref[0] = data_in
            atk_ref[0] = atk_in
            cache_ref[0] = cache_in
            cs_k = jax.tree.map(lambda c: c[:k], coords_in)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), cs_k)
            return acc

        return jax.jit(fn)

    cache_ref = [None]

    ram_dev_ref = [None]
    atk_ref = [None]

    for k in (1, args.k):
        fn = k_reads(k)
        t0 = time.time()
        r = np.asarray(fn(ram_dev, coords_dev, atk_dev, cache_dev))
        print(f"k={k} compile+run: {time.time()-t0:.1f}s result={r}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = np.asarray(fn(ram_dev, coords_dev, atk_dev, cache_dev))
            ts.append(time.time() - t0)
        print(f"k={k} times: {[f'{t*1000:.1f}ms' for t in ts]}", flush=True)
        if k == 1:
            t1 = min(ts)
        else:
            tk = min(ts)
            print(f"per-read: {(tk - t1) / (k - 1) * 1000:.2f} ms  "
                  f"(k=1: {t1*1000:.1f} ms incl. overhead)", flush=True)


if __name__ == "__main__":
    main()
