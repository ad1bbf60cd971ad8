"""On-chip A/B of the single-launch split tree (VERDICT r4 #3):
extract_slots Rc=64 and the full rpw+write cycle, scan-slope, with
ntt_pallas._USE_SPLIT_TREE flipped between compilations in ONE process
(shared keygen; the remote compile service caches nothing across
processes).

Usage: FHERAM_NTT=pallas python scripts/split_tree_probe.py
       [FHERAM_CONFIG=2_18tr|2_18r]
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import (
    PARAMS_2_18_READOPT, PARAMS_2_18_TURBO_READOPT)

par = {"2_18r": PARAMS_2_18_READOPT}.get(
    os.environ.get("FHERAM_CONFIG", ""), PARAMS_2_18_TURBO_READOPT)

from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops
from fhe_ram_tpu.ops import ntt_pallas
from fhe_ram_tpu.core import glwe, keys, keyswitch, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def slope(name, fn, arg, k=8):
    def k_fn(kk):
        def g(a):
            def body(a, _):
                return fn(a), ()
            a, _ = jax.lax.scan(body, a, None, length=kk)
            return jax.tree.leaves(a)[0].ravel()[0]
        return jax.jit(g)

    f1, fk = k_fn(1), k_fn(k)
    t0 = time.time()
    np.asarray(f1(arg)); np.asarray(fk(arg))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)

    def best(f):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (best(fk) - best(f1)) / (k - 1) * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    rnd = np.random.default_rng(5)
    idx = int(rnd.integers(0, par.max_addr))
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    ap = address_mod.prepare(ctx, addr)
    W, C, L, n = par.word_size, par.rank + 1, par.limbs_ct, par.n
    atk = ekp.atk_glwe

    ct1 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, C, L, n)), jnp.int32)
    data = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16,
                     size=(W, par.num_rows, C, L, n)), jnp.int32)
    w_ct = jnp.asarray(
        rnd.integers(-(1 << 14), 1 << 14, size=(W, C, L, n)), jnp.int32)

    def extract(x):
        t = keyswitch.extract_slots(par, ctx, x, 64, atk,
                                    bounded_support=True)
        return limb_ops.normalize(x + t[:, 0])

    def rmw(d):
        o, d2, tree = ram_mod.rpw_impl(par, ctx, d, ap.coordinates, atk)
        d3 = ram_mod.write_impl(par, ctx, d2, tree, w_ct, addr.coordinates,
                                ekp)
        return d3

    results = {}
    for mode in (False, True):
        ntt_pallas._USE_SPLIT_TREE = mode
        tag = "TREE" if mode else "per-level"
        results[f"extract/{tag}"] = slope(f"extract_slots Rc=64 [{tag}]",
                                          extract, ct1)
        results[f"rmw/{tag}"] = slope(f"rpw+write cycle [{tag}]", rmw,
                                      data, k=6)
    print({k: round(v, 3) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
