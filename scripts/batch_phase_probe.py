"""Per-phase attribution of the BATCHED read at 2^18 with random
operands (no keygen): times level-0 batched product, batched pack,
per-batch level-1 + trace, against their single-read counterparts.

Usage: FHERAM_NTT=pallas python scripts/batch_phase_probe.py [--b 16]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import keyswitch
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    r = jax.block_until_ready(f(*args))
    # one dependent scalar fetch to defeat async-enqueue timing
    np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000
    print(f"{name}: {ms:.1f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    args = ap.parse_args()
    B = args.b

    rnd = np.random.default_rng(0)
    n, C = par.n, par.rank + 1
    P, W, R, L = par.num_primes, par.word_size, par.num_rows, par.limbs_ct
    Lg = par.limbs_ggsw
    b2d = par.base2d()
    dig0, dig1 = (len(r.bases) for r in b2d.rows)

    data = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, R, C, L, n)), jnp.int32)
    coords0 = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18,
                     size=(B, P, dig0, L, C, C, Lg, n)), jnp.int32)
    coords1 = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18,
                     size=(B, P, dig1, L, C, C, Lg, n)), jnp.int32)
    atk = {
        g: jnp.asarray(
            rnd.integers(-(1 << 18), 1 << 18,
                         size=(P, L, par.rank, C, par.limbs_evk_trace, n)),
            jnp.int32)
        for g in par.trace_gal_els + tuple(
            (n >> l) + 1 for l in range(R.bit_length() - 1))
    }

    ctx = get_ntt_context(par.n, par.primes)
    # build the (lru-cached) pallas context EAGERLY: constructing it
    # inside a jit trace leaks traced constants into the cache
    from fhe_ram_tpu.ops.ntt_pallas import get_pallas_context

    get_pallas_context(par.n, tuple(par.primes))

    t_l0b = timeit(
        f"level0 batched (B={B}, shared NTT)",
        lambda d, c: address_mod.coordinate_product_batched(par, ctx, d, c),
        data, coords0)

    t_l0s = timeit(
        "level0 single",
        lambda d, c: address_mod.coordinate_product(par, ctx, d, c),
        data, coords0[0])
    print(f"  -> batched {t_l0b/B:.2f} ms/read vs single {t_l0s:.2f}", flush=True)

    lvl0_b = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B * W, R, C, L, n)), jnp.int32)
    t_pk_b = timeit(
        f"pack batched ({B*W} x {R} rows)",
        lambda x: ram_mod._pack_rows(par, ctx, x, atk), lvl0_b)
    t_pk_s = timeit(
        f"pack single ({W} x {R} rows)",
        lambda x: ram_mod._pack_rows(par, ctx, x, atk), lvl0_b[:W])
    print(f"  -> batched {t_pk_b/B:.2f} ms/read vs single {t_pk_s:.2f}", flush=True)

    packed_b = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, W, C, L, n)), jnp.int32)
    t_l1 = timeit(
        "level1 perbatch + trace",
        lambda x, c: keyswitch.trace(
            par, ctx,
            address_mod.coordinate_product_perbatch(par, ctx, x, c).reshape(
                (B * W, C, L, n)), atk),
        packed_b, coords1)
    print(f"  -> {t_l1/B:.2f} ms/read", flush=True)

    total = t_l0b + t_pk_b + t_l1
    print(f"sum {total:.0f} ms for B={B} = {total/B:.2f} ms/read", flush=True)


if __name__ == "__main__":
    main()
