"""Fast Mosaic compile + latency check of the v2 fold kernel at the
2^18 hot shapes, WITHOUT keygen (random operands; correctness is covered
by the interpret-mode CPU tests).  Shapes probed:

  * level-0 chained CMux (B=256 rows, T=6, M=8, digits=4)
  * keyswitch with fused base (B=4, digits=1) -- the trace step shape

Usage: python scripts/fold_kernel_probe.py [--k 16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, fused_external_fold_pallas)


def probe(name, k, make_step, x0):
    def chain(kk):
        def fn(x):
            def body(c, _):
                y = make_step(c)
                return y, jnp.sum(y[(0,) * (y.ndim - 1)])

            out, sums = jax.lax.scan(body, x, None, length=kk)
            return jnp.sum(sums)

        return jax.jit(fn)

    f1, fk = chain(1), chain(k)
    t0 = time.time()
    np.asarray(f1(x0))
    print(f"{name}: k=1 compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(fk(x0))
    print(f"{name}: k={k} compile+run {time.time()-t0:.1f}s", flush=True)

    def t(f):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        return time.perf_counter() - t0

    t1 = min(t(f1) for _ in range(3))
    tk = min(t(fk) for _ in range(3))
    ms = (tk - t1) / (k - 1) * 1000.0
    print(f"{name}: {ms:.3f} ms/step", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    pctx = get_pallas_context(par.n, par.primes)
    rnd = np.random.default_rng(0)
    n = par.n
    C2, Lout = par.rank + 1, par.limbs_ct
    T = C2 * Lout
    M = C2 * par.limbs_ggsw
    B = par.word_size * par.num_rows

    keys = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18, size=(3, 4, T, M, n)), jnp.int32)
    x0 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, T, n)), jnp.int32)

    def l0_chain(x):
        return fused_external_fold_pallas(pctx, x, keys, Lout, C2).reshape(
            B, T, n)

    probe(f"level0 chain B={B} T={T} M={M} dig=4", args.k, l0_chain, x0)

    Ltr = par.limbs_evk_trace
    Mtr = C2 * Ltr
    ktr = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18, size=(3, 1, par.rank * Lout, Mtr, n)),
        jnp.int32)
    W = par.word_size
    xtr = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, par.rank * Lout, n)),
        jnp.int32)
    base0 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, C2, Lout, n)), jnp.int32)

    def ks_step(b):
        return fused_external_fold_pallas(pctx, xtr, ktr, Lout, C2,
                                          base=b, sign=-1)

    probe(f"trace keyswitch W={W} fused base", args.k, ks_step, base0)


if __name__ == "__main__":
    main()
