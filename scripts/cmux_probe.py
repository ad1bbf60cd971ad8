"""Scan-slope probe of the VM batched CMux (per-item-key external
product) at several batch sizes and tbf values.

Usage: FHERAM_NTT=pallas python scripts/cmux_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, fused_external_fold_batched)

N = par.n
C = par.rank + 1
L = par.limbs_ct
D = par.dnum_ct
Lg = par.limbs_ggsw
T = C * L
M = C * Lg
pctx = get_pallas_context(N, tuple(par.primes))


def bench(A, tbf, k=16):
    rnd = np.random.default_rng(0)
    x = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(A, 1, T, N)),
                    jnp.int32)
    keys = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18, size=(A, 3, 1, T, M, N)), jnp.int32)

    def fn(x0, kk):
        def body(x, _):
            out = fused_external_fold_batched(pctx, x, kk, L, C, tbf=tbf)
            return out.reshape(x0.shape), ()
        x, _ = jax.lax.scan(body, x0, None, length=k)
        return x[0, 0, 0, 0]

    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(x, keys))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x, keys))
        ts.append(time.perf_counter() - t0)
    tot = min(ts)
    print(f"A={A} tbf={tbf} k={k}: {tot*1000:.1f} ms -> "
          f"{tot/k/A*1e6:.2f} us/unit", flush=True)


def main():
    for A, tbf in ((28, 1), (192, 1), (192, 2)):
        bench(A, tbf)


if __name__ == "__main__":
    main()
