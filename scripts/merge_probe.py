"""Scan-slope microbench of fused_pack_merge_pallas per-merge cost vs
batch size (hunting the batched-pack per-merge anomaly).

Usage: FHERAM_NTT=pallas python scripts/merge_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, fused_pack_merge_pallas)

N = par.n
C2 = par.rank + 1
L = par.limbs_ct
# full gadget by default; --trunc uses the READOPT merge shapes
# (in_digits=2 of 3, key_limbs=3 of 4) to check whether the TRUNCATED
# kernel (less compute per block, same DMA) scales differently
ap = argparse.ArgumentParser()
ap.add_argument("--trunc", action="store_true")
args, _ = ap.parse_known_args()
if args.trunc:
    T = par.rank * 2
    M = C2 * 3
else:
    T = par.rank * L
    M = C2 * par.limbs_evk_trace
pctx = get_pallas_context(N, tuple(par.primes))


def bench(nb, k):
    rnd = np.random.default_rng(0)
    A = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)),
                    jnp.int32)
    B = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)),
                    jnp.int32)
    keys = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18, size=(3, T, M, N)), jnp.int32)

    def fn(a, b, kk):
        def body(a, _):
            out = fused_pack_merge_pallas(pctx, a, b, 16, (N >> 4) + 1, kk)
            return out, ()
        a, _ = jax.lax.scan(body, a, None, length=k)
        return a[0, 0, 0, 0]

    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(A, B, keys))
    print(f"nb={nb} k={k}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(A, B, keys))
        ts.append(time.perf_counter() - t0)
    tot = min(ts)
    print(f"nb={nb} k={k}: {tot*1000:.1f} ms -> "
          f"{tot/k/nb*1e6:.2f} us/merge", flush=True)
    return tot


def main():
    for nb, k in ((128, 64), (1024, 8), (8192, 2)):
        bench(nb, k)


if __name__ == "__main__":
    main()
