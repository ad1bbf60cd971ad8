"""Per-group attribution of eval_ops at the production ring (TPU).

Usage: FHERAM_NTT=pallas python scripts/vm_phase_probe.py
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
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import arithmetic, fheuint

BITS = 32


def timeit(name, f, *args):
    ff = jax.jit(f)
    t0 = time.time()
    r = ff(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = ff(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.0f} ms", flush=True)


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    atk = ekp.atk_glwe

    rs1 = fheuint.encrypt_prepared(par, ctx, s_ntt, 0xF0E21234, src, BITS)
    rs2 = fheuint.encrypt_prepared(par, ctx, s_ntt, 0x00000333, src, BITS)
    imm = fheuint.encrypt_prepared(par, ctx, s_ntt, 0x00000005, src, BITS)
    print("setup done", flush=True)

    dp_ops = tuple(op for op in arithmetic.RVI32_OPS
                   if op in arithmetic._DP_SPECS)
    bw_ops = tuple(op for op in arithmetic.RVI32_OPS
                   if op in arithmetic._BITWISE_TABLES)
    sh_ops = tuple(op for op in arithmetic.RVI32_OPS
                   if op in arithmetic._SHIFT_KINDS)

    timeit(f"dp group ({len(dp_ops)} ops)",
           lambda a, b, i: arithmetic._dp_group(par, ctx, dp_ops, a, b, i,
                                                BITS),
           rs1, rs2, imm)
    timeit(f"bitwise group ({len(bw_ops)} ops)",
           lambda a, b, i: arithmetic._bitwise_group(par, ctx, bw_ops, a, b,
                                                     i, BITS),
           rs1, rs2, imm)
    timeit(f"shift group ({len(sh_ops)} ops)",
           lambda a, b, i: arithmetic._shift_group(par, ctx, sh_ops, a, b, i,
                                                   atk, BITS),
           rs1, rs2, imm)


if __name__ == "__main__":
    main()
