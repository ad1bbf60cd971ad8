"""Scan-slope probe of the VM server loops (TPU): k eval_ops/select_rd
calls chained inside ONE jitted lax.scan, so per-op latency excludes
the per-call RPC/fetch overhead of the axon tunnel (~20-80 ms/call,
which dominates scripts/vm_smoke.py's single-call walls).

Hoisting guard: eval_ops is a pure function of loop-invariant operands,
so a naive scan body hoists it (round-2 note in BENCH_NOTES.md).  The
operands are threaded through jax.lax.optimization_barrier together
with the loop carry, which pins one evaluation per iteration.

Usage: FHERAM_NTT=pallas python scripts/vm_slope_probe.py [--k 4]
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

from fhe_ram_tpu.params import PARAMS_CODE_2_14 as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import arithmetic, fheuint

BITS = 32


def slope(label, make_body, k):
    def chain(kk):
        def wrapped(operands):
            def body(carry, _):
                ops_b = jax.lax.optimization_barrier((carry,) + operands)
                y = make_body(*ops_b[1:])
                return carry + jnp.sum(y[..., 0, 0]).astype(jnp.int32), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                  length=kk)
            return acc

        return jax.jit(wrapped)

    return chain


def run(label, make_body, operands, k):
    c = slope(label, make_body, k)
    f1, fk = c(1), c(k)
    t0 = time.time()
    np.asarray(f1(operands)); np.asarray(fk(operands))
    print(f"{label}: compile {time.time()-t0:.0f}s", flush=True)

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(operands))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(fk) - t(f1)) / (k - 1) * 1000.0
    print(f"{label}: {ms:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

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

    ops = arithmetic.RVI32_OPS
    run("eval_ops (all 20)",
        lambda a, b, i: arithmetic.eval_ops(par, ctx, a, b, i, atk, ops, BITS),
        (rs1, rs2, imm), args.k)

    dp_ops = tuple(op for op in ops if op in arithmetic._DP_SPECS)
    run(f"dp group ({len(dp_ops)})",
        lambda a, b, i: arithmetic._dp_group(par, ctx, dp_ops, a, b, i,
                                             BITS)["add"],
        (rs1, rs2, imm), args.k)
    bw_ops = tuple(op for op in ops if op in arithmetic._BITWISE_TABLES)
    run(f"bitwise group ({len(bw_ops)})",
        lambda a, b, i: arithmetic._bitwise_group(par, ctx, bw_ops, a, b, i,
                                                  BITS)["xor"],
        (rs1, rs2, imm), args.k)
    sh_ops = tuple(op for op in ops if op in arithmetic._SHIFT_KINDS)
    run(f"shift group ({len(sh_ops)})",
        lambda a, b, i: arithmetic._shift_group(par, ctx, sh_ops, a, b, i,
                                                atk, BITS)["sll"],
        (rs1, rs2, imm), args.k)

    packed = jax.jit(lambda a, b, i: arithmetic.eval_ops(
        par, ctx, a, b, i, atk, ops, BITS))(rs1, rs2, imm)
    idp = fheuint.encrypt_prepared(par, ctx, s_ntt, 10, src, BITS)
    run("select_rd",
        lambda p, d: arithmetic.select_rd(par, ctx, p, d, len(ops), atk, BITS),
        (packed, idp), args.k)


if __name__ == "__main__":
    main()
