"""Prototype: NTT phases as exact mod-p MXU matmuls.

Each phase of the two-phase 64x64 tile NTT is a linear map over Z_p that
factors as (at most) one elementwise twiddle and ONE 64x64 left-matmul
(verified numerically for all four phases):

    fwd A : Y = E_A o (M_A @ X)        fwd B : Y = M_B @ X
    inv Bi: Y = M_Bi @ X               inv Ai: Y = M_Ai @ (F_Ai o X)

The matmul runs EXACTLY on the MXU in bf16: operands split into three
balanced 7-bit digits (|d| <= 64), products <= 2^12, 64-term dot sums
<= 2^18 -- exact in the MXU's f32 accumulator.  Recombination is 4
mul_mods per element (cheap on the VPU).

This probe derives the matrices from the existing stage pipeline,
checks bit-exactness of an MXU forward kernel against ntt_fwd_pallas on
the TPU, and times both at the level-0 shape.

Usage: python scripts/mxu_ntt_probe.py [--k 16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, ntt_fwd_pallas, _mul_mod, _reduce, _center, _R)

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16


# ---------------------------------------------------------------- derivation

def _dif_v(x, h, tw, p):
    """Vectorized stage replica (x: [..., 64, 64] int64 mod p)."""
    up = np.roll(x, -h, -2)
    dn = np.roll(x, h, -2)
    q = np.arange(_R).reshape(-1, 1)
    lo = (q & h) == 0
    return np.where(lo, (x + up) % p, ((dn - x) * tw) % p)


def _dit_v(x, h, tw, p):
    t = (x * tw) % p
    up = np.roll(t, -h, -2)
    dn = np.roll(x, h, -2)
    q = np.arange(_R).reshape(-1, 1)
    lo = (q & h) == 0
    return np.where(lo, (x + up) % p, (dn - t) % p)


def derive_tables(ctx):
    """Per prime: M/E/F tables for the four phases, plus bf16 digit
    planes of each matrix."""
    out = []
    for pi, p in enumerate(ctx.primes):
        twA = np.asarray(ctx.twA[pi]).astype(np.int64) % p
        twB = np.asarray(ctx.twB[pi]).astype(np.int64) % p
        twAi = np.asarray(ctx.twAi[pi]).astype(np.int64) % p
        twBi = np.asarray(ctx.twBi[pi]).astype(np.int64) % p

        def phase(x, tws, inv):
            for s in range(6):
                if inv:
                    x = _dit_v(x, 1 << s, tws[5 - s], p)
                else:
                    x = _dif_v(x, 32 >> s, tws[s], p)
            return x

        # column maps: basis inputs broadcast over lanes
        basis = np.zeros((_R, _R, _R), dtype=np.int64)
        for q in range(_R):
            basis[q, q, :] = 1

        def colmaps(tws, inv):
            Y = phase(basis, tws, inv)  # Y[q, i, j] = A_j[i, q]
            return np.moveaxis(Y, 0, 1)  # -> A[i, q, j]

        AA = colmaps(twA, False)   # AA[i, q, j] = A_j[i, q]
        AB = colmaps(twB, False)
        ABi = colmaps(twBi, True)
        AAi = colmaps(twAi, True)

        def right_factor(A):
            M = A[:, :, 0]
            E = np.zeros((_R, _R), dtype=np.int64)
            for j in range(_R):
                for i in range(_R):
                    q0 = np.nonzero(M[i] % p)[0][0]
                    E[i, j] = (A[i, q0, j] * pow(int(M[i, q0]), p - 2, p)) % p
            return M % p, E % p

        def left_factor(A):
            M = A[:, :, 0]
            F = np.zeros((_R, _R), dtype=np.int64)
            for j in range(_R):
                for q in range(_R):
                    i0 = np.nonzero(M[:, q] % p)[0][0]
                    F[q, j] = (A[i0, q, j] * pow(int(M[i0, q]), p - 2, p)) % p
            return M % p, F % p

        MA, EA = right_factor(AA)
        MB = AB[:, :, 0] % p
        MBi = ABi[:, :, 0] % p
        MAi, FAi = left_factor(AAi)
        out.append(dict(MA=MA, EA=EA, MB=MB, MBi=MBi, MAi=MAi, FAi=FAi, p=p))
    return out


def digit_planes(M, p):
    """Balanced 7-bit digits of centered M: [3, 64, 64] bf16."""
    Mc = _center(M % p, p).astype(np.int64)
    d2 = np.rint(Mc / 2.0 ** 14).astype(np.int64)
    r = Mc - (d2 << 14)
    d1 = np.rint(r / 2.0 ** 7).astype(np.int64)
    d0 = r - (d1 << 7)
    assert np.abs(d2).max() <= 64 and np.abs(d1).max() <= 64 and np.abs(d0).max() <= 64
    st = np.stack([d0, d1, d2])
    if USE_I8:
        return st.astype(np.int8)
    return st.astype(np.float32).astype(jnp.bfloat16)


# ---------------------------------------------------------------- kernel

USE_I8 = True


def _split3(x):
    """int32 -> three balanced 7-bit digit planes."""
    d2 = (x + (1 << 13)) >> 14
    r = x - (d2 << 14)
    d1 = (r + (1 << 6)) >> 7
    d0 = r - (d1 << 7)
    t = jnp.int8 if USE_I8 else BF16
    return (d0.astype(t), d1.astype(t), d2.astype(t))


def _mm_mod(x, mdig, p, ip):
    """Exact (M @ x) mod p on the MXU.  x: int32[B, 64, 64] (|x| <=
    2^20); mdig: [3, 64, 64] digit planes of M."""
    B = x.shape[0]
    xd = _split3(x)
    # weight classes w = i + j (digit weights 2^(7w))
    S = [None] * 5
    acc_t = I32 if USE_I8 else F32
    for i in range(3):
        mb = jnp.broadcast_to(mdig[i], (B, _R, _R))
        for j in range(3):
            pr = jax.lax.dot_general(
                mb, xd[j], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc_t)
            w = i + j
            S[w] = pr if S[w] is None else S[w] + pr
    S = [s.astype(I32) for s in S]
    y = S[0] + _mul_mod(S[1], np.int32(1 << 7), p, ip)
    y = y + _mul_mod(S[2], np.int32((1 << 14) % p), p, ip)
    y = y + _mul_mod(S[3], _cent_const(1 << 21, p), p, ip)
    y = y + _mul_mod(S[4], _cent_const(1 << 28, p), p, ip)
    return _reduce(y, p, ip)


def _cent_const(v, p):
    v = v % p
    return np.int32(v - p if v > p // 2 else v)


def make_fwd_mxu(primes, tables, T):
    """Forward NTT kernel: twist -> (E_A o M_A@) -> swap -> M_B@."""

    def kernel(x_ref, twist_ref, ma_ref, ea_ref, mb_ref, o_ref):
        for pi, p in enumerate(primes):
            pp = np.int32(p)
            ip = np.float32(1.0 / p)
            x = _mul_mod(x_ref[...], twist_ref[pi][None], pp, ip)
            B = x.shape[0]
            y = _mm_mod(x, ma_ref[pi], pp, ip)
            y = _mul_mod(y, ea_ref[pi][None], pp, ip)
            y = jnp.swapaxes(y, -1, -2)
            y = _mm_mod(y, mb_ref[pi], pp, ip)
            o_ref[pi] = y

    return kernel


def ntt_fwd_mxu(pctx, tables, x, tb=32, interpret=False):
    n = pctx.n
    lead = x.shape[:-1]
    x = x.reshape(-1, _R, _R)
    B = x.shape[0]
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, _R, _R), dtype=x.dtype)], axis=0)
    P = len(pctx.primes)
    ma = jnp.asarray(np.stack([digit_planes(t["MA"], t["p"]) for t in tables]))
    mb = jnp.asarray(np.stack([digit_planes(t["MB"], t["p"]) for t in tables]))
    ea = jnp.asarray(np.stack(
        [_center(t["EA"], t["p"]) for t in tables]).astype(np.int32))
    out = pl.pallas_call(
        make_fwd_mxu(pctx.primes, tables, tb),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, _R, _R), lambda b: (b, 0, 0)),
            pl.BlockSpec((P, _R, _R), lambda b: (0, 0, 0)),
            pl.BlockSpec((P, 3, _R, _R), lambda b: (0, 0, 0, 0)),
            pl.BlockSpec((P, _R, _R), lambda b: (0, 0, 0)),
            pl.BlockSpec((P, 3, _R, _R), lambda b: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((P, tb, _R, _R), lambda b: (0, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Bp, _R, _R), I32),
        interpret=interpret,
    )(x, jnp.asarray(pctx.twist), ma, ea, mb)
    return out[:, :B].reshape((P,) + lead + (n,))


def to_canonical(x, p):
    x = np.asarray(x) % p
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    pctx = get_pallas_context(par.n, tuple(par.primes))
    tables = derive_tables(pctx)
    rnd = np.random.default_rng(0)
    Bx = 1536
    x = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18, size=(Bx, par.n)), jnp.int32)

    f_ref = jax.jit(lambda v: ntt_fwd_pallas(pctx, v))
    f_mxu = jax.jit(lambda v: ntt_fwd_mxu(pctx, tables, v))

    t0 = time.time()
    want = np.asarray(f_ref(x))
    print(f"stage kernel compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    got = np.asarray(f_mxu(x))
    print(f"mxu kernel compile+run {time.time()-t0:.0f}s", flush=True)

    for pi, p in enumerate(par.primes):
        a = to_canonical(got[pi], p)
        b = to_canonical(want[pi], p)
        assert np.array_equal(a, b), f"prime {p}: mismatch {np.argwhere(a!=b)[:4]}"
    print("BIT-EXACT vs stage kernel", flush=True)

    def slope(f):
        def chain(kk):
            def fn(v):
                def body(c, _):
                    y = f(c[: Bx])
                    # feed back a bounded int32 slice to keep shapes
                    return jnp.concatenate(
                        [y[0, :, :1].astype(I32) % 7, c[:, 1:]], axis=1), 1
                out, _ = jax.lax.scan(body, v, None, length=kk)
                return jnp.sum(out[0, 0])
            return jax.jit(fn)

        f1, fk = chain(1), chain(args.k)
        np.asarray(f1(x)); np.asarray(fk(x))
        def t(fn):
            t0 = time.perf_counter(); np.asarray(fn(x))
            return time.perf_counter() - t0
        t1 = min(t(f1) for _ in range(3))
        tk = min(t(fk) for _ in range(3))
        return (tk - t1) / (args.k - 1) * 1000

    ms_ref = slope(lambda v: ntt_fwd_pallas(pctx, v))
    print(f"stage kernel: {ms_ref:.2f} ms / {Bx} transforms x3 primes", flush=True)
    ms_mxu = slope(lambda v: ntt_fwd_mxu(pctx, tables, v))
    print(f"mxu kernel:   {ms_mxu:.2f} ms / {Bx} transforms x3 primes", flush=True)


if __name__ == "__main__":
    main()
