"""Pallas fused negacyclic NTT kernels (TPU, Mosaic-native).

Why: the jnp butterfly NTT materializes each of the 12 stages to HBM
(~24 round trips per transform); these kernels run ALL stages in VMEM:
HBM traffic is one read + one write per transform.

Two in-kernel formulations, selected by FHERAM_MXU (process-global,
fixed BEFORE any keygen/jit -- the two spectrum orders differ):

* FHERAM_MXU=1 (default): 32x128 tiles, each phase an exact int8 MXU
  matmul with the psi twists and 1/N folded into the tables -- see the
  "MXU tile NTT" section.  Full (8, 128)-vreg lane utilization, no
  in-kernel transposes.

* FHERAM_MXU=0 (debug fallback): [TB, 64, 64] (i, j) blocks (Mosaic
  cannot reshape the lane dimension, so tiles are pre-split OUTSIDE the
  kernel).  Six DIF stages pair along i, six along j after one in-VMEM
  transpose; butterflies are sublane ROLLS + masked selects:

      lo half:  out = x + roll(x, -h)             (u + v)
      hi half:  out = (roll(x, +h) - x) * w       (u - v) * w   [fwd DIF]

  with per-stage full [64, 64] twiddle tables (identity in the lo half)
  and iota-derived masks.

Both: fwd/inv are exact inverses including the (permuted) spectrum
order; all arithmetic is the int32 + float32-Barrett of ops/modular.py.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import _primitive_root, _center
from .crt import garner_consts

I32 = jnp.int32
F32 = jnp.float32
I8 = jnp.int8

_TB = 32  # batch rows per grid step (VMEM-bounded)
_R = 64

# NTT phases as exact int8 MXU matmuls (see "MXU phase matmuls" below);
# FHERAM_MXU=0 falls back to the VPU roll/select stage pipeline
_USE_MXU = os.environ.get("FHERAM_MXU", "1") == "1"

# Global interpret-mode override (FHERAM_PALLAS_INTERPRET=1, or set the
# module flag from test code): every kernel in this module runs through
# the Pallas interpreter, so the WHOLE pallas backend -- including the
# fused read pipeline under shard_map partitioning -- executes on CPU
# test meshes (tests/test_mesh_pallas.py).  Per-call interpret=True
# arguments keep working independently.
_INTERPRET = os.environ.get("FHERAM_PALLAS_INTERPRET") == "1"


def fused_path_active(n: int) -> bool:
    """True when the fused MXU Pallas kernels serve this ring size --
    their only HBM traffic is the streamed in/out blocks, so callers can
    skip the composed path's transient-bounding lax.map slicing."""
    from .ntt import get_backend

    return _USE_MXU and n == 4096 and get_backend() == "pallas"


def _mul_mod(a, b, p, ip):
    a1 = (a + 512) >> 10
    a0 = a - (a1 << 10)
    t1 = a1 * b
    q1 = jnp.rint(t1.astype(F32) * ip).astype(I32)
    r1 = t1 - q1 * p
    t = (r1 << 10) + a0 * b
    q2 = jnp.rint(t.astype(F32) * ip).astype(I32)
    return t - q2 * p


def _reduce(x, p, ip):
    q = jnp.rint(x.astype(F32) * ip).astype(I32)
    return x - q * p


def _lo_mask(h: int):
    """[64, 1] bool: (q mod 2h) < h on the sublane axis (h power of 2)."""
    q = jax.lax.broadcasted_iota(I32, (_R, 1), 0)
    return (q & h) == 0


class NTTPallasContext:
    """Per-stage full [64, 64] twiddle tables (identity in lo halves)."""

    def __init__(self, n: int, primes: tuple[int, ...]):
        assert n == _R * _R, "pallas kernel is wired for N=4096"
        self.n = n
        self.primes = tuple(primes)
        P = len(primes)

        twist = np.zeros((P, _R, _R), dtype=np.int64)
        inv_twist = np.zeros((P, _R, _R), dtype=np.int64)
        twA = np.ones((P, 6, _R, _R), dtype=np.int64)
        twAi = np.ones((P, 6, _R, _R), dtype=np.int64)
        twB = np.ones((P, 6, _R, _R), dtype=np.int64)
        twBi = np.ones((P, 6, _R, _R), dtype=np.int64)

        for pi, p in enumerate(primes):
            g = _primitive_root(p)
            psi = pow(g, (p - 1) // (2 * n), p)
            assert pow(psi, n, p) == p - 1
            om = psi * psi % p
            iom = pow(om, p - 2, p)
            ipsi = pow(psi, p - 2, p)
            inv_n = pow(n, p - 2, p)

            idx = np.arange(n)
            t = np.array([pow(psi, int(k), p) for k in idx])
            it = np.array([pow(ipsi, int(k), p) * inv_n % p for k in idx])
            twist[pi] = _center(t, p).reshape(_R, _R)
            inv_twist[pi] = _center(it, p).reshape(_R, _R)

            # phase A: stage si pairs i-distance hi = 32 >> si (1D stage
            # h = 64*hi); twiddle at hi-half row q:
            # w_h^(64*((q mod 2hi) - hi) + j)
            for si in range(6):
                hi = 32 >> si
                h = 64 * hi
                w = pow(om, n // (2 * h), p)
                iw = pow(iom, n // (2 * h), p)
                for q in range(_R):
                    if (q % (2 * hi)) >= hi:
                        a_rel = (q % (2 * hi)) - hi
                        for j in range(_R):
                            e = 64 * a_rel + j
                            twA[pi, si, q, j] = pow(w, e, p)
                            twAi[pi, si, q, j] = pow(iw, e, p)
            # phase B: stage si pairs j-distance hj = 32 >> si (h = hj);
            # twiddle exponent = (q mod 2hj) - hj, constant over lanes
            for si in range(6):
                hj = 32 >> si
                w = pow(om, n // (2 * hj), p)
                iw = pow(iom, n // (2 * hj), p)
                for q in range(_R):
                    if (q % (2 * hj)) >= hj:
                        a_rel = (q % (2 * hj)) - hj
                        twB[pi, si, q, :] = pow(w, a_rel, p)
                        twBi[pi, si, q, :] = pow(iw, a_rel, p)

        # tables are NUMPY constants: storing jnp arrays in the
        # lru-cached context would leak traced constants if the first
        # construction happens inside a jit trace
        def c(x):
            return np.ascontiguousarray(
                np.stack([_center(x[pi], primes[pi]) for pi in range(P)]).astype(np.int32))

        self.twist = c(twist)
        self.inv_twist = c(inv_twist)
        self.twA, self.twAi = c(twA), c(twAi)
        self.twB, self.twBi = c(twB), c(twBi)
        self.p_arr = np.asarray(primes, dtype=np.int32).reshape(-1, 1)
        self.ip_arr = np.asarray(
            [1.0 / q for q in primes], dtype=np.float32).reshape(-1, 1)


@lru_cache(maxsize=4)
def get_pallas_context(n: int, primes: tuple[int, ...]) -> NTTPallasContext:
    return NTTPallasContext(n, primes)


# --------------------------------------------------------------------------
# MXU tile NTT: 32x128 tiles, twists folded into the matrices
# --------------------------------------------------------------------------
#
# N = 4096 is factored 32 (sublane) x 128 (lane): coefficient
# k = 128*i + j lives at tile position [i, j].  The negacyclic NTT
# X_hat[s] = sum_k x[k] psi^k omega^(k*s) then factors (s = a + 32*b)
# into ONE 32x32 left matmul, ONE elementwise [32, 128] table, and ONE
# 128x128 right matmul -- derived directly from the DFT definition with
# the psi twists and 1/N folded into the tables:
#
#     fwd:  Y[a, b]  = ((Cf @ X) o Tf) @ Rf
#     inv:  x[i, j]  = Ci @ (Ti o (Y @ Ri))
#
#     Cf[a,i] = om^(128*i*a) psi^(128*i)     Tf[a,j] = om^(j*a) psi^j
#     Rf[j,b] = om^(32*j*b)
#     Ri[b,j] = om^(-32*j*b)   Ti[a,j] = om^(-j*a) psi^-j / N
#     Ci[i,a] = om^(-128*i*a) psi^(-128*i)
#
# Why this shape: the VPU vreg is (8, 128) and Mosaic pads the minor
# dim to 128, so the previous 64x64 tiles ran EVERY elementwise op at
# 50% lane utilization; 32x128 tiles fill the vregs exactly (and the
# i8 digit planes hit the int8 min tile (32, 128) exactly).  There is
# no in-kernel transpose: the lane-mixing phase is a right matmul.
# Spectral order is [a(sublane), b(lane)] -- different from the stage
# pipeline's order, so FHERAM_MXU must be fixed BEFORE any keygen/jit
# (same invariant as FHERAM_NTT).
#
# The matmuls run EXACTLY on the MXU in int8: operands split into three
# balanced 7-bit digits (|d| <= 64 for matrix entries; <= 119 for the
# |x| <= 2^20.9 data side), products <= 2^13.9, dot sums over <= 128
# terms <= 2^21, accumulated exactly in int32.  Recombination is 4
# mul_mods per element on the VPU.

def _digit_planes_i8(M, p):
    """Balanced 7-bit digit planes of centered M: int8[3, *M.shape]."""
    Mc = _center(M % p, p).astype(np.int64)
    d2 = np.rint(Mc / 2.0 ** 14).astype(np.int64)
    r = Mc - (d2 << 14)
    d1 = np.rint(r / 2.0 ** 7).astype(np.int64)
    d0 = r - (d1 << 7)
    assert max(np.abs(d2).max(), np.abs(d1).max(), np.abs(d0).max()) <= 64
    return np.stack([d0, d1, d2]).astype(np.int8)


_SL = 32   # MXU tile sublanes
_LN = 128  # MXU tile lanes


def _derive_mxu_tables(ctx: NTTPallasContext):
    """Returns (cdig [P,2,3,32,32] i8, rdig [P,2,3,128,128] i8,
    ew [P,2,32,128] i32): fwd tables at index 0, inverse at index 1."""
    P = len(ctx.primes)
    n = ctx.n
    assert n == _SL * _LN
    cdig = np.zeros((P, 2, 3, _SL, _SL), dtype=np.int8)
    rdig = np.zeros((P, 2, 3, _LN, _LN), dtype=np.int8)
    ew = np.zeros((P, 2, _SL, _LN), dtype=np.int32)
    for pi, p in enumerate(ctx.primes):
        g = _primitive_root(p)
        psi = pow(g, (p - 1) // (2 * n), p)
        assert pow(psi, n, p) == p - 1
        om = psi * psi % p
        iom = pow(om, p - 2, p)
        ipsi = pow(psi, p - 2, p)
        inv_n = pow(n, p - 2, p)

        def tab(rows, cols, f):
            return np.array([[f(r, c) for c in range(cols)]
                             for r in range(rows)], dtype=np.int64)

        Cf = tab(_SL, _SL, lambda a, i:
                 pow(om, 128 * i * a % n, p) * pow(psi, 128 * i, p) % p)
        Tf = tab(_SL, _LN, lambda a, j:
                 pow(om, j * a % n, p) * pow(psi, j, p) % p)
        Rf = tab(_LN, _LN, lambda j, b: pow(om, 32 * j * b % n, p))
        Ri = tab(_LN, _LN, lambda b, j: pow(iom, 32 * j * b % n, p))
        Ti = tab(_SL, _LN, lambda a, j:
                 pow(iom, j * a % n, p) * pow(ipsi, j, p) * inv_n % p)
        Ci = tab(_SL, _SL, lambda i, a:
                 pow(iom, 128 * i * a % n, p) * pow(ipsi, 128 * i, p) % p)

        # exactness guard: factorization == the DFT definition (spot
        # lattice of s values, vectorized), and inv(fwd) == identity
        rnd = np.random.default_rng(1)
        X = rnd.integers(0, p, size=(_SL, _LN))
        Y = (Cf @ X % p) * Tf % p @ Rf % p
        kk = (128 * np.arange(_SL)[:, None] + np.arange(_LN)[None, :]).ravel()
        om_pow = np.array([pow(om, e, p) for e in range(n)], dtype=np.int64)
        psi_k = np.array([pow(psi, int(t), p) for t in kk], dtype=np.int64)
        xf = X.ravel() * psi_k % p
        for a in range(0, _SL, 7):
            for b in range(0, _LN, 37):
                ss = a + 32 * b
                want = int((xf * om_pow[kk * ss % n]).sum() % p)
                assert want == Y[a, b], (p, a, b)
        Xb = (Ci @ ((Y @ Ri % p) * Ti % p) % p)
        assert np.array_equal(Xb, X % p), f"roundtrip failed for prime {p}"

        cdig[pi, 0] = _digit_planes_i8(Cf, p)
        cdig[pi, 1] = _digit_planes_i8(Ci, p)
        rdig[pi, 0] = _digit_planes_i8(Rf, p)
        rdig[pi, 1] = _digit_planes_i8(Ri, p)
        ew[pi, 0] = _center(Tf, p).astype(np.int32)
        ew[pi, 1] = _center(Ti, p).astype(np.int32)
    return cdig, rdig, ew


def _mxu_tables(ctx: NTTPallasContext):
    if not hasattr(ctx, "_mxu"):
        ctx._mxu = _derive_mxu_tables(ctx)
    return ctx._mxu


def _split3_i8(x):
    """int32 (|x| <= 2^20.9) -> three balanced 7-bit digit planes."""
    d2 = (x + (1 << 13)) >> 14
    r = x - (d2 << 14)
    d1 = (r + (1 << 6)) >> 7
    d0 = r - (d1 << 7)
    return (d0.astype(I8), d1.astype(I8), d2.astype(I8))


def _cent_const(v, p):
    """2^k mod p, centered.  p may be a static int (fold kernel: primes
    baked into the factory) or a traced scalar (standalone kernels:
    prime indexed by program_id from SMEM)."""
    if isinstance(p, (int, np.integer)):
        v = int(v) % int(p)
        return np.int32(v - p if v > p // 2 else v)
    vv = jnp.mod(jnp.int32(v), p)
    return vv - jnp.where(vv > p // 2, p, jnp.int32(0))


def _mm_planes(x, mdig, p, ip, right: bool):
    """Exact (M @ x) (left) or (x @ M) (right) mod p on the MXU.
    x: int32[..., 32, 128] with |x| <= 2^20.9; mdig: int8[3, 32, 32]
    (left) or int8[3, 128, 128] (right) digit planes of M."""
    lead = x.shape[:-2]
    x = x.reshape((-1,) + x.shape[-2:])
    B = x.shape[0]
    xd = _split3_i8(x)
    S = [None] * 5  # weight classes w = i + j, weights 2^(7w)
    for i in range(3):
        mb = jnp.broadcast_to(mdig[i], (B,) + mdig.shape[1:])
        for j in range(3):
            if right:
                pr = jax.lax.dot_general(
                    xd[j], mb, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=I32)
            else:
                pr = jax.lax.dot_general(
                    mb, xd[j], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=I32)
            w = i + j
            S[w] = pr if S[w] is None else S[w] + pr
    # Horner recombination: y = ((((S4*2^7 + S3) mod p)*2^7 + S2) ...)
    # -- each step is one shift+add+Barrett instead of a full mul_mod
    # with a 2^(7w) constant.  Exact: |S_w| <= 3*128*123^2 <= 2^22.5,
    # reduced partials <= 0.501p <= 2^18.6, so every H = r*128 + S_w
    # stays <= 2^25.7 + 2^22.5 < 2^31.
    y = S[4]
    for w in (3, 2, 1, 0):
        y = _reduce((y << 7) + S[w], p, ip)
    return y.reshape(lead + x.shape[-2:])


def _fwd_tile_mxu(x, cdig_p, rdig_p, ew_p, p, ip):
    """Forward tile NTT via MXU on [..., 32, 128] tiles (twists folded):
    (Cf @ x) o Tf @ Rf."""
    y = _mm_planes(x, cdig_p[0], p, ip, right=False)
    y = _mul_mod(y, _bshape(y, ew_p[0]), p, ip)
    return _mm_planes(y, rdig_p[0], p, ip, right=True)


def _inv_tile_mxu(y, cdig_p, rdig_p, ew_p, p, ip):
    """Inverse tile NTT via MXU: Ci @ (Ti o (y @ Ri)) (1/N folded)."""
    y = _mm_planes(y, rdig_p[1], p, ip, right=True)
    y = _mul_mod(y, _bshape(y, ew_p[1]), p, ip)
    return _mm_planes(y, cdig_p[1], p, ip, right=False)


def _bshape(x, arr):
    """Broadcast a [64, 64]/[64, 1] table over x's leading dims."""
    return arr.reshape((1,) * (x.ndim - 2) + arr.shape)


def _split_halves(x, h, tw):
    """Regroup the sublane axis into butterfly pairs: [..., 64, 64] ->
    (lo, hi, tw_hi) each [..., 64/2h, h, 64].  Only for h >= 8: vreg
    sublane granularity is 8, so these reshapes are pure reindexing
    (no relayout); below that the roll+select path is used."""
    lead = x.shape[:-2]
    nb = _R // (2 * h)
    y = x.reshape(lead + (nb, 2, h, _R))
    twh = tw.reshape(nb, 2, h, _R)[:, 1]
    return y[..., 0, :, :], y[..., 1, :, :], twh.reshape(
        (1,) * len(lead) + (nb, h, _R))


def _join_halves(s, d, shape):
    lead = shape[:-2]
    return jnp.stack([s, d], axis=len(lead) + 1).reshape(shape)


def _dif_stage(x, h, tw, p, ip):
    """One DIF stage along the sublane axis (-2); any leading dims.

    h >= 8: true half-compute (pairs regrouped onto a fresh axis; each
    branch runs on half the rows).  h < 8: rolls + masked selects --
    both branches compute everywhere (2x), but sub-vreg regrouping
    would force a Mosaic relayout."""
    if h >= 8:
        lo, hi, twh = _split_halves(x, h, tw)
        s = _reduce(lo + hi, p, ip)
        d = _mul_mod(lo - hi, twh, p, ip)
        return _join_halves(s, d, x.shape)
    ax = x.ndim - 2
    up = pltpu.roll(x, _R - h, ax)   # up[q] = x[q+h]  (roll is non-negative)
    dn = pltpu.roll(x, h, ax)        # dn[q] = x[q-h]
    s = _reduce(x + up, p, ip)
    d = _mul_mod(dn - x, _bshape(x, tw), p, ip)
    return jnp.where(_bshape(x, _lo_mask(h)), s, d)


def _dit_stage(x, h, tw, p, ip):
    """One inverse (DIT) stage along the sublane axis (-2)."""
    if h >= 8:
        lo, hi, twh = _split_halves(x, h, tw)
        t = _mul_mod(hi, twh, p, ip)
        s = _reduce(lo + t, p, ip)
        d = _reduce(lo - t, p, ip)
        return _join_halves(s, d, x.shape)
    ax = x.ndim - 2
    t = _mul_mod(x, _bshape(x, tw), p, ip)  # lo rows: tw == 1 -> t == x mod p
    up = pltpu.roll(t, _R - h, ax)          # t[q+h] at q
    dn = pltpu.roll(x, h, ax)               # x[q-h] at q
    s = _reduce(x + up, p, ip)
    d = _reduce(dn - t, p, ip)
    return jnp.where(_bshape(x, _lo_mask(h)), s, d)


def _fwd_kernel(p_ref, ip_ref, x_ref, twist_ref, twA_ref, twB_ref, o_ref):
    pid = pl.program_id(0)
    p = p_ref[pid, 0]
    ip = ip_ref[pid, 0]
    x = _mul_mod(x_ref[...], twist_ref[0][None], p, ip)
    for si in range(6):
        x = _dif_stage(x, 32 >> si, twA_ref[0, si], p, ip)
    x = jnp.swapaxes(x, -1, -2)
    for si in range(6):
        x = _dif_stage(x, 32 >> si, twB_ref[0, si], p, ip)
    o_ref[...] = x[None]


def _inv_kernel(p_ref, ip_ref, x_ref, itwist_ref, twAi_ref, twBi_ref, o_ref):
    pid = pl.program_id(0)
    p = p_ref[pid, 0]
    ip = ip_ref[pid, 0]
    x = x_ref[0]
    for si in range(6):
        x = _dit_stage(x, 1 << si, twBi_ref[0, 5 - si], p, ip)
    x = jnp.swapaxes(x, -1, -2)
    for si in range(6):
        x = _dit_stage(x, 1 << si, twAi_ref[0, 5 - si], p, ip)
    o_ref[...] = _mul_mod(x, itwist_ref[0][None], p, ip)[None]


def _fwd_kernel_mxu(p_ref, ip_ref, x_ref, cdig_ref, rdig_ref, ew_ref, o_ref):
    pid = pl.program_id(0)
    o_ref[...] = _fwd_tile_mxu(x_ref[...], cdig_ref[0], rdig_ref[0],
                               ew_ref[0], p_ref[pid, 0], ip_ref[pid, 0])[None]


def _inv_kernel_mxu(p_ref, ip_ref, x_ref, cdig_ref, rdig_ref, ew_ref, o_ref):
    pid = pl.program_id(0)
    o_ref[...] = _inv_tile_mxu(x_ref[0], cdig_ref[0], rdig_ref[0],
                               ew_ref[0], p_ref[pid, 0], ip_ref[pid, 0])[None]


def ntt_fwd_pallas(ctx: NTTPallasContext, x, interpret: bool = False):
    """x: int32[..., N] (|x| <= 2^21) -> int32[P, ..., N]."""
    n = ctx.n
    lead = x.shape[:-1]
    TR, TC = (_SL, _LN) if _USE_MXU else (_R, _R)
    x = x.reshape(-1, TR, TC)
    B = x.shape[0]
    Bp = -(-B // _TB) * _TB
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, TR, TC), dtype=x.dtype)], axis=0)
    P = len(ctx.primes)
    base_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_TB, TR, TC), lambda p, b: (b, 0, 0)),
    ]
    if _USE_MXU:
        cdig, rdig, ew = _mxu_tables(ctx)
        kern = _fwd_kernel_mxu
        specs = base_specs + [
            pl.BlockSpec((1, 2, 3, _SL, _SL), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, _LN, _LN), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, _SL, _LN), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (cdig, rdig, ew)
    else:
        kern = _fwd_kernel
        specs = base_specs + [
            pl.BlockSpec((1, _R, _R), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (ctx.twist, ctx.twA, ctx.twB)
    out = pl.pallas_call(
        kern,
        grid=(P, Bp // _TB),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, _TB, TR, TC), lambda p, b: (p, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Bp, TR, TC), I32),
        interpret=interpret or _INTERPRET,
    )(ctx.p_arr, ctx.ip_arr, x, *tables)
    return out[:, :B].reshape((P,) + lead + (n,))


def ntt_inv_pallas(ctx: NTTPallasContext, x, interpret: bool = False):
    """x: int32[P, ..., N] balanced (|x| <= 0.501p) -> conv residues."""
    n = ctx.n
    P = len(ctx.primes)
    lead = x.shape[1:-1]
    TR, TC = (_SL, _LN) if _USE_MXU else (_R, _R)
    x = x.reshape(P, -1, TR, TC)
    B = x.shape[1]
    Bp = -(-B // _TB) * _TB
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((P, Bp - B, TR, TC), dtype=x.dtype)], axis=1)
    base_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, _TB, TR, TC), lambda p, b: (p, b, 0, 0)),
    ]
    if _USE_MXU:
        cdig, rdig, ew = _mxu_tables(ctx)
        kern = _inv_kernel_mxu
        specs = base_specs + [
            pl.BlockSpec((1, 2, 3, _SL, _SL), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, _LN, _LN), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, _SL, _LN), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (cdig, rdig, ew)
    else:
        kern = _inv_kernel
        specs = base_specs + [
            pl.BlockSpec((1, _R, _R), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (ctx.inv_twist, ctx.twAi, ctx.twBi)
    out = pl.pallas_call(
        kern,
        grid=(P, Bp // _TB),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, _TB, TR, TC), lambda p, b: (p, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Bp, TR, TC), I32),
        interpret=interpret or _INTERPRET,
    )(ctx.p_arr, ctx.ip_arr, x, *tables)
    return out[:, :B].reshape((P,) + lead + (n,))


# --------------------------------------------------------------------------
# fully fused external product / keyswitch kernel:
# fwd NTT (all digits) -> pointwise VMP -> inverse NTT, one VMEM pass
# --------------------------------------------------------------------------

_TBR = 4  # ct rows per grid step in the fused kernel


def _fused_kernel_factory(T: int, M: int):
    def kernel_mxu(p_ref, ip_ref, x_ref, k_ref, cdig_ref, rdig_ref, ew_ref,
                   o_ref):
        p = p_ref[pl.program_id(0), 0]
        ip = ip_ref[pl.program_id(0), 0]
        # forward transform of all T digit polys: [TBR, T, 32, 128]
        x = _fwd_tile_mxu(x_ref[...], cdig_ref[0], rdig_ref[0], ew_ref[0],
                          p, ip)
        # pointwise VMP, then ONE batched inverse transform
        vs = []
        for m in range(M):
            acc = None
            for t in range(T):
                term = _mul_mod(x[:, t], k_ref[0, t, m][None], p, ip)
                acc = term if acc is None else acc + term
            vs.append(_reduce(acc, p, ip))
        y = jnp.stack(vs, axis=1)
        o_ref[...] = _inv_tile_mxu(y, cdig_ref[0], rdig_ref[0], ew_ref[0],
                                   p, ip)[None]

    def kernel(p_ref, ip_ref, x_ref, k_ref, twist_ref, twA_ref, twB_ref,
               itwist_ref, twAi_ref, twBi_ref, o_ref):
        pid = pl.program_id(0)
        p = p_ref[pid, 0]
        ip = ip_ref[pid, 0]
        # forward transform of all T digit polys: [TBR, T, 64, 64]
        x = _mul_mod(x_ref[...], twist_ref[0][None, None], p, ip)
        for si in range(6):
            x = _dif_stage(x, 32 >> si, twA_ref[0, si], p, ip)
        x = jnp.swapaxes(x, -1, -2)
        for si in range(6):
            x = _dif_stage(x, 32 >> si, twB_ref[0, si], p, ip)
        # pointwise VMP + inverse transform per output poly
        for m in range(M):
            acc = None
            for t in range(T):
                term = _mul_mod(x[:, t], k_ref[0, t, m][None], p, ip)
                acc = term if acc is None else acc + term
            y = _reduce(acc, p, ip)
            for si in range(6):
                y = _dit_stage(y, 1 << si, twBi_ref[0, 5 - si], p, ip)
            y = jnp.swapaxes(y, -1, -2)
            for si in range(6):
                y = _dit_stage(y, 1 << si, twAi_ref[0, 5 - si], p, ip)
            o_ref[0, :, m] = _mul_mod(y, itwist_ref[0][None], p, ip)

    return kernel_mxu if _USE_MXU else kernel


def fused_external_pallas(ctx: NTTPallasContext, x, keys_ntt,
                          interpret: bool = False):
    """One-kernel external product core.

    x: int32[B, T, N] normalized gadget digits (coefficient domain),
    keys_ntt: int32[P, T, M, N] prepared key rows (this kernel's
    spectrum order), both with N = 4096.
    Returns int32[P, B, M, N]: exact convolution residues
    sum_t x[b, t] (*) key[t, m], balanced -- feed to ops.crt.crt_fold.

    Replaces the ntt_fwd -> pointwise -> ntt_inv chain of
    core/ggsw.external_product / core/keyswitch.keyswitch with a single
    VMEM-resident pass (HBM traffic = digits in + keys + conv out)."""
    n = ctx.n
    B, T, n_ = x.shape
    P, T2, M, n3 = keys_ntt.shape
    assert n_ == n and n3 == n and T2 == T
    TR, TC = (_SL, _LN) if _USE_MXU else (_R, _R)
    x = x.reshape(B, T, TR, TC)
    Bp = -(-B // _TBR) * _TBR
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, T, TR, TC), dtype=x.dtype)], axis=0)
    k4 = keys_ntt.reshape(P, T, M, TR, TC)
    base_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_TBR, T, TR, TC), lambda p, b: (b, 0, 0, 0)),
        pl.BlockSpec((1, T, M, TR, TC), lambda p, b: (p, 0, 0, 0, 0)),
    ]
    if _USE_MXU:
        cdig, rdig, ew = _mxu_tables(ctx)
        specs = base_specs + [
            pl.BlockSpec((1, 2, 3, _SL, _SL), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, 3, _LN, _LN), lambda p, b: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, _SL, _LN), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (cdig, rdig, ew)
    else:
        specs = base_specs + [
            pl.BlockSpec((1, _R, _R), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
            pl.BlockSpec((1, _R, _R), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
            pl.BlockSpec((1, 6, _R, _R), lambda p, b: (p, 0, 0, 0)),
        ]
        tables = (ctx.twist, ctx.twA, ctx.twB, ctx.inv_twist, ctx.twAi,
                  ctx.twBi)
    out = pl.pallas_call(
        _fused_kernel_factory(T, M),
        grid=(P, Bp // _TBR),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, _TBR, M, TR, TC),
                               lambda p, b: (p, b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Bp, M, TR, TC), I32),
        interpret=interpret or _INTERPRET,
    )(ctx.p_arr, ctx.ip_arr, x, k4, *tables)
    return out[:, :B].reshape(P, B, M, n)


# --------------------------------------------------------------------------
# v2 kernel: prime axis INSIDE + Garner/fold/normalize epilogue in VMEM
# --------------------------------------------------------------------------
#
# Motivation (round-2 phase attribution, BENCH_NOTES.md): the v1 fused
# kernel writes per-prime conv residues to HBM ([P, B, M, N], ~100 MB at
# the 2^18 level-0 shape) and reconstructs limbs in an XLA chain
# (garner -> base-2^9 digits -> fold -> normalize) that round-trips
# HBM several more times -- 8.3 ms per digit product vs a ~0.5 ms HBM
# roofline.  Here the THREE primes' pipelines run inside one kernel
# instance and the exact CRT reconstruction + limb fold + carry
# normalize happen on VMEM tiles, so HBM traffic is: digits in + keys +
# normalized limbs out.  The optional `base` input fuses the consumer
# add (keyswitch b - ks, CMux low + sel) and its normalize too.
#
# With digits > 1 the kernel chains a whole CMux digit chain (the
# coordinate product of ram/address.py): each digit's normalized output
# limbs are the next digit's gadget digits, all without leaving VMEM.
#
# The digit chain is a GRID dimension (innermost), not an unrolled
# in-kernel loop: TPU grids execute sequentially on a core and VMEM
# scratch persists across steps, so the running ciphertext lives in a
# scratch buffer while each step's keys stream through a 1-digit block
# (a whole 4-digit key block plus double buffering was a 19.5 MB scoped
# VMEM allocation -- over the 16 MB limit).

# ct rows per grid step (v2 kernel).  4 exceeded scoped VMEM with the
# 64x64 stage-pipeline tables; the MXU path's tables are smaller, so
# the default is worth re-probing per hardware generation.
_TBF = int(os.environ.get("FHERAM_TBF", "2"))


def _to_canonical_k(x, p):
    half = p // 2
    x = jnp.where(x > half, x - p, x)
    return jnp.where(x < -half, x + p, x)


def _cent_np(v, p):
    v = int(v) % int(p)
    return np.int32(v - p if v > p // 2 else v)


# --------------------------------------------------------------------------
# in-kernel signed coefficient permutations (rotations / automorphisms)
# --------------------------------------------------------------------------
#
# Any map X^k -> +-X^{(g*k + t) mod 2N} (g odd: all galois automorphisms
# sigma_g at t=0, all rotations X^t at g=1) factors on the 32x128
# coefficient tile (k = 128*i + j):
#
#     lane:    j' = (g*j + t) mod 128            -- depends only on j
#     sublane: i' = (g*i mod 32) + h(j) mod 32,  h(j) = ((g*j+t) mod N)//128
#
# i.e. ONE 128x128 lane-permutation matmul + ONE 32x32 sublane-
# permutation matmul (both exact int8 on the digit planes) + <=5
# mask-conditional sublane rolls (binary decomposition of the
# destination-lane-indexed offset h) + a destination-indexed sign table.
# This is what lets whole automorphism-keyswitch CHAINS (trace, packing
# merges) run inside one kernel: the reference applies automorphisms as
# host-side vector permutes between calls (poulpy GLWEAutomorphismKey
# application, consumed at src/ram.rs:457,629).

@lru_cache(maxsize=None)
def _perm_tile_tables(n: int, g: int, t: int):
    """Tables for X^k -> sign * X^{(g*k + t) mod 2N} on [32, 128] tiles.

    Returns numpy (PL int8[128,128], PS int8[32,32], WM int32[5,1,128],
    SIGN int32[32,128])."""
    assert n == _SL * _LN, "perm tiles are wired for N=4096"
    g = g % (2 * n)
    t = t % (2 * n)
    assert g % 2 == 1, "galois element must be odd"
    k = np.arange(n)
    d2 = (g * k + t) % (2 * n)
    pos = d2 % n
    sgn = np.where(d2 < n, 1, -1).astype(np.int64)
    i_dst = pos // _LN
    j_dst = pos % _LN
    j = np.arange(_LN)
    q = (g * j + t) % n
    jmap = q % _LN
    h = (q // _LN) % _SL
    i = np.arange(_SL)
    imap = (g * i) % _SL
    # structure guards (the factorization is exact by construction)
    assert np.array_equal(j_dst, jmap[k % _LN])
    assert np.array_equal(i_dst, (imap[k // _LN] + h[k % _LN]) % _SL)
    PL = np.zeros((_LN, _LN), np.int8)
    PL[j, jmap] = 1
    PS = np.zeros((_SL, _SL), np.int8)
    PS[imap, i] = 1
    w = np.zeros(_LN, np.int64)
    w[jmap] = h
    WM = np.stack([(w >> b) & 1 for b in range(5)]).astype(np.int32)
    WM = np.ascontiguousarray(WM.reshape(5, 1, _LN))
    SIGN = np.zeros((_SL, _LN), np.int64)
    SIGN[i_dst, j_dst] = sgn
    return PL, PS, WM, np.ascontiguousarray(SIGN.astype(np.int32))


def _perm_apply(x, pl_t, ps_t, wm, sign, pl_id: bool = False,
                ps_id: bool = False, wm_bits: int = 5,
                sign_id: bool = False):
    """Apply a signed tile permutation in-kernel (exact).

    x: int32[..., 32, 128] with |x| <= 2^20.9; pl_t int8[128,128],
    ps_t int8[32,32], wm int32[5,1,128], sign int32[32,128]
    (_perm_tile_tables layout).

    pl_id / ps_id statically skip identity permutation matmuls: every
    trace/pack galois element g = N/2^l + 1 with l <= 5 has BOTH maps
    identity (g == 1 mod 128), and every rotation has the sublane map
    identity -- the hot pack path then runs rolls + sign only."""
    lead = x.shape[:-2]
    x2 = x.reshape((-1, _SL, _LN))
    B = x2.shape[0]
    if not (pl_id and ps_id):
        planes = _split3_i8(x2)
        outs = []
        for d in planes:
            y = d
            if not pl_id:
                plb = jnp.broadcast_to(pl_t, (B,) + pl_t.shape)
                y = jax.lax.dot_general(y, plb, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=I32)
            if not ps_id:
                psb = jnp.broadcast_to(ps_t, (B,) + ps_t.shape)
                y = jax.lax.dot_general(psb, y.astype(I8),
                                        (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=I32)
            outs.append(y)
        # exact recombination: permutations preserve plane values
        y = outs[0] + (outs[1].astype(I32) << 7) + (outs[2].astype(I32) << 14)
    else:
        y = x2
    # destination-lane-conditional sublane rolls: bit b of the offset
    for b in range(wm_bits):
        rolled = pltpu.roll(y, 1 << b, 1)
        y = jnp.where(wm[b][None] != 0, rolled, y)
    if not sign_id:
        y = y * sign[None]
    return y.reshape(x.shape)


class _TilePerm:
    """Host-side descriptor of one signed tile permutation with static
    identity flags; `inputs()` lists only the tables the kernel needs,
    and `apply(x, refs)` consumes them in the same order."""

    def __init__(self, n: int, g: int, t: int):
        PL, PS, WM, SG = _perm_tile_tables(n, g, t)
        self.pl_id = bool(np.array_equal(PL, np.eye(_LN, dtype=np.int8)))
        self.ps_id = bool(np.array_equal(PS, np.eye(_SL, dtype=np.int8)))
        self.sign_id = bool(np.all(SG == 1))
        # lane map that is a pure rotation j -> j + r (every X^t): a
        # single pltpu.roll on the lane axis, no digit planes at all
        jmap = np.argmax(PL, axis=1)
        r = int(jmap[0])
        self.lane_roll = (r if self.ps_id and not self.pl_id
                          and np.array_equal(jmap, (np.arange(_LN) + r) % _LN)
                          else None)
        nz = np.nonzero(WM.reshape(5, _LN).any(axis=1))[0]
        self.wm_bits = int(nz[-1] + 1) if nz.size else 0
        self._tabs = (PL, PS, WM[: max(self.wm_bits, 1)], SG)

    def inputs(self):
        out = []
        if self.lane_roll is None and not (self.pl_id and self.ps_id):
            if not self.pl_id:
                out.append(self._tabs[0])
            if not self.ps_id:
                out.append(self._tabs[1])
        if self.wm_bits:
            out.append(self._tabs[2])
        if not self.sign_id:
            out.append(self._tabs[3])
        return out

    def apply(self, x, refs):
        """refs: iterator over the kernel refs matching inputs()."""
        pl_t = ps_t = wm = sign = None
        if self.lane_roll is None and not (self.pl_id and self.ps_id):
            if not self.pl_id:
                pl_t = next(refs)[...]
            if not self.ps_id:
                ps_t = next(refs)[...]
        if self.wm_bits:
            wm = next(refs)[...]
        if not self.sign_id:
            sign = next(refs)[...]
        if self.lane_roll is not None:
            lead = x.shape[:-2]
            y = x.reshape((-1, _SL, _LN))
            y = pltpu.roll(y, self.lane_roll, 2)
            for b in range(self.wm_bits):
                rolled = pltpu.roll(y, 1 << b, 1)
                y = jnp.where(wm[b][None] != 0, rolled, y)
            if not self.sign_id:
                y = y * sign[None]
            return y.reshape(x.shape)
        return _perm_apply(x, pl_t, ps_t, wm, sign, pl_id=self.pl_id,
                           ps_id=self.ps_id, wm_bits=self.wm_bits,
                           sign_id=self.sign_id)


# shared kernel-body helpers (used by the fold, trace-chain, and
# pack-level kernels)

def _vmp_invntt(specs, kfun, T: int, M: int, primes, inv_fn):
    """Delayed-reduction VMP + ONE batched inverse transform per prime.

    specs: per prime [B, T, SL, LN] spectral digits (|x| <= 0.502p);
    kfun(p, t, m) -> [SL, LN] spectral key tile; inv_fn(p, y) applies the
    inverse tile NTT to y [B, M, SL, LN].  Returns per prime
    [B, M, SL, LN] coefficient-domain conv residues.

    The data operand is split ONCE per digit t into a 10-bit low part
    and the high rest (hoisted out of the m loop), raw int32
    cross-products accumulate WITHOUT per-term Barrett reductions, and
    each group of <= 10 terms folds with one Barrett pair.  Exact:
    |x| <= 0.502p (p <= 786433) gives |a1| <= 386, |a0| <= 512, so group
    sums stay <= 10*512*0.502p = 2.03e9 < 2^31."""
    _VGl = 10
    rsb = []
    for p in range(len(primes)):
        pp = np.int32(primes[p])
        ipv = np.float32(1.0 / primes[p])
        xs = specs[p]
        a1 = (xs + 512) >> 10
        a0 = xs - (a1 << 10)
        c10 = _cent_np(1 << 10, primes[p])
        vs = []
        for m in range(M):
            g_acc = None
            for t0 in range(0, T, _VGl):
                sh = sl = None
                for t in range(t0, min(t0 + _VGl, T)):
                    kk = kfun(p, t, m)[None]
                    ph = a1[:, t] * kk
                    pl_ = a0[:, t] * kk
                    sh = ph if sh is None else sh + ph
                    sl = pl_ if sl is None else sl + pl_
                gg = _mul_mod(_reduce(sh, pp, ipv), c10,
                              pp, ipv) + _reduce(sl, pp, ipv)
                g_acc = gg if g_acc is None else g_acc + gg
            vs.append(_reduce(g_acc, pp, ipv))
        y = jnp.stack(vs, axis=1)
        rsb.append(inv_fn(p, y))
    return rsb


def _garner_fold_acc(rsb, primes, C2: int, Lk: int, Lout: int,
                     base2k: int = 17):
    """Exact CRT fold of per-prime conv residues into RAW output-limb
    accumulators (pre-normalize).  rsb: per prime [B, M, SL, LN] with
    M = C2*Lk, row-major over (c2, key limb).  Returns acc[C2][Lout] of
    (None | int32[B, SL, LN])."""
    P = len(primes)
    assert P == 3, "garner fold wired for 3 primes"
    M = C2 * Lk
    g = garner_consts(tuple(primes))
    p1, p2, p3 = primes
    pp = [np.int32(q) for q in primes]
    ip = [np.float32(1.0 / q) for q in primes]
    c12 = _cent_np(g["c12"], p2)
    c123 = _cent_np(g["c123"], p3)
    p1m3 = _cent_np(g["p1_mod_p3"], p3)
    p1_digits = g["p1_digits"]
    p1p2_digits = g["p1p2_digits"]
    ndig = 8  # base-2^9 digits covering the integer range (ops/crt.py)
    half9 = 1 << 8
    mask9 = (1 << 9) - 1

    acc = [[None] * Lout for _ in range(C2)]
    for m in range(M):
        rs = [rsb[p][:, m] for p in range(P)]

        # balanced Garner mixed-radix digits (ops/crt.py semantics)
        v1 = _to_canonical_k(rs[0], pp[0])
        v2 = _to_canonical_k(
            _mul_mod(rs[1] - v1, c12, pp[1], ip[1]), pp[1])
        tt = _to_canonical_k(_mul_mod(v2, p1m3, pp[2], ip[2]), pp[2])
        v3 = _to_canonical_k(
            _mul_mod(rs[2] - v1 - tt, c123, pp[2], ip[2]), pp[2])

        # expand into balanced base-2^9 digits
        cols = [None] * ndig
        cols[0] = v1
        for j, c in enumerate(p1_digits):
            if c:
                add = np.int32(c) * v2
                cols[j] = add if cols[j] is None else cols[j] + add
        for j, c in enumerate(p1p2_digits):
            if c:
                add = np.int32(c) * v3
                cols[j] = add if cols[j] is None else cols[j] + add
        d9 = []
        carry = None
        for k in range(ndig):
            t9 = cols[k] if cols[k] is not None else None
            if carry is not None:
                t9 = carry if t9 is None else t9 + carry
            if t9 is None:
                d9.append(None)
                carry = None
                continue
            d = ((t9 + half9) & mask9) - half9
            carry = (t9 - d) >> 9
            d9.append(d)

        # fold into the output limb accumulator
        c2i, lk = m // Lk, m % Lk
        w = base2k * (lk + 1)
        for k, d in enumerate(d9):
            if d is None:
                continue
            e = 9 * k - w
            if e >= 0:
                continue
            tl = (-e - 1) // base2k
            if tl >= Lout:
                continue
            s9 = e + base2k * (tl + 1)
            add = d << s9 if s9 else d
            if acc[c2i][tl] is None:
                acc[c2i][tl] = add
            else:
                acc[c2i][tl] = acc[c2i][tl] + add
    return acc


def _carry_normalize(acc, base_fn, sign: int, zero, base2k: int = 17):
    """Balanced carry-propagate normalize over the limb axis.

    acc: acc[C2][Lout] raw limb accumulators (None = zero);
    base_fn(c2i, l) -> tile added before the normalize (or None).
    Returns a flat list of C2*Lout normalized limb tiles."""
    halfb = 1 << (base2k - 1)
    maskb = (1 << base2k) - 1
    outs = []
    for c2i in range(len(acc)):
        lim = []
        carry = None
        for l in range(len(acc[c2i]) - 1, -1, -1):
            t = acc[c2i][l]
            t = zero if t is None else t
            if sign < 0:
                t = -t
            b = base_fn(c2i, l)
            if b is not None:
                t = t + b
            if carry is not None:
                t = t + carry
            d = ((t + halfb) & maskb) - halfb
            carry = (t - d) >> base2k
            lim.append(d)
        lim.reverse()
        outs.extend(lim)
    return outs


def _fold_kernel_factory(primes, T: int, C2: int, Lk: int, Lout: int,
                         digits: int, has_base: bool, sign: int,
                         spectral_in: bool = False, dig_axis: int = 1,
                         base2k: int = 17):
    P = len(primes)
    assert P == 3, "fold kernel wired for 3 primes"
    M = C2 * Lk

    chained_spectral = spectral_in and digits > 1

    def kernel(*refs):
        if chained_spectral:
            *refs, spec_ref = refs
        if _USE_MXU:
            if has_base:
                (x_ref, k_ref, base_ref, cdig_ref, rdig_ref,
                 ew_ref, o_ref, carry_ref) = refs
            else:
                (x_ref, k_ref, cdig_ref, rdig_ref,
                 ew_ref, o_ref, carry_ref) = refs
        else:
            if has_base:
                (x_ref, k_ref, base_ref, twist_ref, twA_ref, twB_ref,
                 itwist_ref, twAi_ref, twBi_ref, o_ref, carry_ref) = refs
            else:
                (x_ref, k_ref, twist_ref, twA_ref, twB_ref,
                 itwist_ref, twAi_ref, twBi_ref, o_ref, carry_ref) = refs

        pp = [np.int32(q) for q in primes]
        ip = [np.float32(1.0 / q) for q in primes]
        d_id = pl.program_id(dig_axis)

        if chained_spectral:
            # digit 0 consumes the SHARED spectral input (forward
            # transform hoisted out of an address batch); later digits
            # forward-transform the VMEM carry as in the plain chain
            assert _USE_MXU, "chained spectral input needs the MXU path"

            @pl.when(d_id == 0)
            def _():
                spec_ref[...] = x_ref[...]

            @pl.when(d_id > 0)
            def _():
                cur = carry_ref[...]
                for p in range(P):
                    spec_ref[p] = _fwd_tile_mxu(cur, cdig_ref[p],
                                                rdig_ref[p], ew_ref[p],
                                                pp[p], ip[p])

            specs = [spec_ref[p] for p in range(P)]
        elif spectral_in:
            # x arrives already in the kernels' spectrum order (shared
            # forward transform hoisted out, e.g. batched reads): skip
            # the fwd NTT entirely
            cur = None
            specs = [x_ref[p] for p in range(P)]
        else:
            if digits == 1:
                cur = x_ref[...]  # [TBF, T, R, R]
            else:
                # chained digits ride the sequential grid: step d's
                # normalized output limbs persist in VMEM scratch as
                # step d+1's input
                @pl.when(d_id == 0)
                def _():
                    carry_ref[...] = x_ref[...]

                cur = carry_ref[...]

            # forward NTT of all T digit polys, per prime
            specs = []
            for p in range(P):
                if _USE_MXU:
                    specs.append(_fwd_tile_mxu(cur, cdig_ref[p],
                                               rdig_ref[p], ew_ref[p],
                                               pp[p], ip[p]))
                    continue
                x = _mul_mod(cur, twist_ref[p][None, None], pp[p], ip[p])
                for si in range(6):
                    x = _dif_stage(x, 32 >> si, twA_ref[p, si], pp[p], ip[p])
                x = jnp.swapaxes(x, -1, -2)
                for si in range(6):
                    x = _dif_stage(x, 32 >> si, twB_ref[p, si], pp[p], ip[p])
                specs.append(x)

        # VMP (all output polys), then ONE batched inverse NTT per prime:
        # per-m inverse transforms would run the MXU at batch TBF --
        # latency-bound for small kernels (trace steps measured 2.5x
        # slower that way).  Delayed-reduction trick + exactness bounds:
        # see _vmp_invntt.
        if _USE_MXU:
            def inv_fn(p, y):
                return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p],
                                     ew_ref[p], pp[p], ip[p])
        else:
            def inv_fn(p, y):
                for si in range(6):
                    y = _dit_stage(y, 1 << si, twBi_ref[p, 5 - si],
                                   pp[p], ip[p])
                y = jnp.swapaxes(y, -1, -2)
                for si in range(6):
                    y = _dit_stage(y, 1 << si, twAi_ref[p, 5 - si],
                                   pp[p], ip[p])
                return _mul_mod(y, itwist_ref[p][None, None], pp[p], ip[p])

        rsb = _vmp_invntt(specs, lambda p, t, m: k_ref[p, 0, t, m],
                          T, M, primes, inv_fn)  # per prime [TBF, M, R, R]

        # exact CRT fold into raw limb accumulators, then one normalize
        acc = _garner_fold_acc(rsb, primes, C2, Lk, Lout, base2k)
        if has_base:
            base = base_ref[...]  # [TBF, C2*Lout, R, R]
            base_fn = lambda c2i, l: base[:, c2i * Lout + l]
        else:
            base_fn = lambda c2i, l: None
        zero = jnp.zeros_like(specs[0][:, 0])
        outs = _carry_normalize(acc, base_fn, sign, zero, base2k)
        res = jnp.stack(outs, axis=1)  # [TBF, C2*Lout, R, R]

        if digits == 1:
            o_ref[...] = res
        else:
            @pl.when(d_id < digits - 1)
            def _():
                carry_ref[...] = res

            @pl.when(d_id == digits - 1)
            def _():
                o_ref[...] = res

    return kernel


def fused_external_fold_pallas(ctx: NTTPallasContext, x, keys_ntt,
                               out_limbs: int, c2: int, base=None,
                               sign: int = 1, x_is_ntt: bool = False,
                               interpret: bool = False):
    """One-kernel external product / keyswitch INCLUDING the exact CRT
    fold and carry normalize.

    x: int32[B, T, N] normalized gadget digits (coefficient domain), or
      -- with x_is_ntt -- int32[P, B, T, N] already in this kernel
      family's spectrum order (ntt_fwd_pallas output); the fwd NTT is
      then skipped, which lets batched reads hoist ONE shared data
      transform out of a whole address batch.
    keys_ntt: int32[P, digits, T, M, N] prepared key rows, M = c2*Lk,
      row-major over (c2, key limb); digits > 1 chains a whole CMux
      digit chain in VMEM (requires T == c2*out_limbs).
    base: optional int32[B, c2, out_limbs, N] added (after `sign`) before
      the in-kernel normalize: out = normalize(base + sign*conv_limbs).
    Returns int32[B, c2, out_limbs, N] normalized."""
    n = ctx.n
    P, digits, T2, M, n3 = keys_ntt.shape
    if x_is_ntt:
        # digits == 1: plain spectral keyswitch; digits > 1: digit 0
        # consumes the shared spectra, later digits transform the carry
        P_, B, T, n_ = x.shape
        assert P_ == P
    else:
        B, T, n_ = x.shape
    assert n_ == n and n3 == n and T2 == T and M % c2 == 0
    Lk = M // c2
    if digits > 1:
        assert T == c2 * out_limbs, "chained digits need T == C2*Lout"
        assert base is None, "base fusion is single-digit only"
    TR, TC = (_SL, _LN) if _USE_MXU else (_R, _R)
    Bp = -(-B // _TBF) * _TBF
    if x_is_ntt:
        x = x.reshape(P, B, T, TR, TC)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((P, Bp - B, T, TR, TC), dtype=x.dtype)], axis=1)
        x_spec = pl.BlockSpec((P, _TBF, T, TR, TC),
                              lambda b, d: (0, b, 0, 0, 0))
    else:
        x = x.reshape(B, T, TR, TC)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((Bp - B, T, TR, TC), dtype=x.dtype)], axis=0)
        x_spec = pl.BlockSpec((_TBF, T, TR, TC), lambda b, d: (b, 0, 0, 0))
    k6 = keys_ntt.reshape(P, digits, T, M, TR, TC)

    has_base = base is not None
    inputs = [x, k6]
    in_specs = [
        x_spec,
        # one digit's keys per grid step: the whole chain resident (plus
        # double buffering) blows the 16 MB scoped-VMEM limit
        pl.BlockSpec((P, 1, T, M, TR, TC),
                     lambda b, d: (0, d, 0, 0, 0, 0)),
    ]
    if has_base:
        bb = base.reshape(B, c2 * out_limbs, TR, TC)
        if Bp != B:
            bb = jnp.concatenate(
                [bb, jnp.zeros((Bp - B, c2 * out_limbs, TR, TC), bb.dtype)],
                axis=0)
        inputs.append(bb)
        in_specs.append(
            pl.BlockSpec((_TBF, c2 * out_limbs, TR, TC),
                         lambda b, d: (b, 0, 0, 0)))
    if _USE_MXU:
        cdig, rdig, ew = _mxu_tables(ctx)
        inputs += [cdig, rdig, ew]
        in_specs += [
            pl.BlockSpec((P, 2, 3, _SL, _SL), lambda b, d: (0, 0, 0, 0, 0)),
            pl.BlockSpec((P, 2, 3, _LN, _LN), lambda b, d: (0, 0, 0, 0, 0)),
            pl.BlockSpec((P, 2, _SL, _LN), lambda b, d: (0, 0, 0, 0)),
        ]
    else:
        inputs += [ctx.twist, ctx.twA, ctx.twB, ctx.inv_twist, ctx.twAi,
                   ctx.twBi]
        in_specs += [
            pl.BlockSpec((P, _R, _R), lambda b, d: (0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, _R, _R), lambda b, d: (0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda b, d: (0, 0, 0, 0)),
        ]

    scratch = [pltpu.VMEM((_TBF, T, TR, TC), I32)]
    if x_is_ntt and digits > 1:
        scratch.append(pltpu.VMEM((P, _TBF, T, TR, TC), I32))
    out = pl.pallas_call(
        _fold_kernel_factory(ctx.primes, T, c2, Lk, out_limbs, digits,
                             has_base, sign, spectral_in=x_is_ntt),
        grid=(Bp // _TBF, digits),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TBF, c2 * out_limbs, TR, TC),
                               lambda b, d: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, c2 * out_limbs, TR, TC), I32),
        scratch_shapes=scratch,
        interpret=interpret or _INTERPRET,
    )(*inputs)
    return out[:B].reshape(B, c2, out_limbs, n)


def fused_external_fold_batched(ctx: NTTPallasContext, x, keys_ntt,
                                out_limbs: int, c2: int,
                                x_is_ntt: bool = False, base=None,
                                sign: int = 1, tbf: int | None = None,
                                interpret: bool = False):
    """fused_external_fold_pallas with PER-ITEM keys: item a of the
    leading batch axis is processed against keys_ntt[a] (an address
    batch's per-address CMux chains in ONE kernel launch -- B separate
    calls would serialize on dispatch overhead).

    x: int32[A, B, T, N]; keys_ntt: int32[A, P, digits, T, M, N].
    With x_is_ntt, x is int32[P, B, T, N] -- ONE spectral operand SHARED
    by every item (batched reads: the RAM rows' forward transform hoisted
    out of the whole address batch); digit 0 consumes it directly and
    later digits transform the VMEM carry.
    base: optional int32[A, B, c2, out_limbs, N] added (after `sign`)
    before the in-kernel normalize -- the VM's CMux low-arm fusion.
    tbf: rows per grid step (default _TBF; pass 1 for B == 1 callers so
    nothing is wasted on padding).
    Returns int32[A, B, c2, out_limbs, N] normalized."""
    n = ctx.n
    A2, P, digits, T2, M, n3 = keys_ntt.shape
    A = A2
    if x_is_ntt:
        P_, B, T, n_ = x.shape
        assert P_ == P
    else:
        A3, B, T, n_ = x.shape
        assert A3 == A
    assert n_ == n and n3 == n and T2 == T and M % c2 == 0
    Lk = M // c2
    if digits > 1:
        assert T == c2 * out_limbs, "chained digits need T == C2*Lout"
        assert base is None, "base fusion is single-digit only"
    TR, TC = (_SL, _LN) if _USE_MXU else (_R, _R)
    TBF = tbf if tbf is not None else _TBF
    Bp = -(-B // TBF) * TBF
    if x_is_ntt:
        x = x.reshape(P, B, T, TR, TC)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((P, Bp - B, T, TR, TC), dtype=x.dtype)], axis=1)
        x_spec = pl.BlockSpec((P, TBF, T, TR, TC),
                              lambda a, b, d: (0, b, 0, 0, 0))
    else:
        x = x.reshape(A, B, T, TR, TC)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.zeros((A, Bp - B, T, TR, TC), dtype=x.dtype)], axis=1)
        x_spec = pl.BlockSpec((None, TBF, T, TR, TC),
                              lambda a, b, d: (a, b, 0, 0, 0))
    k7 = keys_ntt.reshape(A, P, digits, T, M, TR, TC)

    Mo = c2 * out_limbs
    specs = [
        x_spec,
        pl.BlockSpec((None, P, 1, T, M, TR, TC),
                     lambda a, b, d: (a, 0, d, 0, 0, 0, 0)),
    ]
    has_base = base is not None
    extra_inputs = []
    if has_base:
        bb = base.reshape(A, B, Mo, TR, TC)
        if Bp != B:
            bb = jnp.concatenate(
                [bb, jnp.zeros((A, Bp - B, Mo, TR, TC), bb.dtype)], axis=1)
        extra_inputs.append(bb)
        specs.append(pl.BlockSpec((None, TBF, Mo, TR, TC),
                                  lambda a, b, d: (a, b, 0, 0, 0)))
    if _USE_MXU:
        cdig, rdig, ew = _mxu_tables(ctx)
        tables = [cdig, rdig, ew]
        specs += [
            pl.BlockSpec((P, 2, 3, _SL, _SL), lambda a, b, d: (0, 0, 0, 0, 0)),
            pl.BlockSpec((P, 2, 3, _LN, _LN), lambda a, b, d: (0, 0, 0, 0, 0)),
            pl.BlockSpec((P, 2, _SL, _LN), lambda a, b, d: (0, 0, 0, 0)),
        ]
    else:
        tables = [ctx.twist, ctx.twA, ctx.twB, ctx.inv_twist, ctx.twAi,
                  ctx.twBi]
        specs += [
            pl.BlockSpec((P, _R, _R), lambda a, b, d: (0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda a, b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda a, b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, _R, _R), lambda a, b, d: (0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda a, b, d: (0, 0, 0, 0)),
            pl.BlockSpec((P, 6, _R, _R), lambda a, b, d: (0, 0, 0, 0)),
        ]
    scratch = [pltpu.VMEM((TBF, T, TR, TC), I32)]
    if x_is_ntt and digits > 1:
        scratch.append(pltpu.VMEM((P, TBF, T, TR, TC), I32))
    out = pl.pallas_call(
        _fold_kernel_factory(ctx.primes, T, c2, Lk, out_limbs, digits,
                             has_base=has_base, sign=sign,
                             spectral_in=x_is_ntt, dig_axis=2),
        grid=(A, Bp // TBF, digits),
        in_specs=specs,
        out_specs=pl.BlockSpec((None, TBF, Mo, TR, TC),
                               lambda a, b, d: (a, b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((A, Bp, Mo, TR, TC), I32),
        scratch_shapes=scratch,
        interpret=interpret or _INTERPRET,
    )(x, k7, *extra_inputs, *tables)
    return out[:, :B].reshape(A, B, c2, out_limbs, n)


# --------------------------------------------------------------------------
# fused automorphism-keyswitch CHAINS: the whole trace in ONE kernel,
# pack merge levels with all glue (rotate / add / automorphism) in-VMEM
# --------------------------------------------------------------------------
#
# The normalized trace is log_n SEQUENTIAL steps ct <- ct + KS(sigma_g(ct))
# (core/keyswitch.trace; reference trace_inplace, consumed at
# src/ram.rs:457).  As separate launches each step pays kernel dispatch,
# an XLA gather for sigma_g, and HBM round-trips of the whole ct.  Here
# the steps ride the sequential grid (like the fold kernel's digit
# chain): the ct limbs persist in VMEM scratch, each step's automorphism
# is applied in-VMEM via _perm_apply, and each step's keys/tables stream
# through step-indexed blocks.  HBM traffic: ct in + S key blocks + ct
# out.  Pack merge levels (core/packer.py) get the same treatment with
# the X^t rotation and the u/v combination fused in.

_TBT = int(os.environ.get("FHERAM_TBT", "4"))  # ct rows per grid step


def _stack_perm_tables(n: int, maps):
    """Stack _perm_tile_tables for a list of (g, t) maps: returns jnp
    (PL [S,128,128] i8, PS [S,32,32] i8, WM [S,5,1,128] i32,
    SIGN [S,32,128] i32)."""
    tabs = [_perm_tile_tables(n, g, t) for (g, t) in maps]
    return tuple(np.stack([t[i] for t in tabs]) for i in range(4))


def _trace_kernel_factory(primes, rank: int, L: int, Lk: int, S: int,
                          perm: _TilePerm | None = None,
                          base2k: int = 17, in_digits: int | None = None):
    """perm: a static _TilePerm when S == 1 (identity matmuls skipped);
    None = generic stacked per-step tables (S > 1).
    in_digits: decompose only the top in_digits limbs of the a-part
    (read-path gadget truncation, params.Params.read_ks_digits)."""
    P = len(primes)
    C2 = rank + 1
    Td = in_digits if in_digits is not None else L
    T = rank * Td
    M = C2 * Lk
    nperm = len(perm.inputs()) if perm is not None else 4

    def kernel(*refs):
        x_ref, k_ref = refs[:2]
        perm_refs = refs[2 : 2 + nperm]
        cdig_ref, rdig_ref, ew_ref, o_ref, ct_ref = refs[2 + nperm :]
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ct_ref[...] = x_ref[...]

        ct = ct_ref[...]  # [TBT, C2, L, SL, LN] normalized limbs
        pp = [np.int32(q) for q in primes]
        ip = [np.float32(1.0 / q) for q in primes]

        # sigma_g on every limb of every component (in-VMEM, exact)
        if perm is not None:
            sa = perm.apply(ct, iter(perm_refs))
        else:
            pl_ref, ps_ref, wm_ref, sg_ref = perm_refs
            sa = _perm_apply(ct, pl_ref[0], ps_ref[0], wm_ref[0], sg_ref[0])

        # keyswitch the a-part of sigma_g(ct) back to the base secret
        digs = sa[:, :rank, :Td].reshape((ct.shape[0], T, _SL, _LN))
        specs = [_fwd_tile_mxu(digs, cdig_ref[p], rdig_ref[p], ew_ref[p],
                               pp[p], ip[p]) for p in range(P)]

        def inv_fn(p, y):
            return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p], ew_ref[p],
                                 pp[p], ip[p])

        rsb = _vmp_invntt(specs, lambda p, t, m: k_ref[0, p, t, m],
                          T, M, primes, inv_fn)
        acc = _garner_fold_acc(rsb, primes, C2, Lk, L, base2k)

        # ct + KS(sigma(ct)): base = ct, plus sigma(b) at the b component
        def base_fn(c2i, l):
            b = ct[:, c2i, l]
            if c2i == rank:
                b = b + sa[:, rank, l]
            return b

        zero = jnp.zeros_like(ct[:, 0, 0])
        outs = _carry_normalize(acc, base_fn, -1, zero, base2k)
        res = jnp.stack(outs, axis=1).reshape(ct.shape)
        ct_ref[...] = res

        @pl.when(s == S - 1)
        def _():
            o_ref[...] = res

    return kernel


def fused_trace_pallas(ctx: NTTPallasContext, ct, keys_stacked, gal_els,
                       interpret: bool = False):
    """The whole normalized-trace chain in ONE kernel launch.

    ct: int32[B, C2, L, N] normalized; keys_stacked: int32[S, P, T, M, N]
    prepared automorphism keys (step s's key rows, T = rank*L,
    M = C2*Lk), gal_els: tuple of S galois elements.  Returns
    int32[B, C2, L, N] == the composed
    ct <- normalize(ct + KS(sigma_g(ct))) chain, bit-exactly."""
    assert _USE_MXU, "fused trace requires the MXU kernel family"
    n = ctx.n
    B, C2, L, n_ = ct.shape
    S, P, T, M, n3 = keys_stacked.shape
    rank = C2 - 1
    assert n_ == n and n3 == n and T % rank == 0 and M % C2 == 0
    Td = T // rank  # truncated input digits (== L when not truncated)
    assert Td <= L
    assert S == len(gal_els) and S >= 1
    Lk = M // C2

    x = ct.reshape(B, C2, L, _SL, _LN)
    Bp = -(-B // _TBT) * _TBT
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, C2, L, _SL, _LN), dtype=x.dtype)], axis=0)
    k6 = keys_stacked.reshape(S, P, T, M, _SL, _LN)
    cdig, rdig, ew = _mxu_tables(ctx)

    in_specs = [
        pl.BlockSpec((_TBT, C2, L, _SL, _LN), lambda b, s: (b, 0, 0, 0, 0)),
        pl.BlockSpec((1, P, T, M, _SL, _LN),
                     lambda b, s: (s, 0, 0, 0, 0, 0)),
    ]
    if S == 1:
        # static single-step tables: identity permutation matmuls are
        # skipped (all split-tree levels use g = N/2^l + 1, l <= 5,
        # whose lane AND sublane maps are identity)
        perm = _TilePerm(n, gal_els[0], 0)
        ptabs = [jnp.asarray(v) for v in perm.inputs()]
        in_specs += [pl.BlockSpec(v.shape, (lambda b, s, _nd=v.ndim:
                                            (0,) * _nd)) for v in ptabs]
    else:
        perm = None
        ptabs = list(_stack_perm_tables(n, [(g, 0) for g in gal_els]))
        in_specs += [
            pl.BlockSpec((1, _LN, _LN), lambda b, s: (s, 0, 0)),
            pl.BlockSpec((1, _SL, _SL), lambda b, s: (s, 0, 0)),
            pl.BlockSpec((1, 5, 1, _LN), lambda b, s: (s, 0, 0, 0)),
            pl.BlockSpec((1, _SL, _LN), lambda b, s: (s, 0, 0)),
        ]
    in_specs += [
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda b, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _trace_kernel_factory(ctx.primes, rank, L, Lk, S, perm,
                              in_digits=Td),
        grid=(Bp // _TBT, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TBT, C2, L, _SL, _LN),
                               lambda b, s: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, C2, L, _SL, _LN), I32),
        scratch_shapes=[pltpu.VMEM((_TBT, C2, L, _SL, _LN), I32)],
        interpret=interpret or _INTERPRET,
    )(x, k6, *ptabs, cdig, rdig, ew)
    return out[:B].reshape(B, C2, L, n)


def _pack_kernel_factory(primes, rank: int, L: int, Lk: int,
                         rperm: _TilePerm, aperm: _TilePerm,
                         base2k: int = 17, in_digits: int | None = None):
    P = len(primes)
    C2 = rank + 1
    Td = in_digits if in_digits is not None else L
    T = rank * Td
    M = C2 * Lk
    nperm = len(rperm.inputs()) + len(aperm.inputs())

    def kernel(*refs):
        a_ref, b_ref, k_ref = refs[:3]
        perm_refs = iter(refs[3 : 3 + nperm])
        cdig_ref, rdig_ref, ew_ref, o_ref = refs[3 + nperm :]
        pp = [np.int32(q) for q in primes]
        ip = [np.float32(1.0 / q) for q in primes]
        A = a_ref[...]   # [TBT, C2, L, SL, LN]
        Bc = b_ref[...]

        # merge glue in-VMEM: u = A + X^t B, v = A - X^t B, sigma_g(v)
        xb = rperm.apply(Bc, perm_refs)
        u = A + xb
        v = A - xb
        sv = aperm.apply(v, perm_refs)

        digs = sv[:, :rank, :Td].reshape((A.shape[0], T, _SL, _LN))
        specs = [_fwd_tile_mxu(digs, cdig_ref[p], rdig_ref[p], ew_ref[p],
                               pp[p], ip[p]) for p in range(P)]

        def inv_fn(p, y):
            return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p], ew_ref[p],
                                 pp[p], ip[p])

        rsb = _vmp_invntt(specs, lambda p, t, m: k_ref[p, t, m],
                          T, M, primes, inv_fn)
        acc = _garner_fold_acc(rsb, primes, C2, Lk, L, base2k)

        def base_fn(c2i, l):
            b = u[:, c2i, l]
            if c2i == rank:
                b = b + sv[:, rank, l]
            return b

        zero = jnp.zeros_like(A[:, 0, 0])
        outs = _carry_normalize(acc, base_fn, -1, zero, base2k)
        o_ref[...] = jnp.stack(outs, axis=1).reshape(A.shape)

    return kernel


def fused_pack_merge_pallas(ctx: NTTPallasContext, A, B, t_rot: int,
                            g: int, key_ntt, interpret: bool = False,
                            tbt: int | None = None):
    """One pack-tree merge level with all glue in-kernel:

        out = normalize(u + KS(sigma_g(v))),  u/v = A +- X^t B

    A, B: int32[nb, C2, L, N] normalized; key_ntt: int32[P, T, M, N]
    (T = rank*L, M = C2*Lk).  Returns int32[nb, C2, L, N], bit-exact vs
    the composed rotate/add/automorphism_ks path (core/packer.py)."""
    assert _USE_MXU, "fused pack merge requires the MXU kernel family"
    n = ctx.n
    nb, C2, L, n_ = A.shape
    P, T, M, n3 = key_ntt.shape
    rank = C2 - 1
    assert n_ == n and n3 == n and T % rank == 0 and M % C2 == 0
    Td = T // rank
    assert Td <= L
    Lk = M // C2

    TBT = tbt if tbt is not None else _TBT
    a = A.reshape(nb, C2, L, _SL, _LN)
    b = B.reshape(nb, C2, L, _SL, _LN)
    Bp = -(-nb // TBT) * TBT
    if Bp != nb:
        pad = jnp.zeros((Bp - nb, C2, L, _SL, _LN), dtype=a.dtype)
        a = jnp.concatenate([a, pad], axis=0)
        b = jnp.concatenate([b, pad], axis=0)
    k5 = key_ntt.reshape(P, T, M, _SL, _LN)
    rperm = _TilePerm(n, 1, t_rot)
    aperm = _TilePerm(n, g, 0)
    ptabs = [jnp.asarray(v) for v in rperm.inputs() + aperm.inputs()]
    cdig, rdig, ew = _mxu_tables(ctx)

    ct_spec = pl.BlockSpec((TBT, C2, L, _SL, _LN),
                           lambda bb: (bb, 0, 0, 0, 0))
    const = lambda *shape: pl.BlockSpec(shape, lambda bb: (0,) * len(shape))
    in_specs = [
        ct_spec, ct_spec,
        const(P, T, M, _SL, _LN),
        *[const(*v.shape) for v in ptabs],
        const(P, 2, 3, _SL, _SL), const(P, 2, 3, _LN, _LN),
        const(P, 2, _SL, _LN),
    ]
    out = pl.pallas_call(
        _pack_kernel_factory(ctx.primes, rank, L, Lk, rperm, aperm,
                             in_digits=Td),
        grid=(Bp // TBT,),
        in_specs=in_specs,
        out_specs=ct_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, C2, L, _SL, _LN), I32),
        interpret=interpret or _INTERPRET,
    )(a, b, k5, *ptabs, cdig, rdig, ew)
    return out[:nb].reshape(nb, C2, L, n)


def _split_kernel_factory(primes, rank: int, L: int, Lk: int,
                          aperm: _TilePerm, rback: _TilePerm,
                          base2k: int = 17):
    """One split-tree level (core/keyswitch.extract_slots) in ONE
    launch with TWO outputs: A = sigma_KS(x) is computed once and

        child0 = normalize(x + A)
        child1 = normalize(X^-t (x - A)) = normalize(X^-t (2x - child0))

    -- the keyswitch-halved split with ALL glue (automorphism, rotate,
    adds, normalize) in-VMEM (an XLA-level automorphism is a minor-dim
    gather; separate launches pay dispatch + HBM round trips)."""
    P = len(primes)
    C2 = rank + 1
    T = rank * L
    M = C2 * Lk
    nperm = len(aperm.inputs()) + len(rback.inputs())

    def kernel(*refs):
        x_ref, k_ref = refs[:2]
        perm_refs = iter(refs[2 : 2 + nperm])
        cdig_ref, rdig_ref, ew_ref, o0_ref, o1_ref = refs[2 + nperm :]
        pp = [np.int32(q) for q in primes]
        ip = [np.float32(1.0 / q) for q in primes]
        X = x_ref[...]  # [TBT, C2, L, SL, LN]

        sv = aperm.apply(X, perm_refs)  # sigma_g(x), in-VMEM
        digs = sv[:, :rank].reshape((X.shape[0], T, _SL, _LN))
        specs = [_fwd_tile_mxu(digs, cdig_ref[p], rdig_ref[p], ew_ref[p],
                               pp[p], ip[p]) for p in range(P)]

        def inv_fn(p, y):
            return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p], ew_ref[p],
                                 pp[p], ip[p])

        rsb = _vmp_invntt(specs, lambda p, t, m: k_ref[p, t, m],
                          T, M, primes, inv_fn)
        acc = _garner_fold_acc(rsb, primes, C2, Lk, L, base2k)

        # child0 = normalize(x + KS(sigma_g x)): base = x + embed(sv_b)
        def base_fn(c2i, l):
            b = X[:, c2i, l]
            if c2i == rank:
                b = b + sv[:, rank, l]
            return b

        zero = jnp.zeros_like(X[:, 0, 0])
        c0 = jnp.stack(_carry_normalize(acc, base_fn, -1, zero, base2k),
                       axis=1).reshape(X.shape)
        o0_ref[...] = c0

        # child1 = X^-t(2x - child0), |2x - c0| <= 3*2^16, normalized
        d = rback.apply(2 * X - c0, perm_refs)
        acc1 = [[d[:, c2i, l] for l in range(L)] for c2i in range(C2)]
        o1_ref[...] = jnp.stack(
            _carry_normalize(acc1, lambda c2i, l: None, 1, zero, base2k),
            axis=1).reshape(X.shape)

    return kernel


def fused_split_pallas(ctx: NTTPallasContext, ct, t_rot: int, g: int,
                       key_ntt, interpret: bool = False,
                       tbt: int | None = None):
    """The halved split-tree level with in-kernel glue (see
    _split_kernel_factory).  ct: int32[nb, C2, L, N] normalized;
    key_ntt: int32[P, T, M, N] (T = rank*L, M = C2*Lk).
    Returns (child0, child1), each int32[nb, C2, L, N]."""
    assert _USE_MXU, "fused split requires the MXU kernel family"
    n = ctx.n
    nb, C2, L, n_ = ct.shape
    P, T, M, n3 = key_ntt.shape
    rank = C2 - 1
    assert n_ == n and n3 == n and T == rank * L and M % C2 == 0
    Lk = M // C2
    TBT = tbt if tbt is not None else _TBT

    x = ct.reshape(nb, C2, L, _SL, _LN)
    Bp = -(-nb // TBT) * TBT
    if Bp != nb:
        pad = jnp.zeros((Bp - nb, C2, L, _SL, _LN), dtype=x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    k5 = key_ntt.reshape(P, T, M, _SL, _LN)
    aperm = _TilePerm(n, g, 0)
    rback = _TilePerm(n, 1, (2 * n - t_rot) % (2 * n))
    ptabs = [jnp.asarray(v) for v in aperm.inputs() + rback.inputs()]
    cdig, rdig, ew = _mxu_tables(ctx)

    ct_spec = pl.BlockSpec((TBT, C2, L, _SL, _LN),
                           lambda bb: (bb, 0, 0, 0, 0))
    const = lambda *shape: pl.BlockSpec(shape, lambda bb: (0,) * len(shape))
    in_specs = [
        ct_spec,
        const(P, T, M, _SL, _LN),
        *[const(*v.shape) for v in ptabs],
        const(P, 2, 3, _SL, _SL), const(P, 2, 3, _LN, _LN),
        const(P, 2, _SL, _LN),
    ]
    o0, o1 = pl.pallas_call(
        _split_kernel_factory(ctx.primes, rank, L, Lk, aperm, rback),
        grid=(Bp // TBT,),
        in_specs=in_specs,
        out_specs=[ct_spec, ct_spec],
        out_shape=[jax.ShapeDtypeStruct((Bp, C2, L, _SL, _LN), I32),
                   jax.ShapeDtypeStruct((Bp, C2, L, _SL, _LN), I32)],
        interpret=interpret or _INTERPRET,
    )(x, k5, *ptabs, cdig, rdig, ew)
    return (o0[:nb].reshape(nb, C2, L, n), o1[:nb].reshape(nb, C2, L, n))


def _split_tree_kernel_factory(primes, rank: int, L: int, Lk: int, S: int,
                               aperms, rbacks, base2k: int = 17):
    """The WHOLE s-level split tree (core/keyswitch.extract_slots) in
    one kernel: level si keyswitches its R = 2^si parent nodes held in
    VMEM scratch and writes 2R children back (state doubles per grid
    step -- the fused_pack_tree_pallas pattern in reverse).  Children
    keep the extract_slots concat layout: [child0s | child1s], so node
    index == slot-index low bits.  aperms/rbacks: per-level static
    _TilePerm descriptors (sigma_g and the X^-2^l back-rotation)."""
    P = len(primes)
    C2 = rank + 1
    T = rank * L
    M = C2 * Lk
    nperm = [len(a.inputs()) + len(r.inputs())
             for a, r in zip(aperms, rbacks)]

    def kernel(*refs):
        x_ref, k_ref = refs[:2]
        pref = refs[2 : 2 + sum(nperm)]
        cdig_ref, rdig_ref, ew_ref, o_ref, st_ref = refs[2 + sum(nperm) :]
        s = pl.program_id(1)

        off = 0
        for si in range(S):
            my_perm = pref[off : off + nperm[si]]
            off += nperm[si]

            @pl.when(s == si)
            def _(si=si, my_perm=my_perm):
                R = 1 << si
                X = x_ref[:, 0] if si == 0 else st_ref[:R]
                it = iter(my_perm)
                sv = aperms[si].apply(X, it)  # sigma_g(x), in-VMEM

                Xrows, brows = [], []
                for r in range(R):
                    Xrows.append(sv[r, :rank].reshape(T, _SL, _LN))
                    b = jnp.concatenate(
                        [X[r, :rank], (X[r, rank] + sv[r, rank])[None]],
                        axis=0)
                    brows.append(b.reshape(C2 * L, _SL, _LN))
                # child0 = normalize(x + KS(sigma_g x)) for every parent
                c0 = jnp.stack(_vmp_rows_blocked(
                    Xrows, brows, lambda p, t, m: k_ref[0, p, t, m],
                    (cdig_ref, rdig_ref, ew_ref), primes, T, M, C2, Lk,
                    L, base2k, sign=-1))  # [R, C2, L, SL, LN]
                # child1 = normalize(X^-t (2x - child0))
                d = rbacks[si].apply(2 * X - c0, it)
                acc1 = [[d[:, c2i, l] for l in range(L)]
                        for c2i in range(C2)]
                zero = jnp.zeros_like(d[:, 0, 0])
                c1 = jnp.stack(_carry_normalize(
                    acc1, lambda c2i, l: None, 1, zero, base2k),
                    axis=1).reshape(d.shape)

                if si == S - 1:
                    o_ref[0, :R] = c0
                    o_ref[0, R : 2 * R] = c1
                else:
                    for r in range(R):
                        st_ref[r] = c0[r]
                        st_ref[R + r] = c1[r]

    return kernel


# max leaf count of the one-launch split tree: the 2^S-node scratch
# must fit VMEM next to the step key + spectra blocks (64 nodes at the
# production shape = 6.3 MB scratch)
_SPLIT_TREE_MAX = 64
_USE_SPLIT_TREE = os.environ.get("FHERAM_SPLIT_TREE", "0") == "1"


def fused_split_tree_pallas(ctx: NTTPallasContext, ct, gal_els,
                            keys_stacked, interpret: bool = False):
    """All S split-tree levels of extract_slots in ONE kernel launch
    (vs one fused_split_pallas launch per level; reference counterpart:
    the per-slot extraction loop src/ram.rs:612-630).

    ct: int32[nb, C2, L, N] pre-scaled normalized roots; gal_els: the S
    per-level galois elements (level l pairs slots differing in bit l:
    g = N/2^l + 1, back-rotation X^-2^l); keys_stacked:
    int32[S, P, T, M, N] prepared automorphism keys in level order.
    Returns int32[nb, 2^S, C2, L, N] -- node j of batch column b is the
    extract_slots leaf for slot j, bit-exact vs the per-level path."""
    assert _USE_MXU, "fused split tree requires the MXU kernel family"
    n = ctx.n
    nb, C2, L, n_ = ct.shape
    S, P, T, M, n3 = keys_stacked.shape
    rank = C2 - 1
    assert n_ == n and n3 == n and T == rank * L and M % C2 == 0
    assert S == len(gal_els) and 1 <= S and (1 << S) <= _SPLIT_TREE_MAX
    Lk = M // C2

    x = ct.reshape(nb, 1, C2, L, _SL, _LN)
    k6 = keys_stacked.reshape(S, P, T, M, _SL, _LN)
    aperms, rbacks, ptabs = [], [], []
    for l in range(S):
        ap = _TilePerm(n, gal_els[l], 0)
        rb = _TilePerm(n, 1, (2 * n - (1 << l)) % (2 * n))
        aperms.append(ap)
        rbacks.append(rb)
        ptabs += [jnp.asarray(v) for v in ap.inputs() + rb.inputs()]
    cdig, rdig, ew = _mxu_tables(ctx)

    in_specs = [
        pl.BlockSpec((1, 1, C2, L, _SL, _LN), lambda b, s: (b, 0, 0, 0, 0, 0)),
        pl.BlockSpec((1, P, T, M, _SL, _LN),
                     lambda b, s: (s, 0, 0, 0, 0, 0)),
        *[pl.BlockSpec(v.shape, (lambda b, s, _nd=v.ndim: (0,) * _nd))
          for v in ptabs],
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda b, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _split_tree_kernel_factory(ctx.primes, rank, L, Lk, S, aperms,
                                   rbacks),
        grid=(nb, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1 << S, C2, L, _SL, _LN),
                               lambda b, s: (b, 0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 1 << S, C2, L, _SL, _LN), I32),
        scratch_shapes=[pltpu.VMEM((1 << max(S - 1, 0), C2, L, _SL, _LN),
                                   I32)],
        interpret=interpret or _INTERPRET,
    )(x, k6, *ptabs, cdig, rdig, ew)
    return out.reshape(nb, 1 << S, C2, L, n)


def _pack_tree_kernel_factory(primes, rank: int, L: int, Lk: int, M: int,
                              rperms, aperms, base2k: int = 17):
    """The WHOLE log-depth pack tree in one kernel: level s merges
    R_s = M >> (s+1) pairs held in VMEM scratch (level 0 reads the input
    block).  rperms/aperms: per-level static _TilePerm descriptors
    (identity matmuls skipped -- every pack rotation/galois map here is
    roll+sign only)."""
    P = len(primes)
    C2 = rank + 1
    T = rank * L
    Mk = C2 * Lk
    levels = M.bit_length() - 1
    nperm = [len(r.inputs()) + len(a.inputs())
             for r, a in zip(rperms, aperms)]

    def kernel(*refs):
        x_ref, k_ref = refs[:2]
        pref = refs[2 : 2 + sum(nperm)]
        cdig_ref, rdig_ref, ew_ref, o_ref, st_ref = refs[2 + sum(nperm) :]
        s = pl.program_id(1)

        off = 0
        for si in range(levels):
            my_perm = pref[off : off + nperm[si]]
            off += nperm[si]

            @pl.when(s == si)
            def _(si=si, my_perm=my_perm):
                R = M >> (si + 1)
                if si == 0:
                    A = x_ref[:R, 0]        # [R, C2, L, SL, LN]
                    Bc = x_ref[R:, 0]
                else:
                    A = st_ref[:R]
                    Bc = st_ref[R : 2 * R]
                it = iter(my_perm)
                xb = rperms[si].apply(Bc, it)
                u = A + xb
                v = A - xb
                sv = aperms[si].apply(v, it)

                Xrows, brows = [], []
                for r in range(R):
                    Xrows.append(sv[r, :rank].reshape(T, _SL, _LN))
                    b = jnp.concatenate(
                        [u[r, :rank], (u[r, rank] + sv[r, rank])[None]],
                        axis=0)
                    brows.append(b.reshape(C2 * L, _SL, _LN))
                res = _vmp_rows_blocked(
                    Xrows, brows, lambda p, t, m: k_ref[0, p, t, m],
                    (cdig_ref, rdig_ref, ew_ref), primes, T, Mk, C2, Lk,
                    L, base2k, sign=-1)
                for r in range(R):
                    st_ref[r] = res[r]

                if si == levels - 1:
                    o_ref[0] = res[0]

    return kernel


def fused_pack_tree_pallas(ctx: NTTPallasContext, cts, keys_stacked,
                           interpret: bool = False):
    """All log2(M) pack-tree merge levels in ONE kernel launch
    (core/packer.pack's per-level loop; reference GLWEPacker streaming
    insert, consumed at src/ram.rs:425-448).

    cts: int32[M, nb, C2, L, N] pre-scaled normalized leaves (M a power
    of two <= 32: the input block + pair state must fit the 16 MB
    scoped VMEM; M = 64 measured 16.15 MB); keys_stacked:
    int32[levels, P, T, Mk, N] per-level automorphism keys in MERGE
    order (level s uses galois N/2^(levels-1-s) + 1).  Returns
    int32[nb, C2, L, N], bit-exact vs the composed per-level path."""
    assert _USE_MXU, "fused pack tree requires the MXU kernel family"
    n = ctx.n
    M, nb, C2, L, n_ = cts.shape
    levels = M.bit_length() - 1
    S, P, T, Mk, n3 = keys_stacked.shape
    rank = C2 - 1
    assert n_ == n and n3 == n and M & (M - 1) == 0 and 2 <= M <= 32
    assert S == levels and T == rank * L and Mk % C2 == 0
    Lk = Mk // C2

    x = cts.reshape(M, nb, C2, L, _SL, _LN)
    k6 = keys_stacked.reshape(levels, P, T, Mk, _SL, _LN)
    rperms, aperms, ptabs = [], [], []
    for si in range(levels):
        l = levels - 1 - si
        rp = _TilePerm(n, 1, 1 << l)
        ap = _TilePerm(n, (n >> l) + 1, 0)
        rperms.append(rp)
        aperms.append(ap)
        ptabs += [jnp.asarray(v) for v in rp.inputs() + ap.inputs()]
    cdig, rdig, ew = _mxu_tables(ctx)

    in_specs = [
        pl.BlockSpec((M, 1, C2, L, _SL, _LN), lambda w, s: (0, w, 0, 0, 0, 0)),
        pl.BlockSpec((1, P, T, Mk, _SL, _LN),
                     lambda w, s: (s, 0, 0, 0, 0, 0)),
        *[pl.BlockSpec(v.shape, (lambda w, s, _nd=v.ndim: (0,) * _nd))
          for v in ptabs],
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda w, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda w, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda w, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _pack_tree_kernel_factory(ctx.primes, rank, L, Lk, M, rperms,
                                  aperms),
        grid=(nb, levels),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C2, L, _SL, _LN),
                               lambda w, s: (w, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, C2, L, _SL, _LN), I32),
        scratch_shapes=[pltpu.VMEM((max(M // 2, 1), C2, L, _SL, _LN), I32)],
        interpret=interpret or _INTERPRET,
    )(x, k6, *ptabs, cdig, rdig, ew)
    return out.reshape(nb, C2, L, n)


# --------------------------------------------------------------------------
# fused carry-DP CHAIN: the VM adder/comparator 2-state dynamic program
# (vm/arithmetic._dp_group; reference BDD circuits consumed at
# src/arithmetic.rs:84-102) in ONE kernel launch
# --------------------------------------------------------------------------
#
# The DP walks the word MSB->LSB; per bit it CMuxes the 2-state F on the
# b-operand bit (4 leaves per op) then on the a-operand bit.  As separate
# launches that is 2*bits sequential keyed external products, each paying
# dispatch glue (~1.3 ms/call measured, scripts/vm_phase_probe.py) on
# ~us of kernel work.  Here the whole chain rides one sequential grid
# (bits, n_src_groups + 1): the per-op state F[G, 2] and the inner
# results inner[G, 4] persist in VMEM scratch, each grid step streams
# exactly ONE bit-GGSW (the step's operand-source key), and the leaf
# combinations (F gathers +- the emitted-bit plaintext delta) are
# compile-time tables applied in-VMEM.  The slt/slti MSB complement
# (bias trick) is a second static table variant selected on d == 0.

_DPRB = int(os.environ.get("FHERAM_DPRB", "4"))  # VMP rows per sub-block


def _vmp_rows_blocked(Xrows, brows, key_fn, tabs, primes, T, M, C2, Lk, L,
                      base2k, sign: int = 1):
    """R independent external-product rows against one step's key:
    X (unnormalized digits, |limb| <= 1.5*2^17) -> fwd NTT -> VMP ->
    inv NTT -> CRT fold -> base + sign*conv, normalized.  Rows run in
    _DPRB sub-blocks to bound live spectra.  Shared by the DP-chain,
    bitwise, and pack-tree kernels (the blind-rotate kernel's variant
    differs: batched tiles, base = the chain state itself).

    tabs = (cdig_ref, rdig_ref, ew_ref); key_fn(p, t, m) -> key tile."""
    cdig_ref, rdig_ref, ew_ref = tabs
    P = len(primes)
    pp = [np.int32(q) for q in primes]
    ip = [np.float32(1.0 / q) for q in primes]

    def inv_fn(p, y):
        return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p], ew_ref[p],
                             pp[p], ip[p])

    R = len(Xrows)
    outs = []
    for r0 in range(0, R, _DPRB):
        xb = jnp.stack(Xrows[r0:r0 + _DPRB])  # [rb, T, SL, LN]
        bb = jnp.stack(brows[r0:r0 + _DPRB])  # [rb, C2*L, SL, LN]
        specs = [_fwd_tile_mxu(xb, cdig_ref[p], rdig_ref[p],
                               ew_ref[p], pp[p], ip[p])
                 for p in range(P)]
        rsb = _vmp_invntt(specs, key_fn, T, M, primes, inv_fn)
        acc = _garner_fold_acc(rsb, primes, C2, Lk, L, base2k)
        base_fn = lambda c2i, l: bb[:, c2i * L + l]
        zero = jnp.zeros_like(xb[:, 0])
        res = jnp.stack(_carry_normalize(acc, base_fn, sign, zero,
                                         base2k), axis=1)
        outs.extend(res[i].reshape(C2, L, _SL, _LN)
                    for i in range(res.shape[0]))
    return outs  # R tiles [C2, L, SL, LN]


def _dp_leaf_tables(emit: bool, subtab: bool, flip: bool, a: int, c: int,
                    flip_now: bool):
    """Static per-(op, a, c) leaf coefficients, mirroring
    vm/arithmetic._dp_group's in-python table: returns
    (co0, co1, ob0, ob1) = carry-out / emitted bit for b = 0, 1."""
    co = {}
    ob = {}
    for b in (0, 1):
        aa = 1 - a if (flip and flip_now) else a
        bb = 1 - b if (flip and flip_now) else b
        eff = (1 - bb) if subtab else bb
        co[b] = (aa + eff + c) >> 1
        if emit:
            ob[b] = (aa ^ eff ^ c) if subtab else (aa ^ bb ^ c)
        else:
            ob[b] = 0
    return co[0], co[1], ob[0], ob[1]


def _dp_chain_kernel_factory(primes, G: int, C2: int, L: int, Lk: int,
                             bits: int, groups, op_tables,
                             base2k: int = 17, in_digits: int | None = None):
    """groups: tuple of tuples of op indices (one per b-operand source);
    op_tables[gi] = (emit, subtab, flip) static circuit spec per op.
    in_digits: decompose only the top in_digits limbs of each VMP row
    (ephemeral-word gadget truncation, vm/arithmetic._vm_trunc); the
    base rows and the VMEM state stay full-precision."""
    P = len(primes)
    Td = in_digits if in_digits is not None else L
    T = C2 * Td         # external product consumes ALL ct components
    M = C2 * Lk
    NG = len(groups)

    def kernel(f0_ref, k_ref, d_ref, cdig_ref, rdig_ref, ew_ref, o_ref,
               F_ref, inner_ref):
        d = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when((d == 0) & (s == 0))
        def _():
            F_ref[...] = f0_ref[...]

        def vmp_rows(Xrows, brows):
            return _vmp_rows_blocked(
                Xrows, brows, lambda p, t, m: k_ref[0, 0, p, t, m],
                (cdig_ref, rdig_ref, ew_ref), primes, T, M, C2, Lk, L,
                base2k)

        # b-operand phases: leaves from F (+ delta), write inner[gi]
        for si in range(NG):
            @pl.when(s == si)
            def _(si=si):
                F = F_ref[...]              # [G, 2, C2, L, SL, LN]
                delta = d_ref[0]            # [C2, L, SL, LN]
                dfirst = d == 0
                Xrows, brows, sinks = [], [], []
                for gi in groups[si]:
                    emit, subtab, flip = op_tables[gi]
                    for rc, (a, c) in enumerate(
                            ((0, 0), (0, 1), (1, 0), (1, 1))):
                        variants = []
                        for fn in (False, True) if flip else (False,):
                            co0, co1, ob0, ob1 = _dp_leaf_tables(
                                emit, subtab, flip, a, c, fn)
                            x = F[gi, co1] - F[gi, co0]
                            if ob1 - ob0:
                                x = x + (ob1 - ob0) * delta
                            b_ = F[gi, co0]
                            if ob0:
                                b_ = b_ + ob0 * delta
                            variants.append((x, b_))
                        if flip:
                            x = jnp.where(dfirst, variants[1][0],
                                          variants[0][0])
                            b_ = jnp.where(dfirst, variants[1][1],
                                           variants[0][1])
                        else:
                            x, b_ = variants[0]
                        Xrows.append(x[:, :Td].reshape(T, _SL, _LN))
                        brows.append(b_.reshape(C2 * L, _SL, _LN))
                        sinks.append((gi, rc))
                for (gi, rc), res in zip(sinks, vmp_rows(Xrows, brows)):
                    inner_ref[gi, rc] = res

        # a-operand phase: rows from inner, write F (and the output at
        # the last bit)
        @pl.when(s == NG)
        def _():
            inner = inner_ref[...]          # [G, 4, C2, L, SL, LN]
            Xrows, brows = [], []
            for gi in range(G):
                for c in (0, 1):
                    hi = inner[gi, 2 + c]   # inner row order: (a, c)
                    lo = inner[gi, c]
                    Xrows.append((hi - lo)[:, :Td].reshape(T, _SL, _LN))
                    brows.append(lo.reshape(C2 * L, _SL, _LN))
            res = vmp_rows(Xrows, brows)
            for gi in range(G):
                for c in (0, 1):
                    F_ref[gi, c] = res[2 * gi + c]

            @pl.when(d == bits - 1)
            def _():
                o_ref[...] = F_ref[...]

    return kernel


def _bitwise_kernel_factory(primes, G: int, C2: int, L: int, Lk: int,
                            groups, base2k: int = 17,
                            in_digits: int | None = None):
    """Per-bit truth-table select (vm/arithmetic._bitwise_group): for
    every word bit j (independent chains, unlike the carry DP):
    phase si: inner[gi] = (CMux(b_j; l11, l10), CMux(b_j; l01, l00));
    final phase: out[gi] = CMux(a_j; inner_hi, inner_lo).  Leaves are
    constant trivial words; grid (W, NG+1) streams one key per step.
    in_digits: top-limb gadget truncation of the VMP rows (see
    _dp_chain_kernel_factory)."""
    P = len(primes)
    Td = in_digits if in_digits is not None else L
    T = C2 * Td
    M = C2 * Lk
    NG = len(groups)

    def kernel(hi_ref, lo_ref, k_ref, cdig_ref, rdig_ref, ew_ref, o_ref,
               inner_ref):
        s = pl.program_id(1)

        def vmp_rows(Xrows, brows):
            return _vmp_rows_blocked(
                Xrows, brows, lambda p, t, m: k_ref[0, 0, p, t, m],
                (cdig_ref, rdig_ref, ew_ref), primes, T, M, C2, Lk, L,
                base2k)

        for si in range(NG):
            @pl.when(s == si)
            def _(si=si):
                hi = hi_ref[...]  # [G, 2, C2, L, SL, LN] leaves (l11,l01)
                lo = lo_ref[...]  # [G, 2, C2, L, SL, LN] leaves (l10,l00)
                Xrows, brows, sinks = [], [], []
                for gi in groups[si]:
                    for rc in (0, 1):
                        Xrows.append(
                            (hi[gi, rc] - lo[gi, rc])[:, :Td].reshape(
                                T, _SL, _LN))
                        brows.append(lo[gi, rc].reshape(C2 * L, _SL, _LN))
                        sinks.append((gi, rc))
                for (gi, rc), res in zip(sinks, vmp_rows(Xrows, brows)):
                    inner_ref[gi, rc] = res

        @pl.when(s == NG)
        def _():
            inner = inner_ref[...]
            Xrows, brows = [], []
            for gi in range(G):
                Xrows.append((inner[gi, 0] - inner[gi, 1])[:, :Td].reshape(
                    T, _SL, _LN))
                brows.append(inner[gi, 1].reshape(C2 * L, _SL, _LN))
            res = vmp_rows(Xrows, brows)
            for gi in range(G):
                o_ref[0, gi] = res[gi]

    return kernel


def fused_bitwise_pallas(ctx: NTTPallasContext, leaves_hi, leaves_lo,
                         keys_stacked, groups, interpret: bool = False):
    """All W bits of the VM bitwise group in ONE kernel launch.

    leaves_hi/leaves_lo: int32[G, 2, C2, L, N] constant truth-table arm
    words ((l11, l01) / (l10, l00) per op); keys_stacked:
    int32[W, NG+1, P, T, M, N] per-bit prepared GGSWs (one per b-operand
    source group, then the a key); groups: per-source op index tuples.
    Returns int32[W, G, C2, L, N]: bit j's selected slot word per op,
    bit-exact vs the composed two-level keyed-CMux path."""
    assert _USE_MXU, "fused bitwise requires the MXU kernel family"
    n = ctx.n
    G, two, C2, L, n_ = leaves_hi.shape
    W, NGp1, P, T, M, n3 = keys_stacked.shape
    assert two == 2 and n_ == n and n3 == n
    assert T % C2 == 0 and M % C2 == 0 and NGp1 == len(groups) + 1
    Td = T // C2  # < L under ephemeral-word gadget truncation
    assert Td <= L
    assert sorted(gi for g in groups for gi in g) == list(range(G))
    Lk = M // C2

    hi = leaves_hi.reshape(G, 2, C2, L, _SL, _LN)
    lo = leaves_lo.reshape(G, 2, C2, L, _SL, _LN)
    k7 = keys_stacked.reshape(W, NGp1, P, T, M, _SL, _LN)
    cdig, rdig, ew = _mxu_tables(ctx)

    lf_spec = pl.BlockSpec((G, 2, C2, L, _SL, _LN),
                           lambda j, s: (0, 0, 0, 0, 0, 0))
    in_specs = [
        lf_spec, lf_spec,
        pl.BlockSpec((1, 1, P, T, M, _SL, _LN),
                     lambda j, s: (j, s, 0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda j, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda j, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda j, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _bitwise_kernel_factory(ctx.primes, G, C2, L, Lk, groups,
                                in_digits=Td),
        grid=(W, NGp1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, C2, L, _SL, _LN),
                               lambda j, s: (j, 0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((W, G, C2, L, _SL, _LN), I32),
        scratch_shapes=[pltpu.VMEM((G, 2, C2, L, _SL, _LN), I32)],
        interpret=interpret or _INTERPRET,
    )(hi, lo, k7, cdig, rdig, ew)
    return out.reshape(W, G, C2, L, n)


def _brot_kernel_factory(primes, C2: int, Lc: int, Lk: int, S: int,
                         base2k: int = 17, in_digits: int | None = None):
    """Blind-rotation CMux chain: per step s,
    rows <- normalize(rows + conv(X^t_s rows - rows, GGSW_s)), the
    rotation applied in-VMEM via the signed permutation tables.
    in_digits: top-limb gadget truncation of the VMP rows (see
    _dp_chain_kernel_factory)."""
    P = len(primes)
    Td = in_digits if in_digits is not None else Lc
    T = C2 * Td
    M = C2 * Lk

    def kernel(x_ref, k_ref, pl_ref, ps_ref, wm_ref, sg_ref,
               cdig_ref, rdig_ref, ew_ref, o_ref, ct_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ct_ref[...] = x_ref[...]

        ct = ct_ref[...]  # [tbt, C2, Lc, SL, LN] normalized limbs
        pp = [np.int32(q) for q in primes]
        ip = [np.float32(1.0 / q) for q in primes]

        rot = _perm_apply(ct, pl_ref[0], ps_ref[0], wm_ref[0], sg_ref[0])
        digs = (rot - ct)[:, :, :Td].reshape(ct.shape[0], T, _SL, _LN)
        specs = [_fwd_tile_mxu(digs, cdig_ref[p], rdig_ref[p], ew_ref[p],
                               pp[p], ip[p]) for p in range(P)]

        def inv_fn(p, y):
            return _inv_tile_mxu(y, cdig_ref[p], rdig_ref[p], ew_ref[p],
                                 pp[p], ip[p])

        rsb = _vmp_invntt(specs, lambda p, t, m: k_ref[0, p, t, m],
                          T, M, primes, inv_fn)
        acc = _garner_fold_acc(rsb, primes, C2, Lk, Lc, base2k)
        base_fn = lambda c2i, l: ct[:, c2i, l]
        zero = jnp.zeros_like(ct[:, 0, 0])
        outs = _carry_normalize(acc, base_fn, 1, zero, base2k)
        res = jnp.stack(outs, axis=1).reshape(ct.shape)
        ct_ref[...] = res

        @pl.when(s == S - 1)
        def _():
            o_ref[...] = res

    return kernel


def fused_blind_rotate_pallas(ctx: NTTPallasContext, rows, keys_stacked,
                              amounts, tbt: int | None = None,
                              interpret: bool = False):
    """A whole GLWE blind-rotation CMux chain in ONE kernel launch
    (vm/arithmetic.glwe_blind_rotation, vm/conversion's
    scalar_to_ggsw_blind_rotation; reference GLWEBlindRotation consumed
    at src/arithmetic.rs:228, src/store.rs:62-64, src/conversion.rs:51).

    rows: int32[B, C2, Lc, N] normalized chain state; keys_stacked:
    int32[S, P, T, M, N] prepared bit GGSWs (T = C2*Lc, M = C2*Lk);
    amounts: S static rotation exponents (step s CMuxes rows against
    X^amounts[s] * rows).  Returns int32[B, C2, Lc, N], bit-exact vs the
    composed per-step CMux path."""
    assert _USE_MXU, "fused blind rotation requires the MXU kernel family"
    n = ctx.n
    B, C2, Lc, n_ = rows.shape
    S, P, T, M, n3 = keys_stacked.shape
    assert n_ == n and n3 == n and T % C2 == 0 and M % C2 == 0
    Td = T // C2  # < Lc under ephemeral-word gadget truncation
    assert Td <= Lc
    assert len(amounts) == S and S >= 1
    Lk = M // C2
    TBT = min(tbt if tbt is not None else _TBT, B)

    x = rows.reshape(B, C2, Lc, _SL, _LN)
    Bp = -(-B // TBT) * TBT
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, C2, Lc, _SL, _LN), dtype=x.dtype)], axis=0)
    k6 = keys_stacked.reshape(S, P, T, M, _SL, _LN)
    ptabs = list(_stack_perm_tables(n, [(1, t % (2 * n)) for t in amounts]))
    cdig, rdig, ew = _mxu_tables(ctx)

    in_specs = [
        pl.BlockSpec((TBT, C2, Lc, _SL, _LN), lambda b, s: (b, 0, 0, 0, 0)),
        pl.BlockSpec((1, P, T, M, _SL, _LN), lambda b, s: (s, 0, 0, 0, 0, 0)),
        pl.BlockSpec((1, _LN, _LN), lambda b, s: (s, 0, 0)),
        pl.BlockSpec((1, _SL, _SL), lambda b, s: (s, 0, 0)),
        pl.BlockSpec((1, 5, 1, _LN), lambda b, s: (s, 0, 0, 0)),
        pl.BlockSpec((1, _SL, _LN), lambda b, s: (s, 0, 0)),
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda b, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda b, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _brot_kernel_factory(ctx.primes, C2, Lc, Lk, S, in_digits=Td),
        grid=(Bp // TBT, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TBT, C2, Lc, _SL, _LN),
                               lambda b, s: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, C2, Lc, _SL, _LN), I32),
        scratch_shapes=[pltpu.VMEM((TBT, C2, Lc, _SL, _LN), I32)],
        interpret=interpret or _INTERPRET,
    )(x, k6, *ptabs, cdig, rdig, ew)
    return out[:B].reshape(B, C2, Lc, n)


def fused_dp_chain_pallas(ctx: NTTPallasContext, F0, keys_stacked, deltas,
                          op_tables, groups, interpret: bool = False):
    """The whole VM carry-DP chain in ONE kernel launch.

    F0: int32[G, 2, C2, L, N] initial per-op 2-state (normalized);
    keys_stacked: int32[bits, NG+1, P, T, M, N] prepared bit GGSWs in
      STEP order (MSB first): per step, one key per b-operand source
      group then the a-operand key (T = C2*L, M = C2*Lk);
    deltas: int32[bits, C2, L, N] per-step emitted-bit plaintext words;
    op_tables[gi] = (emit, subtab, flip); groups = per-source op index
    tuples.  Returns int32[G, 2, C2, L, N] == the composed
    vm/arithmetic._dp_group loop, bit-exactly."""
    assert _USE_MXU, "fused DP chain requires the MXU kernel family"
    n = ctx.n
    G, two, C2, L, n_ = F0.shape
    bits, NGp1, P, T, M, n3 = keys_stacked.shape
    assert two == 2 and n_ == n and n3 == n
    assert T % C2 == 0 and M % C2 == 0
    Td = T // C2  # < L under ephemeral-word gadget truncation
    assert Td <= L
    assert NGp1 == len(groups) + 1
    assert sorted(gi for g in groups for gi in g) == list(range(G))
    Lk = M // C2

    f0 = F0.reshape(G, 2, C2, L, _SL, _LN)
    k7 = keys_stacked.reshape(bits, NGp1, P, T, M, _SL, _LN)
    dd = deltas.reshape(bits, C2, L, _SL, _LN)
    cdig, rdig, ew = _mxu_tables(ctx)

    st_spec = pl.BlockSpec((G, 2, C2, L, _SL, _LN),
                           lambda d, s: (0, 0, 0, 0, 0, 0))
    in_specs = [
        st_spec,
        pl.BlockSpec((1, 1, P, T, M, _SL, _LN),
                     lambda d, s: (d, s, 0, 0, 0, 0, 0)),
        pl.BlockSpec((1, C2, L, _SL, _LN), lambda d, s: (d, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _SL, _SL), lambda d, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, 3, _LN, _LN), lambda d, s: (0, 0, 0, 0, 0)),
        pl.BlockSpec((P, 2, _SL, _LN), lambda d, s: (0, 0, 0, 0)),
    ]
    out = pl.pallas_call(
        _dp_chain_kernel_factory(ctx.primes, G, C2, L, Lk, bits, groups,
                                 op_tables, in_digits=Td),
        grid=(bits, NGp1),
        in_specs=in_specs,
        out_specs=st_spec,
        out_shape=jax.ShapeDtypeStruct((G, 2, C2, L, _SL, _LN), I32),
        scratch_shapes=[
            pltpu.VMEM((G, 2, C2, L, _SL, _LN), I32),
            pltpu.VMEM((G, 4, C2, L, _SL, _LN), I32),
        ],
        interpret=interpret or _INTERPRET,
    )(f0, k7, dd, cdig, rdig, ew)
    return out.reshape(G, 2, C2, L, n)
