"""Four-step negacyclic NTT: the MXU formulation.

N = R1 * R2 (64 x 64 for N=4096).  After the psi-twist, the cyclic DFT
factors into
    Z[k1, j]  = sum_i y[i, j] * w64^(i k1)        (matmul over axis -2)
    Z'[k1, j] = Z[k1, j] * omega^(j k1)           (elementwise twiddle)
    F[k1, k2] = sum_j Z'[k1, j] * w64^(j k2)      (matmul over axis -1)
with w64 = omega^R1 a primitive R2-th root.  Output order (k1, k2) is a
fixed permutation of the spectrum -- irrelevant, since data and prepared
keys share the same transform and only pointwise products are taken.

Exact modular matmuls on the MXU: both operands are split into three
signed 7-bit digits, the 9 digit-pair products are f32 matmuls (every
product <= 2^12, 64-term sums <= 2^18 < 2^24: exact in f32), and the
partial sums are recombined modularly on the VPU.  This moves the
O(N log N) butterfly work onto the MXU as O(N * 64) matmul work with ~6
materializations per transform instead of 13, and no tiny-trailing-dim
reshapes (the butterfly implementation's TPU layout hazard).

Cross-validated against ops/ntt.py and the C++ golden model:
conv results are identical integers (tests/test_ntt4.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .modular import mul_mod, reduce_once
from .ntt import _primitive_root, _center

I32 = jnp.int32
F32 = jnp.float32

_D = 7          # digit width for matmul splitting
_ND = 3         # number of digits (covers |x| <= 2^21)


class NTT4Context:
    def __init__(self, n: int, primes: tuple[int, ...]):
        self.n = n
        self.primes = tuple(primes)
        log_n = n.bit_length() - 1
        r1_log = log_n // 2
        self.r1 = 1 << r1_log          # rows (i / k1)
        self.r2 = n // self.r1         # cols (j / k2)
        P = len(primes)
        r1, r2 = self.r1, self.r2
        assert r1 * r2 == n and max(r1, r2) <= 128

        twist = np.zeros((P, n), dtype=np.int64)
        inv_twist = np.zeros((P, n), dtype=np.int64)
        W1 = np.zeros((P, r1, r1), dtype=np.int64)       # [i, k1]
        W1i = np.zeros((P, r1, r1), dtype=np.int64)      # [k1, i]
        W2 = np.zeros((P, r2, r2), dtype=np.int64)       # [j, k2]
        W2i = np.zeros((P, r2, r2), dtype=np.int64)      # [k2, j]
        TW = np.zeros((P, r1, r2), dtype=np.int64)       # [k1, j]
        TWi = np.zeros((P, r1, r2), dtype=np.int64)

        for pi, p in enumerate(primes):
            g = _primitive_root(p)
            psi = pow(g, (p - 1) // (2 * n), p)
            assert pow(psi, n, p) == p - 1
            om = psi * psi % p
            iom = pow(om, p - 2, p)
            ipsi = pow(psi, p - 2, p)
            inv_n = pow(n, p - 2, p)
            w_r2 = pow(om, r1, p)       # primitive r2-th root
            iw_r2 = pow(iom, r1, p)
            # r1-point DFT uses w64^(i*k1) too when r1 == r2; in general
            # the row transform needs a primitive r1-th root om^(r2)
            w_r1 = pow(om, r2, p)
            iw_r1 = pow(iom, r2, p)

            idx = np.arange(n)
            twist[pi] = _center(
                np.array([pow(psi, int(k), p) for k in idx]), p)
            inv_twist[pi] = _center(
                np.array([pow(ipsi, int(k), p) * inv_n % p for k in idx]), p)
            for a in range(r1):
                for b in range(r1):
                    W1[pi, a, b] = pow(w_r1, a * b, p)
                    W1i[pi, a, b] = pow(iw_r1, a * b, p)
            for a in range(r2):
                for b in range(r2):
                    W2[pi, a, b] = pow(w_r2, a * b, p)
                    W2i[pi, a, b] = pow(iw_r2, a * b, p)
            for a in range(r1):
                for b in range(r2):
                    TW[pi, a, b] = pow(om, a * b, p)
                    TWi[pi, a, b] = pow(iom, a * b, p)

        self.twist = jnp.asarray(np.stack([_center(twist[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.inv_twist = jnp.asarray(np.stack([_center(inv_twist[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.W1 = jnp.asarray(np.stack([_center(W1[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.W1i = jnp.asarray(np.stack([_center(W1i[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.W2 = jnp.asarray(np.stack([_center(W2[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.W2i = jnp.asarray(np.stack([_center(W2i[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.TW = jnp.asarray(np.stack([_center(TW[pi], primes[pi]) for pi in range(P)]).astype(np.int32))
        self.TWi = jnp.asarray(np.stack([_center(TWi[pi], primes[pi]) for pi in range(P)]).astype(np.int32))

        # pre-split twiddle matrices into 7-bit digit stacks (f32)
        self.W1_d = _split_w(self.W1)
        self.W1i_d = _split_w(self.W1i)
        self.W2_d = _split_w(self.W2)
        self.W2i_d = _split_w(self.W2i)

    def consts(self, ndim: int):
        from .modular import prime_consts

        return prime_consts(self.primes, ndim)


def _split_w(w):
    """Centered int32 [P, k, r] -> list of 3 balanced 7-bit digit planes
    as f32 [P, k, r]."""
    out = []
    x = w
    for _ in range(_ND):
        d = ((x + (1 << (_D - 1))) & ((1 << _D) - 1)) - (1 << (_D - 1))
        out.append(d.astype(F32))
        x = (x - d) >> _D
    return out


def _split_a(a):
    out = []
    x = a
    for _ in range(_ND):
        d = ((x + (1 << (_D - 1))) & ((1 << _D) - 1)) - (1 << (_D - 1))
        out.append(d.astype(F32))
        x = (x - d) >> _D
    return out


@lru_cache(maxsize=8)
def get_ntt4_context(n: int, primes: tuple[int, ...]) -> NTT4Context:
    return NTT4Context(n, primes)


def _matmul_mod(primes, x, w_digits, p, ip):
    """Exact modular matmul via 3x3 f32 digit products on the MXU.

    x: int32[P, B, m, k] balanced (|x| <= 2^20, so 3 signed 7-bit digits
    cover it; all call sites feed <= 0.501p <= 2^18.6); w_digits:
    3 x f32[P, k, r].  Returns int32[P, B, m, r] balanced."""
    xd = _split_a(x)
    P = x.shape[0]
    acc = None
    for u in range(_ND):
        for v in range(_ND):
            prod = jax.lax.dot_general(
                xd[u], w_digits[v],
                dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=F32,
            )  # [P, B, m, r]
            c = prod.astype(I32)
            s = _D * (u + v)
            t = mul_mod(c, _shift_const(primes, s, p.ndim), p, ip)
            acc = t if acc is None else acc + t
    return reduce_once(acc, p, ip)


def _shift_const(primes, s: int, ndim: int):
    """Centered 2^s mod p, [P, 1, ...] broadcastable (from python ints --
    jnp constants become tracers inside jit and cannot be read back)."""
    vals = []
    for q in primes:
        v = pow(2, s, q)
        if v > q // 2:
            v -= q
        vals.append(v)
    a = np.asarray(vals, dtype=np.int32).reshape((len(primes),) + (1,) * (ndim - 1))
    return jnp.asarray(a)


def ntt4_fwd(ctx: NTT4Context, x):
    """x: int32[..., N] (|x| <= 2^21) -> int32[P, ..., N] balanced."""
    n = ctx.n
    r1, r2 = ctx.r1, ctx.r2
    lead = x.shape[:-1]
    P = len(ctx.primes)
    x = x.reshape((1, -1, n))
    x = jnp.broadcast_to(x, (P, x.shape[1], n))
    p, ip = ctx.consts(3)
    y = mul_mod(x, ctx.twist[:, None, :], p, ip)
    y = jax.lax.optimization_barrier(y)
    y = y.reshape(P, -1, r1, r2)
    p4, ip4 = ctx.consts(4)
    # Z[k1, j] = sum_i y[i, j] W1[i, k1]: contract axis -2 -> transpose
    yt = jnp.swapaxes(y, -1, -2)  # [P, B, j, i]
    z = _matmul_mod(ctx.primes, yt, ctx.W1_d, p4, ip4)  # [P, B, j, k1]
    z = jnp.swapaxes(z, -1, -2)  # [P, B, k1, j]
    z = mul_mod(z, ctx.TW[:, None, :, :], p4, ip4)
    z = jax.lax.optimization_barrier(z)
    f = _matmul_mod(ctx.primes, z, ctx.W2_d, p4, ip4)  # [P, B, k1, k2]
    return f.reshape((P,) + lead + (n,))


def ntt4_inv(ctx: NTT4Context, x):
    """Inverse of ntt4_fwd (including order): int32[P, ..., N] -> conv
    coefficient residues, balanced."""
    n = ctx.n
    r1, r2 = ctx.r1, ctx.r2
    P = len(ctx.primes)
    lead = x.shape[1:-1]
    x = x.reshape(P, -1, r1, r2)
    p4, ip4 = ctx.consts(4)
    u = _matmul_mod(ctx.primes, x, ctx.W2i_d, p4, ip4)  # [P, B, k1, j]
    u = mul_mod(u, ctx.TWi[:, None, :, :], p4, ip4)
    u = jax.lax.optimization_barrier(u)
    ut = jnp.swapaxes(u, -1, -2)  # [P, B, j, k1]
    y = _matmul_mod(ctx.primes, ut, ctx.W1i_d, p4, ip4)  # [P, B, j, i]
    y = jnp.swapaxes(y, -1, -2).reshape(P, -1, n)
    p, ip = ctx.consts(3)
    out = mul_mod(y, ctx.inv_twist[:, None, :], p, ip)
    return out.reshape((P,) + lead + (n,))
