"""Exact modular arithmetic over NTT primes using int32 + float32 only.

TPU-native design: TPU has no native int64 or float64, so every product
must fit in int32 (|x| < 2^31) and quotients are estimated with float32.
This module implements a balanced ("centered") lazy representation:

  * residues are kept in the range |x| <= 0.501 * p  ("reduced"),
  * additions may temporarily grow values (callers keep |a| <= 2.6 * p
    before feeding a multiply),
  * `mul_mod(a, b)` requires |a| <= 2.6*p (lazy accumulator side) and
    |b| <= 1.01*p (twiddle / prepared-key side), and returns |r| <= 0.501*p.

With primes <= 2^19.6 (params.DEFAULT_PRIMES) every intermediate product
is bounded by ~2^30.9 < 2^31, and the float32 Barrett quotient
q = rint(f32(t) * (1/p)) is within +-1 of round(t/p) (absolute error
< 2^-10), so r = t - q*p is exact in int32 and |r| <= 0.501*p.
These bounds are verified exhaustively against Python bignums in
tests/test_modular.py.

This layer is the TPU replacement for the spqlios-arithmetic C kernels the
reference consumes (SURVEY.md L0; the reference uses FFT64 doubles, we use
exact CRT-NTT integers so results are reproducible bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Split shift for the two-step Barrett multiply: a = a1*2^S + a0.
_S = 10
_HALF = 1 << (_S - 1)

I32 = jnp.int32
F32 = jnp.float32


def prime_consts(primes, ndim: int):
    """Return (p, inv_p) reshaped to [P, 1, 1, ...] for broadcasting against
    tensors whose leading axis is the prime axis and total rank `ndim`."""
    shape = (len(primes),) + (1,) * (ndim - 1)
    p = jnp.asarray(np.asarray(primes, dtype=np.int32).reshape(shape))
    inv_p = jnp.asarray(np.asarray([1.0 / q for q in primes], dtype=np.float32).reshape(shape))
    return p, inv_p


def reduce_once(x, p, inv_p):
    """Balanced Barrett reduction: r == x (mod p), |r| <= 0.501*p.

    Requires |x| <= ~2^30 (so f32(x) has absolute error < 2^7 and the
    quotient estimate is within +-1 of round(x/p))."""
    q = jnp.rint(x.astype(F32) * inv_p).astype(I32)
    return x - q * p


def mul_mod(a, b, p, inv_p):
    """Exact a*b mod p (balanced). |a| <= 2.6*p, |b| <= 1.01*p.

    Two-step split multiply: a = a1*2^S + a0 keeps every int32 product
    below 2^31 for primes up to ~2^19.6."""
    a1 = (a + _HALF) >> _S
    a0 = a - (a1 << _S)
    t1 = a1 * b
    q1 = jnp.rint(t1.astype(F32) * inv_p).astype(I32)
    r1 = t1 - q1 * p
    t = (r1 << _S) + a0 * b
    q2 = jnp.rint(t.astype(F32) * inv_p).astype(I32)
    return t - q2 * p


def lift_mod(x, p, inv_p):
    """Lift small signed integers (|x| <= 2^21) into balanced residues."""
    return reduce_once(x, p, inv_p)


def to_canonical(x, p):
    """Map balanced-lazy residues (|x| <= 0.501p) to centered canonical
    representatives in [-(p-1)//2, p//2]."""
    half = p // 2
    x = jnp.where(x > half, x - p, x)
    x = jnp.where(x < -half, x + p, x)
    return x
