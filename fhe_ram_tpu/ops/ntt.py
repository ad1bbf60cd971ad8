"""Negacyclic NTT over CRT primes, batched, int32-exact.

Forward: DIF (natural order in, bit-reversed out); inverse: DIT
(bit-reversed in, natural out) -- no explicit bit-reversal permutation is
ever materialized because pointwise products are order-agnostic as long as
data and prepared keys share the same forward transform.

Negacyclic wrap (X^N = -1) is handled by twisting with powers of a 2N-th
root of unity psi (folded into the first/last multiply).

Layout: NTT-domain tensors carry the prime axis FIRST: int32[P, ..., N].
All butterflies are full-width vector ops over the trailing axis -- XLA
maps them onto the TPU VPU; the whole transform is ~log2(N) fused
elementwise stages.  (A Pallas fused-VMEM variant can replace this
without changing callers; see ops/ntt_pallas.py once added.)

This is the TPU-native replacement for the reference's FFT64 forward /
inverse DFT (spqlios; consumed via poulpy "prepare"/VMP, SURVEY.md §2.2).
Unlike FFT64, the integer NTT is exact: no rounding noise.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .modular import mul_mod, reduce_once

I32 = jnp.int32

# NTT backend: "butterfly" (vector stages) or "fourstep" (MXU matmuls).
# Must be set process-wide BEFORE any keys/data are transformed (the two
# backends use different spectrum orders).  Env FHERAM_NTT or set_backend().
import os as _os

_BACKEND = _os.environ.get("FHERAM_NTT", "butterfly")


def set_backend(name: str):
    """Select the NTT implementation. Call before any jit tracing/keygen."""
    global _BACKEND
    assert name in ("butterfly", "fourstep", "pallas")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _primitive_root(p: int) -> int:
    """Smallest primitive root mod prime p (offline, numpy/python ints)."""
    fac = []
    m = p - 1
    d = 2
    while d * d <= m:
        if m % d == 0:
            fac.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        fac.append(m)
    for g in range(2, p):
        if all(pow(g, (p - 1) // q, p) != 1 for q in fac):
            return g
    raise ValueError(f"no primitive root for {p}")


def _center(a: np.ndarray, p: int) -> np.ndarray:
    a = np.mod(a, p)
    return np.where(a > p // 2, a - p, a).astype(np.int64)


class NTTContext:
    """Precomputed twiddle tables for degree n over a fixed prime set.

    All tables are centered int32 (|w| <= p/2) so they satisfy the
    `mul_mod` b-operand contract."""

    def __init__(self, n: int, primes: tuple[int, ...]):
        self.n = n
        self.log_n = n.bit_length() - 1
        assert 1 << self.log_n == n
        self.primes = tuple(primes)
        P = len(primes)

        psi_tab = np.zeros((P, n), dtype=np.int64)
        inv_psi_tab = np.zeros((P, n), dtype=np.int64)
        fwd_tw = [np.zeros((P, h), dtype=np.int64) for h in self._fwd_halves()]
        inv_tw = [np.zeros((P, h), dtype=np.int64) for h in self._inv_halves()]

        for pi, p in enumerate(primes):
            g = _primitive_root(p)
            psi = pow(g, (p - 1) // (2 * n), p)
            assert pow(psi, n, p) == p - 1, "psi must be a 2N-th root with psi^N=-1"
            omega = psi * psi % p
            inv_psi = pow(psi, p - 2, p)
            inv_omega = pow(omega, p - 2, p)
            inv_n = pow(n, p - 2, p)

            i = np.arange(n)
            psi_tab[pi] = _center(np.array([pow(psi, int(k), p) for k in i]), p)
            # inverse twist folded with 1/N
            inv_psi_tab[pi] = _center(
                np.array([pow(inv_psi, int(k), p) * inv_n % p for k in i]), p
            )
            for si, h in enumerate(self._fwd_halves()):
                step = n // (2 * h)
                fwd_tw[si][pi] = _center(
                    np.array([pow(omega, int(j) * step, p) for j in range(h)]), p
                )
            for si, h in enumerate(self._inv_halves()):
                step = n // (2 * h)
                inv_tw[si][pi] = _center(
                    np.array([pow(inv_omega, int(j) * step, p) for j in range(h)]), p
                )

        self.psi = jnp.asarray(psi_tab.astype(np.int32))
        self.inv_psi = jnp.asarray(inv_psi_tab.astype(np.int32))
        self.fwd_tw = [jnp.asarray(t.astype(np.int32)) for t in fwd_tw]
        self.inv_tw = [jnp.asarray(t.astype(np.int32)) for t in inv_tw]
        self.p_np = np.asarray(primes, dtype=np.int64)

    def _fwd_halves(self):
        return [self.n >> (s + 1) for s in range(self.log_n)]

    def _inv_halves(self):
        return [1 << s for s in range(self.log_n)]

    def consts(self, ndim: int):
        from .modular import prime_consts

        return prime_consts(self.primes, ndim)


@lru_cache(maxsize=8)
def get_ntt_context(n: int, primes: tuple[int, ...]) -> NTTContext:
    return NTTContext(n, primes)


@lru_cache(maxsize=4)
def _pallas_fwd_jit(n: int, primes: tuple[int, ...]):
    # jit wrapper: eager pallas_call dispatch mis-lowers on the axon
    # platform (falls back to the CPU rule); under jit it targets TPU
    import jax as _jax

    from .ntt_pallas import get_pallas_context, ntt_fwd_pallas

    ctx = get_pallas_context(n, primes)
    return _jax.jit(lambda x: ntt_fwd_pallas(ctx, x))


@lru_cache(maxsize=4)
def _pallas_inv_jit(n: int, primes: tuple[int, ...]):
    import jax as _jax

    from .ntt_pallas import get_pallas_context, ntt_inv_pallas

    ctx = get_pallas_context(n, primes)
    return _jax.jit(lambda x: ntt_inv_pallas(ctx, x))


def ntt_fwd(ctx: NTTContext, x):
    """Forward negacyclic NTT.

    x: int32[..., N] coefficients, |x| <= 2^21 (normalized limbs qualify).
    Returns int32[P, ..., N] balanced residues (|.| <= 0.501p); spectrum
    order is backend-defined (pointwise-compatible within one backend).
    """
    if _BACKEND == "fourstep":
        from .ntt4 import get_ntt4_context, ntt4_fwd

        return ntt4_fwd(get_ntt4_context(ctx.n, ctx.primes), x)
    if _BACKEND == "pallas" and ctx.n == 4096:
        return _pallas_fwd_jit(ctx.n, ctx.primes)(x)
    n = ctx.n
    lead = x.shape[:-1]
    x = x.reshape((1, -1, n))
    P = len(ctx.primes)
    x = jnp.broadcast_to(x, (P, x.shape[1], n))
    p, inv_p = ctx.consts(3)

    # twist (also lifts into balanced residues)
    x = mul_mod(x, ctx.psi[:, None, :], p, inv_p)

    for si, h in enumerate(ctx._fwd_halves()):
        nb = n // (2 * h)
        x = x.reshape(P, -1, nb, 2, h)
        u = x[..., 0, :]
        v = x[..., 1, :]
        p5, ip5 = ctx.consts(4)
        s = reduce_once(u + v, p5, ip5)
        d = mul_mod(u - v, ctx.fwd_tw[si][:, None, None, :], p5, ip5)
        x = jnp.stack([s, d], axis=-2).reshape(P, -1, n)
        # materialize each stage: without the barrier XLA re-fuses stage
        # producers into every consumer (the butterfly reads each element
        # twice), recomputing whole chains -- measured 10x slower at
        # 2^18-read shapes.
        x = jax.lax.optimization_barrier(x)

    return x.reshape((P,) + lead + (n,))


def ntt_inv(ctx: NTTContext, x):
    """Inverse negacyclic NTT.

    x: int32[P, ..., N] balanced-lazy residues, |x| <= 2.6p.
    Returns int32[P, ..., N]: the convolution result coefficients
    *mod each prime*, balanced (|.| <= 0.501p).  Use ops.crt to
    reconstruct exact integers.
    """
    if _BACKEND == "fourstep":
        from .ntt4 import get_ntt4_context, ntt4_inv

        return ntt4_inv(get_ntt4_context(ctx.n, ctx.primes), x)
    if _BACKEND == "pallas" and ctx.n == 4096:
        return _pallas_inv_jit(ctx.n, ctx.primes)(x)
    n = ctx.n
    P = len(ctx.primes)
    lead = x.shape[1:-1]
    x = x.reshape(P, -1, n)

    for si, h in enumerate(ctx._inv_halves()):
        nb = n // (2 * h)
        x = x.reshape(P, -1, nb, 2, h)
        u = x[..., 0, :]
        v = x[..., 1, :]
        p5, ip5 = ctx.consts(4)
        t = mul_mod(v, ctx.inv_tw[si][:, None, None, :], p5, ip5)
        s = reduce_once(u + t, p5, ip5)
        d = reduce_once(u - t, p5, ip5)
        x = jnp.stack([s, d], axis=-2).reshape(P, -1, n)
        x = jax.lax.optimization_barrier(x)  # see ntt_fwd

    p, inv_p = ctx.consts(3)
    x = mul_mod(x, ctx.inv_psi[:, None, :], p, inv_p)
    return x.reshape((P,) + lead + (n,))
