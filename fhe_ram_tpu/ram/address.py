"""Encrypted addresses: hierarchies of GGSW(X^-a_digit).

An address a < max_addr is split by the Base2D geometry into n2
coordinates (one per ring-degree-sized chunk of address bits); each
coordinate is further split into small digits, one GGSW per digit, so
that every GGSW encrypts a monomial with a tiny exponent
(reference: src/address.rs, src/coordinate.rs).

Layouts:
  Coordinate (coeff domain):  int32[dig, D, C, C2, Lg, N]
  Coordinate (prepared/NTT):  int32[P, dig, D, C, C2, Lg, N]
Digit counts differ per coordinate, so an Address holds a tuple.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params, Base2D
from ..ops.ntt import NTTContext
from ..core import ggsw, rng

I32 = jnp.int32


@dataclass
class Address:
    """Client-encrypted address (coefficient domain)."""

    coordinates: tuple  # tuple of int32[dig_i, D, C, C2, Lg, N]


@dataclass
class AddressPrepared:
    """NTT-domain address (server side)."""

    coordinates: tuple  # tuple of int32[P, dig_i, D, C, C2, Lg, N]


jax.tree_util.register_dataclass(Address, data_fields=["coordinates"], meta_fields=[])
jax.tree_util.register_dataclass(
    AddressPrepared, data_fields=["coordinates"], meta_fields=[]
)


def _digit_monomial(n: int, value: int, base: int, tot_base: int, sign: int):
    """The scalar polynomial +-X^chunk encoding one digit
    (reference: src/coordinate.rs:145-169)."""
    mono = np.zeros(n, dtype=np.int32)
    chunk = (value & ((1 << base) - 1)) << tot_base
    if sign < 0 and chunk != 0:
        mono[n - chunk] = -1  # (X^c)^-1 = -X^(n-c), negacyclic wrap
    else:
        mono[chunk] = 1
    return mono


def coordinate_encrypt(params: Params, ctx: NTTContext, s_ntt, value: int,
                       base1d, source: rng.Source):
    """GGSW digits of X^{value}, |value| < N (src/coordinate.rs:121-180)."""
    n = params.n
    assert abs(value) < n
    sign = 1 if value >= 0 else -1
    remain = abs(value)
    tot_base = 0
    digs = []
    for b in base1d.bases:
        mono = _digit_monomial(n, remain, b, tot_base, sign)
        digs.append(ggsw.encrypt(params, ctx, s_ntt, jnp.asarray(mono), source))
        remain >>= b
        tot_base += b
    return jnp.stack(digs, axis=0)


def encrypt(params: Params, ctx: NTTContext, s_ntt, value: int,
            source: rng.Source) -> Address:
    """Encrypt address `value`; digits are negated so read rotates by
    X^-a (reference: src/address.rs:85-109, note the -(k) at :106)."""
    base2d = params.base2d()
    assert 0 <= value < base2d.max()
    coords = []
    remain = value
    for base1d in base2d.rows:
        k = remain & (base1d.max() - 1)
        coords.append(coordinate_encrypt(params, ctx, s_ntt, -k, base1d, source))
        remain //= base1d.max()
    return Address(coordinates=tuple(coords))


def prepare(ctx: NTTContext, addr: Address) -> AddressPrepared:
    """Forward-NTT every digit GGSW (server-side, done inside read in the
    reference -- src/ram.rs:416-421; we expose it separately AND fold it
    into the jitted read for timing parity)."""
    return AddressPrepared(
        coordinates=tuple(ggsw.prepare(ctx, c) for c in addr.coordinates)
    )


# max digits fused into one chained kernel launch (VMEM-bounded: each
# digit's prepared keys cost P*T*M tiles resident)
_CHAIN_MAX = 4


def _truncate_coord(coord_prep, trunc, dig: int):
    """Read-path gadget truncation of a prepared coordinate
    [..., dig, D, C, C2, Lg, N] (params.Params.read_ep_digits): keep the
    top in_digits gadget rows / top key_limbs GGSW limbs.  Digit
    truncation needs dig == 1 -- chained CMux digits re-decompose the
    full-limb carry in-kernel."""
    in_digits, key_limbs = trunc
    if in_digits is not None:
        assert dig == 1, "read_ep_digits needs single-digit coordinates"
        coord_prep = coord_prep[..., :in_digits, :, :, :, :]
    if key_limbs is not None:
        coord_prep = coord_prep[..., :key_limbs, :]
    return coord_prep


def coordinate_product(params: Params, ctx: NTTContext, ct, coord_prep,
                       trunc: tuple = (None, None)):
    """Chained external products of all digit GGSWs of one coordinate
    (the CMux chain, src/coordinate_prepared.rs:145-178).  ct may carry
    leading batch dims.

    On the pallas backend the whole chain (up to _CHAIN_MAX digits) runs
    as ONE kernel: each digit's fold+normalize output feeds the next
    digit's gadget decomposition without leaving VMEM.

    trunc = (in_digits, key_limbs): optional read-path gadget truncation
    (params.Params.read_ep_digits)."""
    from ..ops import ntt as ntt_mod

    dig = coord_prep.shape[1]
    coord_prep = _truncate_coord(coord_prep, trunc, dig)
    n = params.n
    P, _, D, C, C2, Lg, _n = coord_prep.shape
    L = ct.shape[-2]
    if (ntt_mod.get_backend() == "pallas" and n == 4096 and C2 == C
            and D <= L and (D == L or dig == 1)):
        from ..ops.ntt_pallas import get_pallas_context, fused_external_fold_pallas

        pctx = get_pallas_context(n, ctx.primes)
        lead_shape = ct.shape[:-3]
        x = ct[..., :D, :].reshape((-1, C * D, n))
        # [P, dig, D, C, C2, Lg, N] -> [P, dig, C*D, C2*Lg, N]
        keys = jnp.transpose(coord_prep, (0, 1, 3, 2, 4, 5, 6)).reshape(
            P, dig, C * D, C2 * Lg, n)
        for s0 in range(0, dig, _CHAIN_MAX):
            x = fused_external_fold_pallas(
                pctx, x, keys[:, s0 : s0 + _CHAIN_MAX], L, C2
            ).reshape((-1, C2 * L, n))
        return x.reshape(lead_shape + (C2, L, n))

    for i in range(dig):
        ct = ggsw.external_product(params, ctx, ct, coord_prep[:, i])
    return ct


def coordinate_product_batched(params: Params, ctx: NTTContext, ct,
                               coords_prep_b, ct_ntt=None,
                               trunc: tuple = (None, None)):
    """coordinate_product of ONE shared ct against a BATCH of prepared
    coordinates (leading axis B).  Returns [B, ...ct.shape].

    The address-independent work -- the forward transform of the shared
    ct's gadget digits -- is hoisted out of the batch on the pallas
    backend: ONE ntt_fwd over all rows, then per-address digit-0 runs
    the spectral-input fold kernel and the remaining digits the regular
    chained kernel.  (The reference has no batched read; this is the
    BASELINE config-3 path.)

    ct_ntt: optional precomputed spectra of ct's digit rows
    ([P, rows, C*L, N], from spectral_cache) -- skips even the one
    forward transform (read-heavy workloads reuse it across calls; the
    composed fallback ignores it and recomputes, same results)."""
    from ..ops import ntt as ntt_mod

    dig = coords_prep_b.shape[2]
    coords_prep_b = _truncate_coord(coords_prep_b, trunc, dig)
    n = params.n
    _B, P, _, D, C, C2, Lg, _n = coords_prep_b.shape
    L = ct.shape[-2]
    if (ntt_mod.get_backend() == "pallas" and n == 4096 and C2 == C
            and D <= L and (D == L or dig == 1) and dig <= _CHAIN_MAX):
        from ..ops.ntt_pallas import (
            get_pallas_context, fused_external_fold_batched, ntt_fwd_pallas)

        pctx = get_pallas_context(n, ctx.primes)
        B = coords_prep_b.shape[0]
        lead_shape = ct.shape[:-3]
        if ct_ntt is None:
            x = ct[..., :D, :].reshape((-1, C * D, n))
            ct_ntt = ntt_fwd_pallas(pctx, x)  # [P, rows, T, N], shared
        elif D < L:
            # the spectral cache holds all C*L digit rows; keep the top
            # D per component (row slicing commutes with the transform)
            rows = ct_ntt.shape[1]
            ct_ntt = ct_ntt.reshape(P, rows, C, L, n)[:, :, :, :D]
            ct_ntt = ct_ntt.reshape(P, rows, C * D, n)
        keys = jnp.transpose(coords_prep_b, (0, 1, 2, 4, 3, 5, 6, 7)).reshape(
            B, P, dig, C * D, C2 * Lg, n)
        # the WHOLE batched level: shared spectral digit 0 + per-address
        # chained digits, one kernel launch (grid: address x rows x digit)
        y = fused_external_fold_batched(pctx, ct_ntt, keys, L, C2,
                                        x_is_ntt=True)
        return y.reshape((B,) + lead_shape + (C2, L, n))

    return jax.lax.map(
        lambda c: coordinate_product(params, ctx, ct, c, trunc=trunc),
        coords_prep_b)


def spectral_cache(params: Params, ctx: NTTContext, ct):
    """Forward transform of ct's gadget-digit rows, reusable across
    coordinate_product_batched calls on the same ct (server-side cache
    of the address-independent level-0 work; invalidated by writes).
    ct: [..., C, L, N] -> [P, rows, C*L, N].  Off the pallas backend the
    consumer ignores the cache (composed fallback recomputes), so any
    backend's spectrum order works here."""
    from ..ops import ntt as ntt_mod

    n = params.n
    C, L = ct.shape[-3], ct.shape[-2]
    x = ct.reshape((-1, C * L, n))
    if ntt_mod.get_backend() == "pallas" and n == 4096:
        from ..ops.ntt_pallas import get_pallas_context, ntt_fwd_pallas

        return ntt_fwd_pallas(get_pallas_context(n, ctx.primes), x)
    from ..ops.ntt import ntt_fwd

    return ntt_fwd(ctx, x)


def coordinate_product_perbatch(params: Params, ctx: NTTContext, ct_b,
                                coords_prep_b, trunc: tuple = (None, None)):
    """Per-item coordinate products: ct_b[a] x coords_prep_b[a] for every
    a of the leading batch axis, in ONE kernel launch on the pallas
    backend (per-address kernel calls would serialize on dispatch).

    ct_b: int32[A, ..., C, L, N]; coords_prep_b: int32[A, P, dig, ...].
    Returns int32[A, ..., C2, L, N]."""
    from ..ops import ntt as ntt_mod

    dig = coords_prep_b.shape[2]
    coords_prep_b = _truncate_coord(coords_prep_b, trunc, dig)
    n = params.n
    A, P, _, D, C, C2, Lg, _n = coords_prep_b.shape
    L = ct_b.shape[-2]
    if (ntt_mod.get_backend() == "pallas" and n == 4096 and C2 == C
            and D <= L and (D == L or dig == 1)):
        from ..ops.ntt_pallas import get_pallas_context, fused_external_fold_batched

        pctx = get_pallas_context(n, ctx.primes)
        lead_shape = ct_b.shape[1:-3]
        x = ct_b[..., :D, :].reshape((A, -1, C * D, n))
        keys = jnp.transpose(coords_prep_b, (0, 1, 2, 4, 3, 5, 6, 7)).reshape(
            A, P, dig, C * D, C2 * Lg, n)
        for s0 in range(0, dig, _CHAIN_MAX):
            x = fused_external_fold_batched(
                pctx, x, keys[:, :, s0 : s0 + _CHAIN_MAX], L, C2
            ).reshape((A, -1, C2 * L, n))
        return x.reshape((A,) + lead_shape + (C2, L, n))

    return jax.lax.map(
        lambda args: coordinate_product(params, ctx, args[0], args[1],
                                        trunc=trunc),
        (ct_b, coords_prep_b))
