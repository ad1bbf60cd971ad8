"""GGSW ciphertexts and the external product (the hot kernel).

GGSW(mu) layout (coefficient domain): int32[D, C, C2, Lg, N] where
  D  = dnum gadget digit-rows,
  C  = rank+1 input components (which ct component the digit multiplies),
  C2 = rank+1 output components (each row is a GLWE),
  Lg = limbs of the row precision (k_ggsw).
Row (d, c) = Enc(0) + mu * 2^-(17(d+1)) added to component c, i.e. its
phase is mu*g_d*(-s_c) for c<rank and mu*g_d for c=rank.  Only the phase
matters for external-product correctness (see core/keys.py tensor-key
notes).

Prepared (NTT-domain) form: int32[P, D, C, C2, Lg, N].

External product: decompose the GLWE into its (normalized) limbs --
the gadget digits -- NTT them, multiply-accumulate against the prepared
GGSW rows pointwise, inverse-NTT, CRT-fold back into limbs.

Reference counterparts: poulpy-core GGSW / GGSWEncryptSk /
GLWEExternalProduct (consumed at src/coordinate.rs:121-180,
src/coordinate_prepared.rs:145-178).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, ntt_fwd, ntt_inv
from ..ops.modular import mul_mod, reduce_once
from ..ops.crt import crt_fold
from ..ops import limb as limb_ops
from . import glwe, rng

I32 = jnp.int32


def _encrypt_impl(params: Params, ctx: NTTContext, D: int, Lg: int,
                  s_ntt, mu, ka, ke):
    C = params.rank + 1
    n = params.n
    zeros = jnp.zeros((D, C, Lg, n), dtype=I32)
    rows = glwe._encrypt_impl(params, ctx, s_ntt, zeros, ka, ke)
    mu = jnp.asarray(mu, I32)
    # add mu at limb d of component c
    for d in range(D):
        for c in range(C):
            rows = rows.at[d, c, c, d, :].add(mu)
    # renormalize the touched limbs
    return limb_ops.normalize(rows)


@lru_cache(maxsize=None)
def _encrypt_jit(params: Params, D: int, Lg: int):
    import jax
    from ..ops.ntt import get_ntt_context

    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(
        lambda s_ntt, mu, ka, ke: _encrypt_impl(params, ctx, D, Lg, s_ntt, mu, ka, ke)
    )


def encrypt(params: Params, ctx: NTTContext, s_ntt, mu, source: rng.Source,
            dnum: int | None = None, limbs: int | None = None):
    """GGSW(mu) for a small integer polynomial mu (int32[N]).

    dnum defaults to params.dnum_ct (address GGSW, parameters.rs:273-279);
    limbs defaults to params.limbs_ggsw."""
    D = dnum if dnum is not None else params.dnum_ct
    Lg = limbs if limbs is not None else params.limbs_ggsw
    return _encrypt_jit(params, D, Lg)(
        s_ntt, jnp.asarray(mu, I32), source.split(), source.split()
    )


def prepare(ctx: NTTContext, ggsw):
    """Forward-NTT every row limb: [D, C, C2, Lg, N] -> [P, D, C, C2, Lg, N].
    (The reference's GGSWPrepared DFT form, coordinate_prepared.rs:100-117.)"""
    return ntt_fwd(ctx, ggsw)


def external_product_batched(params: Params, ctx: NTTContext, ct, ggsw_ntt,
                             out_limbs: int | None = None, base=None,
                             sign: int = 1, interpret: bool = False):
    """Batched GLWE x GGSW where each batch element has its own GGSW.

    ct: int32[B, C, L, N]; ggsw_ntt: int32[P, B, D, C, C2, Lg, N].
    Used by the VM layer's per-bit CMux chains (vm/).

    ct's limbs are consumed as the gadget digits directly and may be
    UNNORMALIZED up to |limb| <= 2^18 (the fused kernel's digit bound is
    0.502p ~= 2^18.6; the composed path's ntt_fwd bound is 2^21) -- CMux
    callers pass high-low without an extra normalize pass.
    base: optional int32[B, C2, Lout, N] added (after `sign`) before the
    final normalize (fused into the kernel epilogue on the pallas path):
    out = normalize(base + sign * (ct x ggsw))."""
    P, B, D, C, C2, Lg, n = ggsw_ntt.shape
    L = ct.shape[-2]
    assert ct.shape == (B, C, L, n) and D == L
    Lout = out_limbs if out_limbs is not None else L

    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and n == 4096:
        # per-item fused kernel: fwd NTT + VMP + inverse NTT + CRT fold
        # + (base +) normalize, one launch for the whole batch
        from ..ops.ntt_pallas import (
            get_pallas_context, fused_external_fold_batched)

        pctx = get_pallas_context(n, ctx.primes)
        x = ct.reshape(B, 1, C * D, n)
        keys = jnp.transpose(ggsw_ntt, (0, 1, 3, 2, 4, 5, 6)).reshape(
            P, B, C * D, C2 * Lg, n)
        keys = jnp.moveaxis(keys, 1, 0)[:, :, None]  # [B, P, 1, T, M, N]
        bb = None if base is None else base.reshape(B, 1, C2, Lout, n)
        out = fused_external_fold_batched(pctx, x, keys, Lout, C2,
                                          base=bb, sign=sign, tbf=1,
                                          interpret=interpret)
        return out.reshape(B, C2, Lout, n)

    assert not interpret, "interpret= applies to the fused pallas path only"
    dig_ntt = ntt_fwd(ctx, ct)  # [P, B, C, D, N]
    p, ip = ctx.consts(5)
    acc = jnp.zeros((P, B, C2, Lg, n), dtype=I32)
    for c in range(C):
        for d in range(D):
            dig = dig_ntt[:, :, c, d][:, :, None, None, :]
            acc = acc + mul_mod(dig, ggsw_ntt[:, :, d, c], p, ip)
    acc = reduce_once(acc, p, ip)
    acc = jax.lax.optimization_barrier(acc.reshape(P, -1, n))
    conv = ntt_inv(ctx, acc).reshape(P, B, C2, Lg, n)
    out = crt_fold(ctx.primes, conv, 17, Lout, p, ip)
    if sign < 0:
        out = -out
    if base is not None:
        out = base + out
    return limb_ops.normalize(out)


def external_product_keyed(params: Params, ctx: NTTContext, ct, ggsw_ntt,
                           out_limbs: int | None = None, base=None,
                           sign: int = 1, interpret: bool = False,
                           trunc: tuple = (None, None)):
    """GLWE x GGSW with K distinct GGSWs, each applied to B rows:
    ct: int32[K, B, C, L, N]; ggsw_ntt: int32[P, K, D, C, C2, Lg, N];
    base: optional int32[K, B, C2, Lout, N].

    The VM's CMux batches have FEW distinct bit GGSWs shared by many
    rows (e.g. a barrel level: 2 shift-amount bits x 96 rows); streaming
    per-ROW keys made those kernels DMA-bound (~2.3 MB/row), so this
    keyed form streams each key once per key-group.

    trunc = (in_digits, key_limbs): optional gadget truncation (the
    read-path pattern, params.Params.read_ep_digits): decompose only
    the top in_digits ct limbs against GGSW rows sliced to key_limbs.
    Sound for EPHEMERAL intermediate words (VM circuit values): the
    per-CMux truncation variance ~2^-60 is negligible against the
    2^-(k_pt+1) bit-decode bound (BENCH_NOTES round-5 lever)."""
    in_digits, key_limbs = trunc
    L_full = ct.shape[-2]
    if in_digits is not None:
        ggsw_ntt = ggsw_ntt[:, :, :in_digits]
        ct = ct[..., :in_digits, :]
    if key_limbs is not None:
        ggsw_ntt = ggsw_ntt[..., :key_limbs, :]
    P, K, D, C, C2, Lg, n = ggsw_ntt.shape
    if D < ct.shape[-2]:
        # key-driven gadget truncation: a GGSW with fewer digit rows
        # (e.g. the 2-digit LIFTED gadget, vm/bitdecomp.bits_to_prepared)
        # consumes only the operand's top D digits -- the same slicing
        # semantics as the trunc parameter
        ct = ct[..., :D, :]
    K2, B, C3, L, n2 = ct.shape
    assert K2 == K and C3 == C and D == L and n2 == n
    # output precision defaults to the PRE-truncation limb count (the
    # truncation only coarsens the decomposition, not the result)
    Lout = out_limbs if out_limbs is not None else L_full

    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and n == 4096:
        from ..ops.ntt_pallas import (
            get_pallas_context, fused_external_fold_batched)

        pctx = get_pallas_context(n, ctx.primes)
        x = ct.reshape(K, B, C * D, n)
        keys = jnp.transpose(ggsw_ntt, (0, 1, 3, 2, 4, 5, 6)).reshape(
            P, K, C * D, C2 * Lg, n)
        keys = jnp.moveaxis(keys, 1, 0)[:, :, None]  # [K, P, 1, T, M, N]
        out = fused_external_fold_batched(pctx, x, keys, Lout, C2,
                                          base=base, sign=sign,
                                          tbf=min(2, B), interpret=interpret)
        return out

    # composed fallback: expand to the per-item form
    assert not interpret, "interpret= applies to the fused pallas path only"
    gg = jnp.broadcast_to(ggsw_ntt[:, :, None],
                          (P, K, B, D, C, C2, Lg, n)).reshape(
                              P, K * B, D, C, C2, Lg, n)
    bb = None if base is None else base.reshape((K * B,) + base.shape[2:])
    out = external_product_batched(params, ctx,
                                   ct.reshape((K * B,) + ct.shape[2:]),
                                   gg, Lout, base=bb, sign=sign)
    return out.reshape((K, B) + out.shape[1:])


def external_product(params: Params, ctx: NTTContext, ct, ggsw_ntt,
                     out_limbs: int | None = None):
    """GLWE(m) x GGSW(mu) -> GLWE(mu*m).

    ct: int32[..., C, L, N] normalized (its limbs are the gadget digits).
    ggsw_ntt: int32[P, D, C, C2, Lg, N] with D <= L (D < L = gadget
    truncation: only the top D digits are consumed, see
    params.Params.read_ep_digits).
    Returns int32[..., C2, out_limbs, N] normalized (default out = L).
    """
    P, D, C, C2, Lg, n = ggsw_ntt.shape
    L = ct.shape[-2]
    assert ct.shape[-3] == C and D <= L, (ct.shape, ggsw_ntt.shape)
    Lout = out_limbs if out_limbs is not None else L

    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and n == 4096:
        # v2 single-kernel path: fwd NTT + VMP + inverse NTT + exact CRT
        # fold + carry normalize, all in VMEM (see ntt_pallas.py)
        from ..ops.ntt_pallas import get_pallas_context, fused_external_fold_pallas

        pctx = get_pallas_context(n, ctx.primes)
        lead_shape = ct.shape[:-3]
        x = ct[..., :D, :].reshape((-1, C * D, n))
        keys = jnp.transpose(ggsw_ntt, (0, 2, 1, 3, 4, 5)).reshape(
            P, 1, C * D, C2 * Lg, n)
        out = fused_external_fold_pallas(pctx, x, keys, Lout, C2)
        return out.reshape(lead_shape + (C2, Lout, n))

    dig_ntt = ntt_fwd(ctx, ct)  # [P, ..., C, D, N]
    lead = dig_ntt.ndim - 4  # number of batch axes between P and (C, D, N)
    p, ip = ctx.consts(lead + 4)  # for acc rank [P, ..., C2, Lg, N]
    acc = jnp.zeros((P,) + ct.shape[:-3] + (C2, Lg, n), dtype=I32)
    for c in range(C):
        for d in range(D):
            dig = dig_ntt[..., c, d, :]  # [P, ..., N]
            dig = dig[..., None, None, :]  # [P, ..., 1, 1, N]
            g = ggsw_ntt[:, d, c]  # [P, C2, Lg, N]
            g = g.reshape((P,) + (1,) * lead + (C2, Lg, n))
            acc = acc + mul_mod(dig, g, p, ip)
    acc = reduce_once(acc, p, ip)
    # flatten to the NTT's working layout and materialize: avoids a
    # relayout inside ntt_inv and XLA recompute-fusion of the pointwise
    # chain into every inverse stage (measured 6x at read shapes)
    acc = jax.lax.optimization_barrier(acc.reshape((P,) + (-1,) + (n,)))
    conv = ntt_inv(ctx, acc).reshape((P,) + ct.shape[:-3] + (C2, Lg, n))
    out = crt_fold(ctx.primes, conv, 17, Lout, p, ip)
    return limb_ops.normalize(out)
