"""Homomorphic word circuits: the TPU-native equivalent of
poulpy-schemes' BDD arithmetic (Add/Sub/Sll/Srl/Sra/Slt/Sltu/And/Or/Xor,
consumed by the reference at src/arithmetic.rs:84-102).

Everything is built from two primitives:

  * batched CMux  res_i = low_i + bit_i (*) (high_i - low_i)
    over stacked per-bit GGSWs (one batched external product);
  * batched slot extraction: all W word slots isolated by one batched
    partial trace (rotations + trace), enabling shift/splice circuits
    without per-slot sequential loops (the TPU replacement for BDD
    traversals -- same results, log/constant depth).

Adders/comparators use a 2-state carry dynamic program evaluated
MSB->LSB: F_j(c) = "encrypted suffix output given carry-in c at bit j",
advanced by CMuxes on (a_j, b_j) -- this is exactly the width-2 BDD of
the carry chain, evaluated with 2 batched external products per bit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import ggsw, keyswitch
from . import fheuint

I32 = jnp.int32


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def cmux(params: Params, ctx: NTTContext, bit_prep, high, low):
    """low + bit*(high-low), batched: bit_prep [P, B, D, C, C2, Lg, N],
    high/low [B, C, L, N].

    ONE kernel launch on the pallas path: high-low is fed unnormalized
    (|limb| <= 2^17, within the kernel's 2^18.6 digit bound) and the
    low-arm add + normalize rides the kernel epilogue."""
    return ggsw.external_product_batched(params, ctx, high - low, bit_prep,
                                         base=low)


def cmux_keyed(params: Params, ctx: NTTContext, bit_prep, high, low,
               trunc: tuple = (None, None)):
    """cmux with K distinct bit GGSWs, each selecting B rows:
    bit_prep [P, K, D, C, C2, Lg, N]; high/low [K, B, C, L, N].

    The VM circuits' CMux batches reuse each bit GGSW across many rows
    (a barrel level: one shift bit x 96 rows); the keyed form streams
    each 2.3 MB key once instead of once per row -- the per-row form
    measured DMA-bound (scripts/cmux_probe.py).

    trunc: optional gadget truncation for EPHEMERAL words (see
    ggsw.external_product_keyed)."""
    return ggsw.external_product_keyed(params, ctx, high - low, bit_prep,
                                       base=low, trunc=trunc)


def ggsw_key_rows(prep, j, trunc: tuple = (None, None)):
    """One prepared bit GGSW as VMP key rows: [P, W, D, C, C2, Lg, N]
    bit j -> [P, C*D, C2*Lg, N] (C-major digit rows, the layout
    ggsw.external_product_batched feeds the fused kernels).

    trunc = (in_digits, key_limbs): ephemeral-word gadget truncation
    (vm/arithmetic._vm_trunc) -- keep the top in_digits gadget rows and
    the top key_limbs GGSW limbs; the fused chain kernels derive their
    truncated digit count from the key shape (T // C2)."""
    in_digits, key_limbs = trunc
    pj = prep[:, j]
    if in_digits is not None:
        pj = pj[:, :in_digits]
    if key_limbs is not None:
        pj = pj[..., :key_limbs, :]
    P, D, C, C2, Lg, n = pj.shape
    return jnp.transpose(pj, (0, 2, 1, 3, 4, 5)).reshape(
        P, C * D, C2 * Lg, n)


def blind_rotate_fused(params: Params, rows, prep_bits, bit_idxs, amounts,
                       interpret: bool = False,
                       trunc: tuple = (None, None)):
    """A CMux rotation chain (rows <- CMux(bit_j; X^a_j rows, rows)) as
    ONE fused kernel launch; see ops/ntt_pallas.fused_blind_rotate_pallas.
    rows: [B, C2, Lc, N]; bit_idxs/amounts: per-step bit index into
    prep_bits and static rotation exponent.  trunc: ephemeral-word
    gadget truncation of the per-step CMuxes (ggsw_key_rows)."""
    from ..ops.ntt_pallas import get_pallas_context, fused_blind_rotate_pallas

    keys = jnp.stack([ggsw_key_rows(prep_bits, j, trunc) for j in bit_idxs])
    pctx = get_pallas_context(params.n, params.primes)
    return fused_blind_rotate_pallas(pctx, rows, keys, tuple(amounts),
                                     tbt=min(4, rows.shape[0]),
                                     interpret=interpret)


def ggsw_not(params: Params, bit_prep):
    """GGSW(1 - bit) from GGSW(bit): GGSW is linear in its message and
    GGSW(1) is the (noise-free) gadget itself -- in NTT domain the gadget
    constant's transform, precomputed here."""
    P, W, D, C, C2, Lg, n = bit_prep.shape
    from ..ops.ntt import ntt_fwd

    one = np.zeros((D, C, C2, Lg, n), dtype=np.int32)
    for d in range(D):
        for c in range(C):
            one[d, c, c, d, 0] = 1
    one_ntt = ntt_fwd(get_ctx(params), jnp.asarray(one))  # [P, D, C, C2, Lg, N]
    return one_ntt[:, None] - bit_prep


def get_ctx(params: Params) -> NTTContext:
    from ..ops.ntt import get_ntt_context

    return get_ntt_context(params.n, params.primes)


def extract_slots(params: Params, ctx: NTTContext, word, atk, bits: int = 32,
                  trunc: tuple = (None, None)):
    """All W slot values isolated to coefficient 0: [C, L, N] ->
    [W, C, L, N], via batched rotations + ONE batched full trace.

    Rotations are static slice+concat (poly.rotate), NOT a minor-dim
    gather: a last-axis gather serializes on the TPU (measured ~11 ms
    per gathered word at W=32 -- the eval_ops composition mystery,
    BENCH_NOTES round 3)."""
    g = fheuint.gap(params, bits)
    y = jnp.stack([poly.rotate(word, -g * m) for m in range(bits)])
    return keyswitch.trace(params, ctx, y, atk, trunc=trunc)  # [W, C, L, N]


def assemble_word(params: Params, slots, bits: int = 32):
    """Inverse of extract_slots: sum of slot_j * X^(j*gap).
    slots: [W, C, L, N], each value at coefficient 0.  Static
    slice+concat rotations (see extract_slots note)."""
    g = fheuint.gap(params, bits)
    acc = slots[0]
    for m in range(1, bits):
        acc = acc + poly.rotate(slots[m], g * m)
    return limb_ops.normalize(acc)


def _delta_slot(params: Params, j: int, bits: int, value: int = 1):
    """Trivial GLWE with `value` at slot j (scale 2^-k_pt)."""
    vals = np.zeros(bits, dtype=np.int64)
    vals[j] = value
    return fheuint.trivial_word(params, vals, bits)


# --------------------------------------------------------------------------
# bitwise ops (3 batched CMuxes total)
# --------------------------------------------------------------------------

def bitwise(params: Params, ctx: NTTContext, op: str, a_prep, b_prep,
            bits: int = 32):
    """XOR/AND/OR via the 4-leaf truth table:
    out_j = CMux(a_j, CMux(b_j, t11, t10), CMux(b_j, t01, t00))."""
    table = {
        "xor": (0, 1, 1, 0),
        "and": (0, 0, 0, 1),
        "or": (0, 1, 1, 1),
    }[op]
    t00, t01, t10, t11 = table
    C = params.rank + 1
    n = params.n

    def leaf(v):
        one = fheuint.trivial_word(params, [v], bits)  # value at slot 0
        return jnp.broadcast_to(one, (bits,) + one.shape)

    l00, l01, l10, l11 = (leaf(t) for t in (t00, t01, t10, t11))
    # keyed: each bit GGSW selects both arms at once
    res = cmux_keyed(params, ctx, b_prep,
                     jnp.stack([l11, l01], axis=1),
                     jnp.stack([l10, l00], axis=1))  # [W, 2, C, L, N]
    out_slots = cmux_keyed(params, ctx, a_prep, res[:, :1], res[:, 1:])[:, 0]
    return assemble_word(params, out_slots, bits)


# --------------------------------------------------------------------------
# adder / subtractor / comparisons: 2-state carry DP
# --------------------------------------------------------------------------

def _carry_dp(params: Params, ctx: NTTContext, a_prep, b_prep, bits: int,
              out_bit, carry_out, final, emit_bits: bool = True):
    """Generic MSB->LSB 2-state DP.

    out_bit(a, b, c) -> plaintext bit emitted at slot j,
    carry_out(a, b, c) -> next carry,
    final(c) -> plaintext contribution at the end of the word (e.g. the
    comparison result), placed at slot 0... F_W(c) = final(c).

    Returns (F_0(0), F_0(1)): result given initial carry 0 / 1."""
    C = params.rank + 1
    n = params.n
    L = params.limbs_ct
    F = jnp.stack(
        [fheuint.trivial_word(params, [final(0)], bits),
         fheuint.trivial_word(params, [final(1)], bits)], axis=0)  # [2, C, L, N]

    for j in range(bits - 1, -1, -1):
        # leaves t[a][b][c] = out_bit*Delta_j + F[carry_out]
        delta = _delta_slot(params, j, bits) if emit_bits else jnp.zeros_like(F[0])
        t = {}
        for a in (0, 1):
            for b in (0, 1):
                for c in (0, 1):
                    o = out_bit(a, b, c) if emit_bits else 0
                    base = F[carry_out(a, b, c)]
                    # no normalize: cmux accepts limbs <= 2^18
                    t[(a, b, c)] = base + o * delta
        # inner: keyed CMux on b_j (one key, 4 rows: (a,c) in {0,1}^2)
        highs = jnp.stack([t[(0, 1, 0)], t[(0, 1, 1)], t[(1, 1, 0)], t[(1, 1, 1)]])
        lows = jnp.stack([t[(0, 0, 0)], t[(0, 0, 1)], t[(1, 0, 0)], t[(1, 0, 1)]])
        inner = cmux_keyed(params, ctx, b_prep[:, j : j + 1],
                           highs[None], lows[None])[0]  # [4, C, L, N]
        # outer: keyed CMux on a_j (one key, states c=0,1)
        F = cmux_keyed(params, ctx, a_prep[:, j : j + 1],
                       inner[None, 2:], inner[None, :2])[0]  # [2, C, L, N]
    return F[0], F[1]


def add(params: Params, ctx: NTTContext, a_prep, b_prep, bits: int = 32):
    f0, _ = _carry_dp(params, ctx, a_prep, b_prep, bits,
                      out_bit=lambda a, b, c: a ^ b ^ c,
                      carry_out=lambda a, b, c: (a + b + c) >> 1,
                      final=lambda c: 0)
    return f0


def sub(params: Params, ctx: NTTContext, a_prep, b_prep, bits: int = 32):
    """a - b = a + ~b + 1: complement b's bits in the table instead."""
    _, f1 = _carry_dp(params, ctx, a_prep, b_prep, bits,
                      out_bit=lambda a, b, c: a ^ (1 - b) ^ c,
                      carry_out=lambda a, b, c: (a + (1 - b) + c) >> 1,
                      final=lambda c: 0)
    return f1


def sltu(params: Params, ctx: NTTContext, a_prep, b_prep, bits: int = 32):
    """a < b unsigned: NOT carry-out of a + ~b + 1, result bit at slot 0."""
    _, f1 = _carry_dp(params, ctx, a_prep, b_prep, bits,
                      out_bit=lambda a, b, c: 0,
                      carry_out=lambda a, b, c: (a + (1 - b) + c) >> 1,
                      final=lambda c: 1 - c, emit_bits=False)
    return f1


def slt(params: Params, ctx: NTTContext, a_prep, b_prep, bits: int = 32):
    """Signed a < b: same DP with both MSBs complemented (bias trick)."""
    _, f1 = _carry_dp_msbflip(params, ctx, a_prep, b_prep, bits)
    return f1


def _carry_dp_msbflip(params, ctx, a_prep, b_prep, bits):
    def ob(a, b, c):
        return 0

    def final(c):
        return 1 - c

    # flip a_31 and b_31: at j == bits-1 swap roles in the table
    C = params.rank + 1
    F = jnp.stack(
        [fheuint.trivial_word(params, [final(0)], bits),
         fheuint.trivial_word(params, [final(1)], bits)], axis=0)
    for j in range(bits - 1, -1, -1):
        flip = j == bits - 1
        t = {}
        for a in (0, 1):
            for b in (0, 1):
                for c in (0, 1):
                    aa = 1 - a if flip else a
                    bb = 1 - b if flip else b
                    t[(a, b, c)] = F[(aa + (1 - bb) + c) >> 1]
        highs = jnp.stack([t[(0, 1, 0)], t[(0, 1, 1)], t[(1, 1, 0)], t[(1, 1, 1)]])
        lows = jnp.stack([t[(0, 0, 0)], t[(0, 0, 1)], t[(1, 0, 0)], t[(1, 0, 1)]])
        inner = cmux_keyed(params, ctx, b_prep[:, j : j + 1],
                           highs[None], lows[None])[0]
        F = cmux_keyed(params, ctx, a_prep[:, j : j + 1],
                       inner[None, 2:], inner[None, :2])[0]
    return F[0], F[1]


# --------------------------------------------------------------------------
# shifts: slot extraction + batched barrel CMux
# --------------------------------------------------------------------------

def word_from_bits(params: Params, ctx: NTTContext, prep, bits: int = 32):
    """FheUint word GLWE from prepared bits (one batched ext product)."""
    C = params.rank + 1
    n = params.n
    base = jnp.stack([_delta_slot(params, j, bits) for j in range(bits)])
    zero = jnp.zeros_like(base)
    slots_sel = cmux(params, ctx, prep, base, zero)
    # slot j holds bit_j at coefficient j*gap already; just sum
    return limb_ops.normalize(jnp.sum(slots_sel, axis=0))


def shift(params: Params, ctx: NTTContext, word, sh_prep, atk, kind: str,
          bits: int = 32):
    """sll/srl/sra by an encrypted 5-bit amount.

    One batched slot extraction, then log2(bits) batched CMux barrel
    levels on the slot stack (rolls on the stack axis are free)."""
    W = bits
    logw = W.bit_length() - 1
    slots = extract_slots(params, ctx, word, atk, bits)  # [W, C, L, N]
    zero = jnp.zeros_like(slots[0])
    for k in range(logw):
        s = 1 << k
        if kind == "sll":  # out_j = in_{j-s}, fill low with 0
            rolled = jnp.concatenate(
                [jnp.broadcast_to(zero, (s,) + zero.shape), slots[:-s]], axis=0)
        elif kind == "srl":  # out_j = in_{j+s}, fill high with 0
            rolled = jnp.concatenate(
                [slots[s:], jnp.broadcast_to(zero, (s,) + zero.shape)], axis=0)
        else:  # sra: fill high with the sign slot (current top)
            top = jnp.broadcast_to(slots[-1], (s,) + zero.shape)
            rolled = jnp.concatenate([slots[s:], top], axis=0)
        slots = cmux_keyed(params, ctx, sh_prep[:, k : k + 1],
                           rolled[None], slots[None])[0]
    return assemble_word(params, slots, bits)
