"""RV32I ALU over encrypted words (reference: src/arithmetic.rs).

`eval_ops` evaluates every ALU op on (rs1, rs2, imm), packs the results
into one GLWE at coefficient offsets 0..n_ops-1 (mirroring the
rotate-and-add packing at src/arithmetic.rs:195-210), and `select_rd`
blind-rotates by the encrypted op id and partial-traces away the other
slots (src/arithmetic.rs:212-231).

TPU-first batching (v2): ops are grouped by circuit TYPE and each group
runs as ONE batched circuit -- the 7 carry-DP ops (add/sub/compare
families) share one batched 2-state DP (2 batched external products per
bit for the whole group), the 6 bitwise ops share one batched
triple-CMux, and the 6 shifts share one slot extraction + one batched
barrel.  Versus the v1 per-op loop this cuts the sequential kernel
count ~8x and multiplies every kernel's batch size, which is what the
TPU wants.  `eval_ops_jit`/`select_rd_jit` wrap the loops in cached
jits (one compile per (ops, bits) shape) so VM programs pay tracing
once, not per instruction.
"""

from __future__ import annotations

from functools import lru_cache

import os

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import keyswitch
from . import circuits, fheuint

RVI32_OPS = (
    "none", "addi", "slti", "sltiu", "xori", "ori", "andi", "slli",
    "srli", "srai", "add", "sub", "sll", "slt", "sltu", "xor", "srl",
    "sra", "or", "and",
)

# circuit-group classification; "imm" ops read the immediate as operand b
_IMM_OPS = {"addi", "slti", "sltiu", "xori", "ori", "andi",
            "slli", "srli", "srai"}

# carry-DP specs: (emit_bits, use_sub_table, msb_flip, final(c), take_F)
_DP_SPECS = {
    "add": (True, False, False, lambda c: 0, 0),
    "addi": (True, False, False, lambda c: 0, 0),
    "sub": (True, True, False, lambda c: 0, 1),
    "sltu": (False, True, False, lambda c: 1 - c, 1),
    "sltiu": (False, True, False, lambda c: 1 - c, 1),
    "slt": (False, True, True, lambda c: 1 - c, 1),
    "slti": (False, True, True, lambda c: 1 - c, 1),
}

_BITWISE_TABLES = {
    "xor": (0, 1, 1, 0), "xori": (0, 1, 1, 0),
    "and": (0, 0, 0, 1), "andi": (0, 0, 0, 1),
    "or": (0, 1, 1, 1), "ori": (0, 1, 1, 1),
}

_SHIFT_KINDS = {
    "sll": "sll", "slli": "sll", "srl": "srl", "srli": "srl",
    "sra": "sra", "srai": "sra",
}


def glwe_blind_rotation(params: Params, ctx: NTTContext, ct, prep_bits,
                        start: int, end: int, lsh: int = 0,
                        negate: bool = True):
    """Rotate ct by X^(+-(bits[start:end] << lsh)) via a CMux chain over
    the prepared bit GGSWs (reference GLWEBlindRotation; consumed at
    src/arithmetic.rs:228, src/store.rs:62-64).  On the pallas backend
    the whole chain is ONE fused kernel launch."""
    from ..ops.ntt_pallas import fused_path_active

    if fused_path_active(params.n) and end > start:
        sgn = -1 if negate else 1
        return circuits.blind_rotate_fused(
            params, ct[None], prep_bits, range(start, end),
            [sgn << (k - start + lsh) for k in range(start, end)],
            trunc=_vm_trunc(params)[0])[0]

    for k in range(start, end):
        amount = 1 << (k - start + lsh)
        if negate:
            amount = -amount
        high = poly.rotate(ct[None], amount)[0]
        bit = prep_bits[:, k : k + 1]
        ct = circuits.cmux(params, ctx, bit, high[None], ct[None])[0]
    return ct


# --------------------------------------------------------------------------
# group circuits (each = one batched pipeline for all ops in the group)
# --------------------------------------------------------------------------

def _dp_group(params: Params, ctx: NTTContext, ops, rs1p, rs2p, immp,
              bits: int):
    """All carry-DP ops as one batched MSB->LSB 2-state DP.

    State F: [G, 2, C, L, N] -- per op, the result-so-far given carry-in
    0/1.  Per bit: one batched CMux on the b-bits (batch 4G) and one on
    the a-bits (batch 2G).  On the pallas backend the WHOLE chain is one
    fused kernel launch (ops/ntt_pallas.fused_dp_chain_pallas) -- the
    composed loop below is 2*bits sequential keyed calls whose dispatch
    glue dominates the kernel work."""
    from ..ops.ntt_pallas import fused_path_active

    if fused_path_active(params.n):
        return _dp_group_fused(params, ctx, ops, rs1p, rs2p, immp, bits)

    G = len(ops)
    specs = [_DP_SPECS[op] for op in ops]
    ept = _vm_trunc(params, bits)[0]  # matches the fused chain's slicing
    F = jnp.stack([
        jnp.stack([fheuint.trivial_word(params, [sp[3](0)], bits),
                   fheuint.trivial_word(params, [sp[3](1)], bits)])
        for sp in specs
    ])  # [G, 2, C, L, N]

    # op indices grouped by b-operand source: each group's bit j is ONE
    # GGSW shared by all its leaves (keyed CMux: key streamed once)
    src_groups = _src_groups(ops)

    for j in range(bits - 1, -1, -1):
        delta = circuits._delta_slot(params, j, bits)
        leaves = [None] * G
        for gi, (op, sp) in enumerate(zip(ops, specs)):
            emit, subtab, flip, _, _ = sp
            t = {}
            for a in (0, 1):
                for b in (0, 1):
                    for c in (0, 1):
                        aa = 1 - a if (flip and j == bits - 1) else a
                        bb = 1 - b if (flip and j == bits - 1) else b
                        eff_b = (1 - bb) if subtab else bb
                        carry = (aa + eff_b + c) >> 1
                        base = F[gi, carry]
                        if emit:
                            o = aa ^ eff_b ^ c if subtab else aa ^ bb ^ c
                            # for sub the emitted bit is a ^ ~b ^ c;
                            # no normalize: cmux takes limbs <= 2^18
                            base = base + o * delta
                        t[(a, b, c)] = base
            leaves[gi] = t
        # ONE keyed call for the whole b-phase: K = #sources, the
        # smaller source group zero-padded to a rectangular row count
        # (zero rows are inert through the kernel)
        groups = list(src_groups.items())
        rows_max = 4 * max(len(gis) for _, gis in groups)
        hstack, lstack, keys_b = [], [], []
        for is_imm, gis in groups:
            hh = [leaves[gi][k] for gi in gis
                  for k in ((0, 1, 0), (0, 1, 1), (1, 1, 0), (1, 1, 1))]
            ll = [leaves[gi][k] for gi in gis
                  for k in ((0, 0, 0), (0, 0, 1), (1, 0, 0), (1, 0, 1))]
            pad = rows_max - len(hh)
            zero = jnp.zeros_like(hh[0])
            hstack.append(jnp.stack(hh + [zero] * pad))
            lstack.append(jnp.stack(ll + [zero] * pad))
            keys_b.append((immp if is_imm else rs2p)[:, j : j + 1])
        res = circuits.cmux_keyed(
            params, ctx, jnp.concatenate(keys_b, axis=1),
            jnp.stack(hstack), jnp.stack(lstack), trunc=ept)
        inner = [None] * G  # per op: [4, C, L, N] = states (a, c)
        for si, (is_imm, gis) in enumerate(groups):
            for idx, gi in enumerate(gis):
                inner[gi] = res[si, 4 * idx : 4 * idx + 4]
        inner = jnp.stack(inner)  # [G, 4, C, L, N]
        aj = rs1p[:, j : j + 1]
        F = circuits.cmux_keyed(
            params, ctx, aj,
            inner[:, 2:].reshape((1, 2 * G) + inner.shape[2:]),
            inner[:, :2].reshape((1, 2 * G) + inner.shape[2:]),
            trunc=ept)[0]
        F = F.reshape((G, 2) + F.shape[1:])
    return {op: F[gi, sp[4]] for gi, (op, sp) in enumerate(zip(ops, specs))}


def _dp_group_fused(params: Params, ctx: NTTContext, ops, rs1p, rs2p, immp,
                    bits: int, interpret: bool = False):
    """_dp_group as ONE fused Pallas chain launch (pallas backend,
    N = 4096): state in VMEM, one streamed bit-GGSW per grid step.
    Bit-exact vs the composed loop (tests/test_fused_chain.py)."""
    from ..ops.ntt_pallas import get_pallas_context, fused_dp_chain_pallas

    G = len(ops)
    specs = [_DP_SPECS[op] for op in ops]
    n = params.n
    F0 = jnp.stack([
        jnp.stack([fheuint.trivial_word(params, [sp[3](0)], bits),
                   fheuint.trivial_word(params, [sp[3](1)], bits)])
        for sp in specs
    ])  # [G, 2, C2, L, N]

    groups = tuple((is_imm, tuple(gis))
                   for is_imm, gis in _src_groups(ops).items())

    ept = _vm_trunc(params, bits)[0]  # ephemeral-word gadget truncation
    steps, dsteps = [], []
    for d in range(bits):
        j = bits - 1 - d
        ks = [circuits.ggsw_key_rows(immp if is_imm else rs2p, j, ept)
              for is_imm, _ in groups]
        ks.append(circuits.ggsw_key_rows(rs1p, j, ept))
        steps.append(jnp.stack(ks))
        dsteps.append(circuits._delta_slot(params, j, bits))
    keys_stacked = jnp.stack(steps)   # [bits, NG+1, P, T, M, N]
    deltas = jnp.stack(dsteps)        # [bits, C2, L, N]

    pctx = get_pallas_context(n, params.primes)
    F = fused_dp_chain_pallas(
        pctx, F0, keys_stacked, deltas,
        op_tables=tuple((sp[0], sp[1], sp[2]) for sp in specs),
        groups=tuple(gis for _, gis in groups), interpret=interpret)
    return {op: F[gi, sp[4]] for gi, (op, sp) in enumerate(zip(ops, specs))}


def _bitwise_group(params: Params, ctx: NTTContext, ops, rs1p, rs2p, immp,
                   bits: int):
    """All bitwise ops as one batched 4-leaf truth-table select.

    Keyed CMuxes: bit j of each operand source is ONE GGSW shared by all
    its rows (2 leaves x ops per source for the b-level, G ops for the
    a-level), so keys stream once per (source, j) instead of per row.
    On the pallas backend the whole two-level circuit is ONE fused
    kernel launch (ops/ntt_pallas.fused_bitwise_pallas)."""
    from ..ops.ntt_pallas import fused_path_active

    if fused_path_active(params.n):
        return _bitwise_group_fused(params, ctx, ops, rs1p, rs2p, immp, bits)

    G = len(ops)
    W = bits
    ept = _vm_trunc(params, bits)[0]  # matches the fused chain's slicing

    src_groups = _src_groups(ops)

    def leaf(gi, v_idx):
        v = _BITWISE_TABLES[ops[gi]][v_idx]
        one = fheuint.trivial_word(params, [v], bits)
        return jnp.broadcast_to(one, (W,) + one.shape)  # [W, C, L, N]

    # b-level: hi and lo arms share each key -> rows (hi_op..., lo_op...)
    hi = [None] * G
    lo = [None] * G
    for is_imm, gis in src_groups.items():
        highs = jnp.stack([leaf(gi, 3) for gi in gis]
                          + [leaf(gi, 1) for gi in gis], axis=1)
        lows = jnp.stack([leaf(gi, 2) for gi in gis]
                         + [leaf(gi, 0) for gi in gis], axis=1)
        keys = (immp if is_imm else rs2p)[:, :W]
        res = circuits.cmux_keyed(params, ctx, keys, highs, lows, trunc=ept)
        for idx, gi in enumerate(gis):
            hi[gi] = res[:, idx]
            lo[gi] = res[:, len(gis) + idx]
    # a-level: rs1 bit j selects for all G ops at once
    out = circuits.cmux_keyed(params, ctx, rs1p[:, :W],
                              jnp.stack(hi, axis=1), jnp.stack(lo, axis=1),
                              trunc=ept)
    return {op: circuits.assemble_word(params, out[:, gi], bits)
            for gi, op in enumerate(ops)}


def _bitwise_group_fused(params: Params, ctx: NTTContext, ops, rs1p, rs2p,
                         immp, bits: int, interpret: bool = False):
    """_bitwise_group as ONE fused kernel launch (pallas backend):
    constant truth-table leaves in VMEM, one streamed bit GGSW per grid
    step.  Bit-exact vs the composed path (tests/test_fused_chain.py)."""
    from ..ops.ntt_pallas import get_pallas_context, fused_bitwise_pallas

    G = len(ops)
    W = bits
    groups_items = tuple((is_imm, tuple(gis))
                         for is_imm, gis in _src_groups(ops).items())

    def leaf(gi, v_idx):
        return fheuint.trivial_word(
            params, [_BITWISE_TABLES[ops[gi]][v_idx]], bits)

    hi = jnp.stack([jnp.stack([leaf(gi, 3), leaf(gi, 1)])
                    for gi in range(G)])  # [G, 2, C2, L, N]
    lo = jnp.stack([jnp.stack([leaf(gi, 2), leaf(gi, 0)])
                    for gi in range(G)])
    ept = _vm_trunc(params, bits)[0]  # ephemeral-word gadget truncation
    steps = []
    for j in range(W):
        ks = [circuits.ggsw_key_rows(immp if is_imm else rs2p, j, ept)
              for is_imm, _ in groups_items]
        ks.append(circuits.ggsw_key_rows(rs1p, j, ept))
        steps.append(jnp.stack(ks))
    keys_stacked = jnp.stack(steps)  # [W, NG+1, P, T, M, N]

    pctx = get_pallas_context(params.n, params.primes)
    out = fused_bitwise_pallas(
        pctx, hi, lo, keys_stacked,
        tuple(gis for _, gis in groups_items),
        interpret=interpret)  # [W, G, C2, L, N]
    return {op: circuits.assemble_word(params, out[:, gi], bits)
            for gi, op in enumerate(ops)}


def _shift_group(params: Params, ctx: NTTContext, ops, rs1p, rs2p, immp,
                 atk, bits: int):
    """All shifts as one slot extraction + one batched barrel
    (log2(bits) batched CMuxes of batch G*bits)."""
    G = len(ops)
    W = bits
    logw = W.bit_length() - 1
    ept, kst = _vm_trunc(params, bits)
    word = circuits.word_from_bits(params, ctx, rs1p, bits)
    slots0 = circuits.extract_slots(params, ctx, word, atk, bits, trunc=kst)
    slots = jnp.broadcast_to(slots0, (G,) + slots0.shape)  # [G, W, C, L, N]
    zero = jnp.zeros_like(slots0[0])
    for k in range(logw):
        s = 1 << k
        rolled = []
        for gi, op in enumerate(ops):
            kind = _SHIFT_KINDS[op]
            cur = slots[gi]
            if kind == "sll":
                r = jnp.concatenate(
                    [jnp.broadcast_to(zero, (s,) + zero.shape), cur[:-s]], 0)
            elif kind == "srl":
                r = jnp.concatenate(
                    [cur[s:], jnp.broadcast_to(zero, (s,) + zero.shape)], 0)
            else:  # sra
                top = jnp.broadcast_to(cur[-1], (s,) + zero.shape)
                r = jnp.concatenate([cur[s:], top], 0)
            rolled.append(r)
        rolled = jnp.stack(rolled)  # [G, W, C, L, N]
        # ONE keyed call per level: shift bit k of each operand source
        # is ONE GGSW shared by all its Gs*W rows; the smaller source
        # group is zero-padded to a rectangular row count (zero rows are
        # inert through the kernel)
        groups_items = list(_src_groups(ops).items())
        rows_max = W * max(len(gis) for _, gis in groups_items)
        hs, ls, bks = [], [], []
        for is_imm, gis in groups_items:
            h = jnp.stack([rolled[gi] for gi in gis]).reshape(
                (len(gis) * W,) + zero.shape)
            lw = jnp.stack([slots[gi] for gi in gis]).reshape(
                (len(gis) * W,) + zero.shape)
            pad = rows_max - h.shape[0]
            if pad:
                zpad = jnp.zeros((pad,) + zero.shape, h.dtype)
                h = jnp.concatenate([h, zpad])
                lw = jnp.concatenate([lw, zpad])
            hs.append(h)
            ls.append(lw)
            bks.append((immp if is_imm else rs2p)[:, k : k + 1])
        res = circuits.cmux_keyed(params, ctx, jnp.concatenate(bks, axis=1),
                                  jnp.stack(hs), jnp.stack(ls), trunc=ept)
        new = [None] * G
        for si, (is_imm, gis) in enumerate(groups_items):
            r = res[si, : len(gis) * W].reshape((len(gis), W) + zero.shape)
            for idx, gi in enumerate(gis):
                new[gi] = r[idx]
        slots = jnp.stack(new)
    return {op: circuits.assemble_word(params, slots[gi], bits)
            for gi, op in enumerate(ops)}


# Ephemeral-word gadget truncation for the VM's CMux/trace calls (the
# fused group chains, the shift barrel + its slot extraction): priced
# per-params by core/noise.vm_trunc_added_log2 and asserted against the
# bit-decode bound below -- a future preset with a more aggressive
# read-path truncation fails loudly instead of silently tightening VM
# precision.  Uses the params' read-path fields (same ephemeral-value
# rationale); FHERAM_VM_TRUNC=0 disables.
_VM_TRUNC = os.environ.get("FHERAM_VM_TRUNC", "1") == "1"

# margin (bits) the truncation delta must keep below the decode bound:
# the delta adds to (not replaces) the circuit's intrinsic noise
_VM_TRUNC_MARGIN = 6.0


def _vm_trunc(params, bits: int = 32):
    if not _VM_TRUNC:
        return (None, None), (None, None)
    if (params.read_ep_trunc, params.read_ks_trunc) != ((None, None),
                                                        (None, None)):
        from ..core import noise as noise_mod

        added = noise_mod.vm_trunc_added_log2(params, bits)
        decode = -(params.k_pt + 1)
        assert added < decode - _VM_TRUNC_MARGIN, (
            f"VM gadget truncation adds 2^{added:.1f} noise -- too close "
            f"to the 2^{decode} bit-decode bound for this preset; set "
            f"FHERAM_VM_TRUNC=0 or widen the read_* truncation fields")
    # read_ep_digits carries a wide-coordinate assert for ADDRESS use;
    # here the "digits" are plain ct limbs -- reuse the values directly
    return params.read_ep_trunc, params.read_ks_trunc


def _src_groups(ops):
    groups = {}
    for gi, op in enumerate(ops):
        groups.setdefault(op in _IMM_OPS, []).append(gi)
    return groups


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def eval_op(params: Params, ctx: NTTContext, op: str, rs1p, rs2p, immp,
            atk, bits: int = 32):
    """One ALU op -> FheUint word GLWE (single-op path, kept for tests
    and incremental use; eval_ops batches groups instead)."""
    if op == "none":
        C = params.rank + 1
        return jnp.zeros((C, params.limbs_ct, params.n), dtype=jnp.int32)
    if op in _DP_SPECS:
        return _dp_group(params, ctx, (op,), rs1p, rs2p, immp, bits)[op]
    if op in _BITWISE_TABLES:
        return _bitwise_group(params, ctx, (op,), rs1p, rs2p, immp, bits)[op]
    if op in _SHIFT_KINDS:
        return _shift_group(params, ctx, (op,), rs1p, rs2p, immp, atk, bits)[op]
    raise ValueError(op)


def eval_ops(params: Params, ctx: NTTContext, rs1p, rs2p, immp, atk,
             ops=RVI32_OPS, bits: int = 32):
    """Evaluate all ops; result i packed at coefficient offset i
    (src/arithmetic.rs:155-210), group-batched (see module docstring)."""
    n_ops = len(ops)
    # select_rd's partial trace keeps every gap-th coefficient: two packed
    # results whose offsets differ by a multiple of gap would alias.
    assert n_ops <= fheuint.gap(params, bits), (
        f"{n_ops} packed ops alias under the bits={bits} slot stride "
        f"(gap={fheuint.gap(params, bits)}); use a larger ring")
    words = {}
    dp_ops = tuple(op for op in ops if op in _DP_SPECS)
    bw_ops = tuple(op for op in ops if op in _BITWISE_TABLES)
    sh_ops = tuple(op for op in ops if op in _SHIFT_KINDS)
    if dp_ops:
        words.update(_dp_group(params, ctx, dp_ops, rs1p, rs2p, immp, bits))
    if bw_ops:
        words.update(_bitwise_group(params, ctx, bw_ops, rs1p, rs2p, immp, bits))
    if sh_ops:
        words.update(_shift_group(params, ctx, sh_ops, rs1p, rs2p, immp, atk, bits))
    # materialize each group's outputs: without the barrier XLA re-fuses
    # the shared operand preprocessing (key-row stacks of the SAME bit
    # GGSWs feed all three groups) into every consumer -- measured 3x on
    # the composed eval_ops vs the sum of its groups (the same
    # recompute-fusion cliff as the NTT stages, see CLAUDE.md)
    if words:
        keys_order = list(words)
        vals = jax.lax.optimization_barrier(tuple(words[o] for o in keys_order))
        words = dict(zip(keys_order, vals))

    rd = None
    for i, op in enumerate(ops):
        if op == "none":
            continue  # zero word contributes nothing
        r = poly.rotate(words[op], i)
        rd = r if rd is None else rd + r
    if rd is None:
        C = params.rank + 1
        return jnp.zeros((C, params.limbs_ct, params.n), dtype=jnp.int32)
    return limb_ops.normalize(rd)


def select_rd(params: Params, ctx: NTTContext, rd_packed, op_id_prep,
              ops_len: int, atk, bits: int = 32):
    """Blind-rotate by the encrypted op id, then clean with the partial
    trace keeping the word's slot stride (src/arithmetic.rs:212-231)."""
    assert ops_len <= fheuint.gap(params, bits), (
        "packed op offsets alias under the kept slot stride")
    log_size = (ops_len - 1).bit_length()
    rd = glwe_blind_rotation(params, ctx, rd_packed, op_id_prep, 0, log_size,
                             negate=True)
    keep_log = bits.bit_length() - 1
    return keyswitch.trace(params, ctx, rd, atk, keep_log=keep_log)


# --------------------------------------------------------------------------
# cached jit entry points (one compile per shape -- the VM "server loop")
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def eval_ops_jit(params: Params, ops=RVI32_OPS, bits: int = 32):
    """Jitted eval_ops: (rs1p, rs2p, immp, atk) -> packed rd."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda rs1p, rs2p, immp, atk: eval_ops(
        params, ctx, rs1p, rs2p, immp, atk, ops, bits))


@lru_cache(maxsize=None)
def select_rd_jit(params: Params, ops_len: int, bits: int = 32):
    """Jitted select_rd: (rd_packed, op_id_prep, atk) -> rd word."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda rd_packed, op_id_prep, atk: select_rd(
        params, ctx, rd_packed, op_id_prep, ops_len, atk, bits))
