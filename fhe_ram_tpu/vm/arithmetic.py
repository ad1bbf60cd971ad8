"""RV32I ALU over encrypted words (reference: src/arithmetic.rs).

`eval_ops` evaluates every ALU op on (rs1, rs2, imm), packs the 20
results into one GLWE at coefficient offsets 0..19 (mirroring the
rotate-and-add packing at src/arithmetic.rs:195-210), and `select_rd`
blind-rotates by the encrypted op id and partial-traces away the other
slots (src/arithmetic.rs:212-231)."""

from __future__ import annotations

import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import keyswitch
from . import circuits, fheuint

RVI32_OPS = (
    "none", "addi", "slti", "sltiu", "xori", "ori", "andi", "slli",
    "srli", "srai", "add", "sub", "sll", "slt", "sltu", "xor", "srl",
    "sra", "or", "and",
)


def glwe_blind_rotation(params: Params, ctx: NTTContext, ct, prep_bits,
                        start: int, end: int, lsh: int = 0,
                        negate: bool = True):
    """Rotate ct by X^(+-(bits[start:end] << lsh)) via a CMux chain over
    the prepared bit GGSWs (reference GLWEBlindRotation; consumed at
    src/arithmetic.rs:228, src/store.rs:62-64)."""
    for k in range(start, end):
        amount = 1 << (k - start + lsh)
        if negate:
            amount = -amount
        high = poly.rotate(ct[None], amount)[0]
        bit = prep_bits[:, k : k + 1]
        ct = circuits.cmux(params, ctx, bit, high[None], ct[None])[0]
    return ct


def eval_op(params: Params, ctx: NTTContext, op: str, rs1p, rs2p, immp,
            atk, bits: int = 32):
    """One ALU op -> FheUint word GLWE."""
    b = {"addi": immp, "slti": immp, "sltiu": immp, "xori": immp,
         "ori": immp, "andi": immp, "slli": immp, "srli": immp,
         "srai": immp}.get(op, rs2p)
    if op == "none":
        C = params.rank + 1
        return jnp.zeros((C, params.limbs_ct, params.n), dtype=jnp.int32)
    if op in ("add", "addi"):
        return circuits.add(params, ctx, rs1p, b, bits)
    if op == "sub":
        return circuits.sub(params, ctx, rs1p, b, bits)
    if op in ("xor", "xori"):
        return circuits.bitwise(params, ctx, "xor", rs1p, b, bits)
    if op in ("or", "ori"):
        return circuits.bitwise(params, ctx, "or", rs1p, b, bits)
    if op in ("and", "andi"):
        return circuits.bitwise(params, ctx, "and", rs1p, b, bits)
    if op in ("slt", "slti"):
        return circuits.slt(params, ctx, rs1p, b, bits)
    if op in ("sltu", "sltiu"):
        return circuits.sltu(params, ctx, rs1p, b, bits)
    if op in ("sll", "slli", "srl", "srli", "sra", "srai"):
        kind = {"sll": "sll", "slli": "sll", "srl": "srl", "srli": "srl",
                "sra": "sra", "srai": "sra"}[op]
        word = circuits.word_from_bits(params, ctx, rs1p, bits)
        return circuits.shift(params, ctx, word, b, atk, kind, bits)
    raise ValueError(op)


def eval_ops(params: Params, ctx: NTTContext, rs1p, rs2p, immp, atk,
             ops=RVI32_OPS, bits: int = 32):
    """Evaluate all ops; result i packed at coefficient offset i
    (src/arithmetic.rs:155-210)."""
    n_ops = len(ops)
    # select_rd's partial trace keeps every gap-th coefficient: two packed
    # results whose offsets differ by a multiple of gap would alias.
    assert n_ops <= fheuint.gap(params, bits), (
        f"{n_ops} packed ops alias under the bits={bits} slot stride "
        f"(gap={fheuint.gap(params, bits)}); use a larger ring")
    rd = None
    for i, op in enumerate(ops):
        res = eval_op(params, ctx, op, rs1p, rs2p, immp, atk, bits)
        rd = res if rd is None else limb_ops.normalize(rd + res)
        rd = poly.rotate(rd, -1)
    return limb_ops.normalize(poly.rotate(rd, n_ops))


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
