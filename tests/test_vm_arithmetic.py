"""VM ALU dispatch + packed-select tests and the encrypted store-select
(mirrors the reference's exhaustive-combination strategy,
src/arithmetic.rs:234-409 and src/store.rs:146-333, on 8-bit words)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import fheuint, arithmetic, store

BITS = 8
CTX = get_ntt_context(PAR.n, PAR.primes)


@pytest.fixture(scope="module")
def world():
    src = rng.Source(41)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    return src, s_ntt, ekp


def model_op(op, a, b, bits=BITS):
    m = (1 << bits) - 1
    sa = a - (1 << bits) if a >> (bits - 1) else a
    sb = b - (1 << bits) if b >> (bits - 1) else b
    sh = b % bits
    return {
        "none": 0,
        "add": (a + b) & m, "sub": (a - b) & m,
        "xor": a ^ b, "or": a | b, "and": a & b,
        "slt": int(sa < sb), "sltu": int(a < b),
        "sll": (a << sh) & m, "srl": a >> sh, "sra": (sa >> sh) & m,
    }[op]


def test_eval_ops_and_select(world):
    src, s_ntt, ekp = world
    a, b = 0xB4, 0x2D
    rs1 = fheuint.encrypt_prepared(PAR, CTX, s_ntt, a, src, BITS)
    rs2 = fheuint.encrypt_prepared(PAR, CTX, s_ntt, b, src, BITS)
    ops = ("none", "add", "xor", "sltu", "srl", "sub")
    packed = arithmetic.eval_ops(PAR, CTX, rs1, rs2, rs2, ekp.atk_glwe,
                                 ops=ops, bits=BITS)
    for op_id, op in enumerate(ops):
        idp = fheuint.encrypt_prepared(PAR, CTX, s_ntt, op_id, src, BITS)
        sel = arithmetic.select_rd(PAR, CTX, packed, idp, len(ops),
                                   ekp.atk_glwe, BITS)
        got = fheuint.decrypt_word(PAR, CTX, s_ntt, sel, BITS)
        want = model_op(op, a, b)
        assert got == want, (op, got, want)


def test_eval_ops_full_rv32i_enum_u32():
    """The reference's exhaustive strategy at full width: ALL 20 RV32I
    ops evaluated at u32, packed, and select_rd driven over the full
    table (src/arithmetic.rs:300-409, also at N=1024).  Runs through the
    cached jit entry points (the VM server loop)."""
    from fhe_ram_tpu.params import PARAMS_TEST_VM1024 as PV

    ctxv = get_ntt_context(PV.n, PV.primes)
    src = rng.Source(43)
    sk = rng.ternary_secret(src.split(), PV.rank, PV.n, PV.xs_density)
    s_ntt = glwe.secret_prepare(ctxv, sk)
    ekp = keys.prepare(PV, keys.keygen(PV, sk, src))

    B32 = 32
    a, b, imm = 0xB4C0FFEE, 0x2D17A3E5, 0x000007A5
    rs1 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, a, src, B32)
    rs2 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, b, src, B32)
    immp = fheuint.encrypt_prepared(PV, ctxv, s_ntt, imm, src, B32)

    ops = arithmetic.RVI32_OPS
    assert len(ops) == 20
    packed = arithmetic.eval_ops_jit(PV, ops, B32)(rs1, rs2, immp,
                                                   ekp.atk_glwe)
    sel_fn = arithmetic.select_rd_jit(PV, len(ops), B32)
    for op_id, op in enumerate(ops):
        idp = fheuint.encrypt_prepared(PV, ctxv, s_ntt, op_id, src, B32)
        sel = sel_fn(packed, idp, ekp.atk_glwe)
        got = fheuint.decrypt_word(PV, ctxv, s_ntt, sel, B32)
        operand = imm if op in arithmetic._IMM_OPS else b
        want = model_op(op.rstrip("i") if op not in ("slti", "sltiu")
                        else {"slti": "slt", "sltiu": "sltu"}[op],
                        a, operand, B32)
        assert got == want, (op, hex(got), hex(want))


def test_select_store_all_combinations():
    # u32 store semantics need gap = N/32 >= 16 packed cases -> N=512 ring
    # (same geometry as the reference store test, src/store.rs:163)
    from fhe_ram_tpu.params import PARAMS_TEST_VM as PV

    ctxv = get_ntt_context(PV.n, PV.primes)
    src = rng.Source(42)
    sk = rng.ternary_secret(src.split(), PV.rank, PV.n, PV.xs_density)
    s_ntt = glwe.secret_prepare(ctxv, sk)
    ekp = keys.prepare(PV, keys.keygen(PV, sk, src))
    B32 = 32
    x, y = 0x12345678, 0x9ABCDEF0
    xw = fheuint.encrypt_word(PV, ctxv, s_ntt, x, src, B32)
    yw = fheuint.encrypt_word(PV, ctxv, s_ntt, y, src, B32)

    def model_store(off, op):
        # reference expectation table (src/store.rs:297-311): invalid
        # (offset, op) combinations -- SH at odd offset, SW at offset>0 --
        # must decrypt to 0, not wrap or alias
        bx = x.to_bytes(4, "little")
        by = y.to_bytes(4, "little")
        out = bytearray(by)
        if op == 1:  # SB
            out[off] = bx[0]
        elif op == 2:  # SH
            if off not in (0, 2):
                return 0
            out[off : off + 2] = bx[0:2]
        elif op == 3:  # SW
            if off != 0:
                return 0
            out[:] = bx
        return int.from_bytes(bytes(out), "little")

    # the FULL 4x4 (offset, op) product, like the reference's nested
    # loops (src/store.rs:277-331)
    for off, op in [(o, p) for o in range(4) for p in range(4)]:
        offp = fheuint.encrypt_prepared(PV, ctxv, s_ntt, off, src, B32)
        opp = fheuint.encrypt_prepared(PV, ctxv, s_ntt, op, src, B32)
        sel = store.select_store(PV, ctxv, xw, yw, offp, opp, ekp.atk_glwe, B32)
        got = fheuint.decrypt_word(PV, ctxv, s_ntt, sel, B32)
        assert got == model_store(off, op), (off, op, hex(got), hex(model_store(off, op)))


def test_shift_ops_truncated_gadget():
    """The shift barrel + slot extraction under the ephemeral-word
    gadget truncation (vm/arithmetic._vm_trunc; BENCH_NOTES round-5
    lever): decode must stay exact at a READOPT-style test ring."""
    from fhe_ram_tpu.params import Params

    PV = Params(log_n=6, k_pt=3, decomp_n=(6,), word_size=2,
                max_addr=1 << 8, read_ks_digits=2, read_ks_limbs=3,
                read_ep_digits=2, read_ep_limbs=3)
    assert PV.read_ep_trunc == (2, 3)
    ctxv = get_ntt_context(PV.n, PV.primes)
    src = rng.Source(47)
    sk = rng.ternary_secret(src.split(), PV.rank, PV.n, PV.xs_density)
    s_ntt = glwe.secret_prepare(ctxv, sk)
    ekp = keys.prepare(PV, keys.keygen(PV, sk, src))

    a, b = 0xB4, 0x0D
    rs1 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, a, src, BITS)
    rs2 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, b, src, BITS)
    words = arithmetic._shift_group(PV, ctxv, ("sll", "srl", "sra"),
                                    rs1, rs2, rs2, ekp.atk_glwe, BITS)
    for op, w in words.items():
        got = fheuint.decrypt_word(PV, ctxv, s_ntt, w, BITS)
        want = model_op(op, a, b)
        assert got == want, (op, got, want)


def test_dp_and_bitwise_groups_truncated_gadget():
    """The carry-DP and bitwise group chains under the ephemeral-word
    gadget truncation (vm/arithmetic._vm_trunc plumbed into the group
    circuits, round 5): decode stays exact at a READOPT-style test
    ring, and core/noise.vm_trunc_added_log2 prices the preset."""
    from fhe_ram_tpu.params import Params
    from fhe_ram_tpu.core import noise

    PV = Params(log_n=6, k_pt=3, decomp_n=(6,), word_size=2,
                max_addr=1 << 8, read_ks_digits=2, read_ks_limbs=3,
                read_ep_digits=2, read_ep_limbs=3)
    assert noise.vm_trunc_added_log2(PV, BITS) < -(PV.k_pt + 1) - 6
    ctxv = get_ntt_context(PV.n, PV.primes)
    src = rng.Source(51)
    sk = rng.ternary_secret(src.split(), PV.rank, PV.n, PV.xs_density)
    s_ntt = glwe.secret_prepare(ctxv, sk)

    a, b = 0xB4, 0x2D
    rs1 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, a, src, BITS)
    rs2 = fheuint.encrypt_prepared(PV, ctxv, s_ntt, b, src, BITS)
    dp_ops = ("add", "sub", "slt", "sltu")
    words = arithmetic._dp_group(PV, ctxv, dp_ops, rs1, rs2, rs2, BITS)
    for op in dp_ops:
        got = fheuint.decrypt_word(PV, ctxv, s_ntt, words[op], BITS)
        assert got == model_op(op, a, b), (op, got)
    bw_ops = ("xor", "or", "and")
    words = arithmetic._bitwise_group(PV, ctxv, bw_ops, rs1, rs2, rs2, BITS)
    for op in bw_ops:
        got = fheuint.decrypt_word(PV, ctxv, s_ntt, words[op], BITS)
        assert got == model_op(op, a, b), (op, got)
