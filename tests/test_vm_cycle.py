"""The full encrypted instruction cycle (vm/cycle.py): ALU + select_rd
+ select_store + pointer conversion + RAM RMW chained as one step,
decode-checked at the VM test ring (u32 words, 4-byte RAM words).

The reference never composes its three VM components with the RAM
(src/arithmetic.rs / store.rs / conversion.rs are isolated there); this
is capability beyond parity."""

import numpy as np
import pytest

from fhe_ram_tpu.params import Params
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.vm import cycle, fheuint

# u32 cycle geometry: gap = 512/32 = 16 >= the 16 store cases (the
# reference's store test ring, src/store.rs:163) and word_size = 4 so
# the VM word width matches the RAM word.
PV = Params(log_n=9, k_pt=3, decomp_n=(3, 3, 3), word_size=4,
            max_addr=1 << 9)
B32 = 32
OPS = ("none", "add", "xor", "and", "sub")


def test_vm_instruction_cycle_end_to_end():
    ctx = get_ntt_context(PV.n, PV.primes)
    src = rng.Source(61)
    sk = rng.ternary_secret(src.split(), PV.rank, PV.n, PV.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PV, keys.keygen(PV, sk, src))

    rnd = np.random.default_rng(15)
    data = rnd.integers(0, 256, size=PV.max_addr * PV.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(PV, ctx, s_ntt, data, src)

    # instruction: rd = rs1 + rs2 ; mem[ptr] = SB-merge(rs2_store, loaded)
    a, b, imm = 0xB4C0FFEE, 0x2D17A3E5, 0x7A5
    rs1p = fheuint.encrypt_prepared(PV, ctx, s_ntt, a, src, B32)
    rs2p = fheuint.encrypt_prepared(PV, ctx, s_ntt, b, src, B32)
    immp = fheuint.encrypt_prepared(PV, ctx, s_ntt, imm, src, B32)
    op_id = OPS.index("add")
    idp = fheuint.encrypt_prepared(PV, ctx, s_ntt, op_id, src, B32)

    x_store, y_loaded = 0x12345678, 0x9ABCDEF0
    xw = fheuint.encrypt_word(PV, ctx, s_ntt, x_store, src, B32)
    yw = fheuint.encrypt_word(PV, ctx, s_ntt, y_loaded, src, B32)
    off, sop = 1, 1  # SB at byte offset 1
    offp = fheuint.encrypt_prepared(PV, ctx, s_ntt, off, src, B32)
    sopp = fheuint.encrypt_prepared(PV, ctx, s_ntt, sop, src, B32)

    ptr = 321
    ptrp = fheuint.encrypt_prepared(
        PV, ctx, s_ntt, ptr, src, bits=(PV.max_addr - 1).bit_length(),
        dnum=PV.dnum_ggsw, limbs=PV.limbs_evk_ggsw)

    rd, fetched, new_data = cycle.vm_cycle(
        PV, ctx, ekp, rs1p, rs2p, immp, idp, xw, yw, offp, sopp, ptrp,
        ram_ct, ops=OPS, bits=B32)

    # 1. register write-back value
    got_rd = fheuint.decrypt_word(PV, ctx, s_ntt, rd, B32)
    assert got_rd == (a + b) & 0xFFFFFFFF, hex(got_rd)

    # 2. the fetch: RAM word at the pointer, pre-store
    for i in range(PV.word_size):
        want = glwe.cast_u8_signed(int(data[ptr * PV.word_size + i]),
                                   PV.k_pt)
        ph = glwe.phase(PV, ctx, s_ntt, np.asarray(fetched)[i])
        val, noise = glwe.decode_coeff0(PV, np.asarray(ph), want)
        assert int(val) == want, ("fetch", i, val, want)
        assert noise < -(PV.k_pt + 1), ("fetch", i, noise)

    # 3. the store: read back mem[ptr]; bytes must equal the
    # select_store-merged word (SB at offset 1)
    merged = bytearray(y_loaded.to_bytes(4, "little"))
    merged[off] = x_store.to_bytes(4, "little")[0]
    ap = address_mod.prepare(ctx, address_mod.encrypt(PV, ctx, s_ntt, ptr,
                                                      src))
    server = ram_mod.FheRam(PV, ekp)
    out = np.asarray(server.read(server.init_state(new_data), ap))
    for i in range(PV.word_size):
        want = glwe.cast_u8_signed(int(merged[i]), PV.k_pt)
        ph = glwe.phase(PV, ctx, s_ntt, out[i])
        val, noise = glwe.decode_coeff0(PV, np.asarray(ph), want)
        assert int(val) == want, ("store", i, val, want)
        assert noise < -(PV.k_pt + 1), ("store", i, noise)

    # 4. untouched address intact
    other = 100
    ap2 = address_mod.prepare(ctx, address_mod.encrypt(PV, ctx, s_ntt,
                                                       other, src))
    out2 = np.asarray(server.read(server.init_state(new_data), ap2))
    for i in range(PV.word_size):
        want = glwe.cast_u8_signed(int(data[other * PV.word_size + i]),
                                   PV.k_pt)
        ph = glwe.phase(PV, ctx, s_ntt, out2[i])
        val, _ = glwe.decode_coeff0(PV, np.asarray(ph), want)
        assert int(val) == want, ("untouched", i, val, want)
