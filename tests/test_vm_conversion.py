"""FheUint -> Address conversion: an encrypted pointer must drive a
correct RAM read (end-to-end version of the reference's noise-bound test,
src/conversion.rs:100-220)."""

import numpy as np
import pytest

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.vm import fheuint, conversion

CTX = get_ntt_context(PAR.n, PAR.primes)


def test_pointer_drives_ram_read():
    src = rng.Source(51)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    server = ram_mod.FheRam(PAR, ekp)

    rnd = np.random.default_rng(7)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, CTX, s_ntt, data, src)

    ptr_bits = (PAR.max_addr - 1).bit_length()
    for idx in [5, 200]:
        up = fheuint.encrypt_prepared(
            PAR, CTX, s_ntt, idx, src, bits=ptr_bits,
            dnum=PAR.dnum_ggsw, limbs=PAR.limbs_evk_ggsw)
        _, addr_prep = conversion.fheuint_to_address(PAR, CTX, up)
        out = np.asarray(server.read(server.init_state(ram_ct), addr_prep))
        for i in range(PAR.word_size):
            want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
            ph = glwe.phase(PAR, CTX, s_ntt, out[i])
            val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want, (idx, i)
            assert noise < -(PAR.k_pt + 1)


def test_pointer_drives_ram_write():
    """A VM-computed encrypted pointer drives a FULL RMW cycle:
    read_prepare_write -> write -> read-back, with untouched addresses
    intact (reference capability: Address::set_from_fheuint feeding
    Ram::write, src/conversion.rs:68-82 + src/ram.rs:226-294)."""
    src = rng.Source(52)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    server = ram_mod.FheRam(PAR, ekp)

    rnd = np.random.default_rng(8)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, CTX, s_ntt, data, src)

    idx = 77
    other = 140  # untouched probe address
    ptr_bits = (PAR.max_addr - 1).bit_length()
    up = fheuint.encrypt_prepared(
        PAR, CTX, s_ntt, idx, src, bits=ptr_bits,
        dnum=PAR.dnum_ggsw, limbs=PAR.limbs_evk_ggsw)
    addr, addr_prep = conversion.fheuint_to_address(PAR, CTX, up)

    new_word = rnd.integers(0, 256, size=PAR.word_size).astype(np.uint8)
    w_ct = ram_mod.encrypt_write_word(PAR, CTX, s_ntt, new_word, src)

    out, st = server.read_prepare_write(server.init_state(ram_ct), addr_prep)
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
        ph = glwe.phase(PAR, CTX, s_ntt, np.asarray(out)[i])
        val, _ = glwe.decode_coeff0(PAR, np.asarray(ph), want)
        assert int(val) == want, ("rpw", i)

    st = server.write(st, w_ct, addr)

    from fhe_ram_tpu.ram import address as address_mod
    ap2 = address_mod.prepare(CTX, address_mod.encrypt(PAR, CTX, s_ntt, idx, src))
    out2 = np.asarray(server.read(st, ap2))
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(new_word[i]), PAR.k_pt)
        ph = glwe.phase(PAR, CTX, s_ntt, out2[i])
        val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
        assert int(val) == want, ("write-back", i, val, want)
        assert noise < -(PAR.k_pt + 1), noise

    ap3 = address_mod.prepare(CTX, address_mod.encrypt(PAR, CTX, s_ntt, other, src))
    out3 = np.asarray(server.read(st, ap3))
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(data[other * PAR.word_size + i]), PAR.k_pt)
        ph = glwe.phase(PAR, CTX, s_ntt, out3[i])
        val, _ = glwe.decode_coeff0(PAR, np.asarray(ph), want)
        assert int(val) == want, ("untouched", i, val, want)
