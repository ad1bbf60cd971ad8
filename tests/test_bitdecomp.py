"""Homomorphic bit decomposition (vm/bitdecomp.py) at the toy ring:
RAM byte VALUES -> bit-sliced FheUint -- the VM load path (the dataflow
neither this framework nor the reference could previously express;
vm/cycle.py module docstring).  N = 64, k_pt = 4, 4-bit values,
chunk = 2 (two sign-bootstrap phases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import Params
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, ggsw, keys, rng
from fhe_ram_tpu.vm import bitdecomp, fheuint

PAR = Params(log_n=6, k_pt=4, decomp_n=(3, 3), word_size=2,
             max_addr=1 << 8)
P_BITS = 4


@pytest.fixture(scope="module")
def world():
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(91)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    bsk = bitdecomp.bootstrap_key(PAR, ctx, sk, s_ntt, src)
    return ctx, src, s_ntt, ekp, bsk


def enc_byte(ctx, s_ntt, src, x):
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = x
    return glwe.encrypt(PAR, ctx, s_ntt,
                        glwe.encode_vec(PAR, jnp.asarray(vals)), src)


def test_byte_to_bits(world):
    """Signed values decompose to the UNSIGNED byte's bits (x mod 2^p),
    each bit clean at slot 0 with fresh-bootstrap noise."""
    ctx, src, s_ntt, ekp, bsk = world
    for x in (-8, -3, 5):
        ct = enc_byte(ctx, s_ntt, src, x)
        bits = bitdecomp.byte_to_bits(PAR, ctx, ct, bsk, ekp.atk_glwe,
                                      P_BITS, chunk=2)
        u = x & ((1 << P_BITS) - 1)
        for k in range(P_BITS):
            want = (u >> k) & 1
            ph = glwe.phase(PAR, ctx, s_ntt, bits[k])
            val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want, (x, k, val, want)
            assert noise < -(PAR.k_pt + 1), (x, k, noise)


def test_load_word(world):
    """The full VM load: a 2-byte fetched RAM word -> FheUint word form
    (decrypt_word round-trips) AND prepared GGSW bits that drive a real
    external product (EP(GLWE(m), GGSW(b)) decodes b*m)."""
    ctx, src, s_ntt, ekp, bsk = world
    bytes_signed = [5, -3]  # word = (b1 << 4) | b0, b = x mod 16
    fetched = jnp.stack([enc_byte(ctx, s_ntt, src, x)
                         for x in bytes_signed], axis=0)
    word, prepared = bitdecomp.load_word(PAR, ctx, fetched, bsk, ekp,
                                         bits=2 * P_BITS)

    us = [x & ((1 << P_BITS) - 1) for x in bytes_signed]
    want_word = us[0] | (us[1] << P_BITS)
    got = fheuint.decrypt_word(PAR, ctx, s_ntt, word, 2 * P_BITS)
    assert got == want_word, (got, want_word)

    # the GGSW lift: select with each prepared bit
    m = 3
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = m
    ct_m = glwe.encrypt(PAR, ctx, s_ntt,
                        glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    for j in range(2 * P_BITS):
        b = (want_word >> j) & 1
        sel = ggsw.external_product(PAR, ctx, ct_m, prepared[:, j])
        ph = glwe.phase(PAR, ctx, s_ntt, sel)
        val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), b * m)
        assert int(val) == b * m, (j, val, b * m)
        assert noise < -(PAR.k_pt + 1), (j, noise)

    # the lifted bits must survive a real ALU CHAIN, not just one
    # select (the round-5 shift-lift bug passed selects and failed
    # here: chained CMuxes amplify row noise by full-mask digits)
    from fhe_ram_tpu.vm import arithmetic

    rhs_val = 0x33
    rhs = fheuint.encrypt_prepared(PAR, ctx, s_ntt, rhs_val, src,
                                   2 * P_BITS)
    words = arithmetic._dp_group(PAR, ctx, ("add",), prepared, rhs, rhs,
                                 2 * P_BITS)
    got = fheuint.decrypt_word(PAR, ctx, s_ntt, words["add"], 2 * P_BITS)
    assert got == (want_word + rhs_val) & 0xFF, hex(got)
