"""VM word-circuit tests (8-bit words on the small ring for speed; the
circuits are generic in width -- the reference uses u32)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import fheuint, circuits

BITS = 8
CTX = get_ntt_context(PAR.n, PAR.primes)


@pytest.fixture(scope="module")
def world():
    src = rng.Source(31)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    return src, s_ntt, ekp


def enc_pair(world, a, b):
    src, s_ntt, ekp = world
    ap = fheuint.encrypt_prepared(PAR, CTX, s_ntt, a, src, BITS)
    bp = fheuint.encrypt_prepared(PAR, CTX, s_ntt, b, src, BITS)
    return ap, bp


def dec(world, ct):
    _, s_ntt, _ = world
    return fheuint.decrypt_word(PAR, CTX, s_ntt, ct, BITS)


def test_word_roundtrip(world):
    src, s_ntt, ekp = world
    for v in (0, 1, 0x5A, 0xFF):
        ct = fheuint.encrypt_word(PAR, CTX, s_ntt, v, src, BITS)
        assert dec(world, ct) == v


def test_word_from_bits(world):
    src, s_ntt, ekp = world
    ap = fheuint.encrypt_prepared(PAR, CTX, s_ntt, 0xA7, src, BITS)
    ct = circuits.word_from_bits(PAR, CTX, ap, BITS)
    assert dec(world, ct) == 0xA7


def test_bitwise(world):
    a, b = 0xC5, 0x3A
    ap, bp = enc_pair(world, a, b)
    for op, f in [("xor", a ^ b), ("and", a & b), ("or", a | b)]:
        out = circuits.bitwise(PAR, CTX, op, ap, bp, BITS)
        assert dec(world, out) == f, op


def test_add_sub(world):
    for a, b in [(3, 5), (200, 100), (255, 255), (0, 0), (127, 128)]:
        ap, bp = enc_pair(world, a, b)
        out = circuits.add(PAR, CTX, ap, bp, BITS)
        assert dec(world, out) == (a + b) % 256, ("add", a, b)
        out = circuits.sub(PAR, CTX, ap, bp, BITS)
        assert dec(world, out) == (a - b) % 256, ("sub", a, b)


def test_compare(world):
    cases = [(3, 5), (5, 3), (7, 7), (200, 100), (100, 200), (0, 255)]
    for a, b in cases:
        ap, bp = enc_pair(world, a, b)
        out = circuits.sltu(PAR, CTX, ap, bp, BITS)
        assert dec(world, out) == int(a < b), ("sltu", a, b)
        out = circuits.slt(PAR, CTX, ap, bp, BITS)
        sa = a - 256 if a >= 128 else a
        sb = b - 256 if b >= 128 else b
        assert dec(world, out) == int(sa < sb), ("slt", a, b)


def test_shifts(world):
    src, s_ntt, ekp = world
    a = 0b1011_0110
    word = fheuint.encrypt_word(PAR, CTX, s_ntt, a, src, BITS)
    for sh in (0, 1, 3, 7):
        shp = fheuint.encrypt_prepared(PAR, CTX, s_ntt, sh, src, BITS)
        out = circuits.shift(PAR, CTX, word, shp, ekp.atk_glwe, "sll", BITS)
        assert dec(world, out) == (a << sh) % 256, ("sll", sh)
        out = circuits.shift(PAR, CTX, word, shp, ekp.atk_glwe, "srl", BITS)
        assert dec(world, out) == (a >> sh), ("srl", sh)
        out = circuits.shift(PAR, CTX, word, shp, ekp.atk_glwe, "sra", BITS)
        sa = a - 256 if a >= 128 else a
        assert dec(world, out) == (sa >> sh) % 256, ("sra", sh)
