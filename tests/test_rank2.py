"""Generic-rank coverage: the full pipeline at rank 2, and GGSW
automorphisms at arbitrary galois elements.

The reference's poulpy layer is generic in rank (GLWE rank newtype) and
in the GGSW automorphism's galois element
(src/coordinate_prepared.rs:119-142, keys.rs:167-169); the default RAM
config uses rank 1 and p = -1 only.  These tests pin the generality of
the TPU build: encrypt/decrypt, external product, GGSW automorphism
(p = -1 and a generic odd p), and a full RAM read + RMW cycle, all at
rank 2 with the per-component tensor keys."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_TEST_RANK2 as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops, poly
from fhe_ram_tpu.core import glwe, ggsw, keys, rng
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod

CTX = get_ntt_context(PAR.n, PAR.primes)


def setup(seed=21, ggsw_gal_els=(-1,)):
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src, ggsw_gal_els=ggsw_gal_els))
    return src, sk, s_ntt, ekp


def decode_all(ph):
    t = limb_ops.torus_float(np.asarray(ph))
    m = 1 << PAR.k_pt
    d = np.rint(t * m).astype(np.int64)
    return ((d + m // 2) % m) - m // 2


def test_rank2_glwe_roundtrip():
    src, sk, s_ntt, _ = setup()
    assert sk.shape == (2, PAR.n)
    vals = np.arange(PAR.n) % 7 - 3
    ct = glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    assert ct.shape[-3] == 3  # rank+1 components
    got = decode_all(glwe.phase(PAR, CTX, s_ntt, ct))
    m = 1 << PAR.k_pt
    want = ((vals + m // 2) % m) - m // 2
    assert np.array_equal(got, want)


def test_rank2_external_product():
    src, sk, s_ntt, _ = setup(seed=22)
    vals = np.arange(PAR.n) % 5 - 2
    ct = glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    e = 9
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[e] = 1
    g = ggsw.prepare(CTX, ggsw.encrypt(PAR, CTX, s_ntt, jnp.asarray(mono), src))
    res = ggsw.external_product(PAR, CTX, ct, g)
    got = decode_all(glwe.phase(PAR, CTX, s_ntt, res))
    m = 1 << PAR.k_pt
    want = np.asarray(poly.rotate(jnp.asarray(((vals + m // 2) % m) - m // 2), e))
    want = ((want + m // 2) % m) - m // 2
    assert np.array_equal(got, want)


def test_rank2_ggsw_automorphism_generic_galois():
    """GGSW(X^e) -> GGSW(sigma_g(X^e)) at rank 2, for p = -1 and a
    generic odd galois element."""
    gal2 = 5
    src, sk, s_ntt, ekp = setup(seed=23, ggsw_gal_els=(-1, gal2))
    e = 5
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[e] = 1
    g_ct = ggsw.encrypt(PAR, CTX, s_ntt, jnp.asarray(mono), src)

    for g in (-1, gal2):
        g_out = keys.ggsw_automorphism(PAR, CTX, g_ct, g, ekp)
        gp = ggsw.prepare(CTX, g_out)
        # multiply a known plaintext by the transformed monomial
        vals = np.zeros(PAR.n, dtype=np.int64)
        vals[0] = 3
        ct = glwe.encrypt(PAR, CTX, s_ntt,
                          glwe.encode_vec(PAR, jnp.asarray(vals)), src)
        res = ggsw.external_product(PAR, CTX, ct, gp)
        got = decode_all(glwe.phase(PAR, CTX, s_ntt, res))
        mono_g = np.asarray(poly.automorphism(jnp.asarray(mono), g))
        want = np.asarray(3 * mono_g)
        m = 1 << PAR.k_pt
        want = ((want + m // 2) % m) - m // 2
        assert np.array_equal(got, want), (g, got[:12], want[:12])


def test_rank2_ram_rmw_cycle():
    src, sk, s_ntt, ekp = setup(seed=24)
    server = ram_mod.FheRam(PAR, ekp)
    rnd = np.random.default_rng(4)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, CTX, s_ntt, data, src)

    idx = 201
    addr = address_mod.encrypt(PAR, CTX, s_ntt, idx, src)
    ap = address_mod.prepare(CTX, addr)
    st = server.init_state(ram_ct)
    out = np.asarray(server.read(st, ap))
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
        val, noise = glwe.decode_coeff0(
            PAR, np.asarray(glwe.phase(PAR, CTX, s_ntt, out[i])), want)
        assert int(val) == want
        assert noise < -(PAR.k_pt + 1)

    new_word = rnd.integers(0, 256, size=PAR.word_size).astype(np.uint8)
    w_ct = ram_mod.encrypt_write_word(PAR, CTX, s_ntt, new_word, src)
    _, st = server.read_prepare_write(st, ap)
    st = server.write(st, w_ct, addr)
    out2 = np.asarray(server.read(st, ap))
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(new_word[i]), PAR.k_pt)
        val, noise = glwe.decode_coeff0(
            PAR, np.asarray(glwe.phase(PAR, CTX, s_ntt, out2[i])), want)
        assert int(val) == want, (i, val, want)
        assert noise < -(PAR.k_pt + 1)
