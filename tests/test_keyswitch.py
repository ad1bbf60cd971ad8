"""Automorphism key-switching, trace, and packing tests (small ring)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops, poly
from fhe_ram_tpu.core import glwe, ggsw, keyswitch, packer, keys, rng

CTX = get_ntt_context(PAR.n, PAR.primes)


def setup(seed=2):
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ek = keys.keygen(PAR, sk, src)
    ekp = keys.prepare(PAR, ek)
    return src, sk, s_ntt, ekp


def decode_all(ph):
    t = limb_ops.torus_float(np.asarray(ph))
    m = 1 << PAR.k_pt
    d = np.rint(t * m).astype(np.int64)
    return ((d + m // 2) % m) - m // 2


def enc(src, s_ntt, vals):
    return glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)


def test_automorphism_ks():
    src, sk, s_ntt, ekp = setup()
    vals = (np.arange(PAR.n) * 3) % 5 - 2
    ct = enc(src, s_ntt, vals)
    for g in (PAR.trace_gal_els[0], PAR.trace_gal_els[-1]):
        fn = jax.jit(partial(keyswitch.automorphism_ks, PAR, CTX, g=g))
        res = fn(ct, key_ntt=ekp.atk_glwe[g])
        got = decode_all(glwe.phase(PAR, CTX, s_ntt, res))
        m = 1 << PAR.k_pt
        want = np.asarray(poly.automorphism(jnp.asarray(vals), g))
        want = ((want + m // 2) % m) - m // 2
        assert np.array_equal(got, want), g


def test_trace_extracts_coeff0():
    src, sk, s_ntt, ekp = setup()
    vals = (np.arange(PAR.n) * 3) % 5 - 2
    vals[0] = 3
    ct = enc(src, s_ntt, vals)
    fn = jax.jit(partial(keyswitch.trace, PAR, CTX))
    res = fn(ct, auto_keys_ntt=ekp.atk_glwe)
    got = decode_all(glwe.phase(PAR, CTX, s_ntt, res))
    want = np.zeros(PAR.n, dtype=np.int64)
    want[0] = 3
    assert np.array_equal(got, want), got[:8]


def test_extract_slots():
    """Split-tree slot extraction: row m decodes to [slot_m(ct), 0...],
    matching the per-slot trace(X^-m ct) semantics (write path;
    reference per-slot loop src/ram.rs:612-630)."""
    src, sk, s_ntt, ekp = setup()
    # values must stay in the k_pt signed range [-2^(k_pt-1), 2^(k_pt-1))
    vals = (np.arange(PAR.n) * 7) % 8 - 4
    ct = enc(src, s_ntt, vals)
    for count in (1, 3, 8):  # non-power-of-two exercises the padding
        fn = jax.jit(partial(keyswitch.extract_slots, PAR, CTX,
                             count=count))
        res = fn(ct, auto_keys_ntt=ekp.atk_glwe)
        assert res.shape[0] == count
        for m in range(count):
            got = decode_all(glwe.phase(PAR, CTX, s_ntt, res[m]))
            want = np.zeros(PAR.n, dtype=np.int64)
            want[0] = vals[m]
            assert np.array_equal(got, want), (count, m, got[:8])


def test_extract_slots_bounded_support():
    """With plaintext support limited to slots < count, the
    tail-free bounded extraction must decode identically to the full
    one: [slot_m(ct), 0...] with EXACT zeros elsewhere."""
    src, sk, s_ntt, ekp = setup()
    count = 4  # count * 2^ceil(log2 count) = 16 <= N
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[:count] = [3, -4, 1, 2]
    ct = enc(src, s_ntt, vals)
    fn = jax.jit(partial(keyswitch.extract_slots, PAR, CTX, count=count,
                         bounded_support=True))
    res = fn(ct, auto_keys_ntt=ekp.atk_glwe)
    for m in range(count):
        got = decode_all(glwe.phase(PAR, CTX, s_ntt, res[m]))
        want = np.zeros(PAR.n, dtype=np.int64)
        want[0] = vals[m]
        assert np.array_equal(got, want), (m, got[:8])


def test_extract_slots_dilated():
    """The strided-shard extraction (dilate/residue, round 5): for every
    residue class the dilated output is BIT-EXACT the strided slice of
    the full extraction -- both with and without bounded_support, and at
    log2(dilate) == ceil(log2(count)) (the select-after-loop edge)."""
    src, sk, s_ntt, ekp = setup()
    vals = np.zeros(PAR.n, dtype=np.int64)
    count = 8
    vals[:count] = [3, -4, 1, 2, -1, 0, 4, -3]
    ct = enc(src, s_ntt, vals)
    for bounded in (False, True):
        full = keyswitch.extract_slots(PAR, CTX, ct, count, ekp.atk_glwe,
                                       bounded_support=bounded)
        for d in (2, 4, 8):  # 8 == 2^s: select runs after the loop
            for k in range(d):
                part = keyswitch.extract_slots(
                    PAR, CTX, ct, count, ekp.atk_glwe,
                    bounded_support=bounded, dilate=d,
                    residue=jnp.int32(k))
                assert np.array_equal(np.asarray(part),
                                      np.asarray(full[k::d])), (bounded, d, k)


def test_trace_noise():
    src, sk, s_ntt, ekp = setup()
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = 1
    ct = enc(src, s_ntt, vals)
    res = keyswitch.trace(PAR, CTX, ct, ekp.atk_glwe)
    val, noise = glwe.decode_coeff0(PAR, np.asarray(glwe.phase(PAR, CTX, s_ntt, res)), 1)
    assert int(val) == 1
    assert noise < -(PAR.k_pt + 1), noise


def test_ggsw_automorphism_inv():
    """GGSW(X^e) -> GGSW(X^-e) via the p=-1 auto key + tensor key."""
    src, sk, s_ntt, ekp = setup()
    e = 5
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[e] = 1
    g_ct = ggsw.encrypt(PAR, CTX, s_ntt, jnp.asarray(mono), src)
    g_inv = keys.ggsw_automorphism_inv(PAR, CTX, g_ct, ekp)
    gp = ggsw.prepare(CTX, g_inv)

    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[e] = 3  # X^-e should bring coeff e to coeff 0
    ct = enc(src, s_ntt, vals)
    res = ggsw.external_product(PAR, CTX, ct, gp)
    got = decode_all(glwe.phase(PAR, CTX, s_ntt, res))
    want = np.asarray(poly.rotate(jnp.asarray(vals), -e))
    assert np.array_equal(got, want), (got[:8], want[:8])
