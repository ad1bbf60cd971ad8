"""GLWE encrypt/decrypt roundtrip + noise bounds (small ring, CPU)."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops
from fhe_ram_tpu.core import glwe, rng


def setup():
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    return ctx, src, sk, s_ntt


def test_encrypt_decrypt_roundtrip():
    ctx, src, sk, s_ntt = setup()
    vals = np.arange(PAR.n) % (1 << PAR.k_pt)
    vals = np.where(vals >= (1 << (PAR.k_pt - 1)), vals - (1 << PAR.k_pt), vals)
    pt = glwe.encode_vec(PAR, jnp.asarray(vals))
    ct = glwe.encrypt(PAR, ctx, s_ntt, pt, src)
    assert ct.shape == (PAR.rank + 1, PAR.limbs_ct, PAR.n)
    ph = glwe.phase(PAR, ctx, s_ntt, ct)
    t = limb_ops.torus_float(np.asarray(ph))
    dec = np.rint(t * 2.0**PAR.k_pt).astype(np.int64)
    m = 1 << PAR.k_pt
    dec = ((dec + m // 2) % m) - m // 2
    assert np.array_equal(dec, vals), (dec[:8], vals[:8])
    # noise well below plaintext resolution
    frac = t - vals * 2.0**-PAR.k_pt
    frac = frac - np.rint(frac)
    assert np.max(np.abs(frac)) < 2.0 ** -(PAR.k_pt + 2)


def test_noise_magnitude():
    """Fresh-ciphertext noise should be ~sigma * 2^-(17 L)."""
    ctx, src, sk, s_ntt = setup()
    pt = jnp.zeros((PAR.limbs_ct, PAR.n), dtype=jnp.int32)
    ct = glwe.encrypt(PAR, ctx, s_ntt, pt, src)
    ph = glwe.phase(PAR, ctx, s_ntt, ct)
    t = limb_ops.torus_float(np.asarray(ph))
    scale = 2.0 ** (-17 * PAR.limbs_ct)
    sd = np.std(t / scale)
    assert 0.3 * PAR.sigma < sd < 3.0 * PAR.sigma, sd


def test_batched_encrypt_shapes():
    ctx, src, sk, s_ntt = setup()
    pt = jnp.zeros((5, PAR.limbs_ct, PAR.n), dtype=jnp.int32)
    ct = glwe.encrypt(PAR, ctx, s_ntt, pt, src)
    assert ct.shape == (5, PAR.rank + 1, PAR.limbs_ct, PAR.n)
    ph = glwe.phase(PAR, ctx, s_ntt, ct)
    assert ph.shape == (5, PAR.limbs_ct, PAR.n)


def test_decode_helper():
    ctx, src, sk, s_ntt = setup()
    want = 3
    pt = glwe.encode_vec(PAR, jnp.asarray([want] + [0] * (PAR.n - 1)))
    ct = glwe.encrypt(PAR, ctx, s_ntt, pt, src)
    ph = glwe.phase(PAR, ctx, s_ntt, ct)
    val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
    assert int(val) == want
    assert noise < -(PAR.k_pt + 1)
