"""External product GLWE x GGSW(X^e) tests: rotation semantics + noise."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops, poly
from fhe_ram_tpu.core import glwe, ggsw, rng


def setup():
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(1)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    return ctx, src, sk, s_ntt


def decode_all(ph):
    t = limb_ops.torus_float(np.asarray(ph))
    m = 1 << PAR.k_pt
    d = np.rint(t * m).astype(np.int64)
    return ((d + m // 2) % m) - m // 2


def test_external_product_monomial_rotation():
    ctx, src, sk, s_ntt = setup()
    vals = (np.arange(PAR.n) * 7) % (1 << PAR.k_pt) - (1 << (PAR.k_pt - 1))
    ct = glwe.encrypt(PAR, ctx, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)

    for e in [0, 1, 5, PAR.n - 1]:
        for sign in [1, -1]:
            mono = np.zeros(PAR.n, dtype=np.int32)
            # X^e or -X^(n-e) == X^-e wrapped (coordinate.rs:151-160)
            if sign == 1:
                mono[e] = 1
            else:
                if e == 0:
                    mono[0] = 1
                else:
                    mono[PAR.n - e] = -1
            g = ggsw.encrypt(PAR, ctx, s_ntt, jnp.asarray(mono), src)
            gp = ggsw.prepare(ctx, g)
            res = ggsw.external_product(PAR, ctx, ct, gp)
            ph = glwe.phase(PAR, ctx, s_ntt, res)
            got = decode_all(ph)
            want_poly = np.asarray(poly.rotate(jnp.asarray(vals), sign * e))
            m = 1 << PAR.k_pt
            want = ((want_poly + m // 2) % m) - m // 2
            assert np.array_equal(got, want), (e, sign, got[:8], want[:8])


def test_external_product_noise_budget():
    """Noise after one external product stays far below plaintext scale
    (mirrors the reference noise assertion examples/fhe-ram.rs:109-114)."""
    ctx, src, sk, s_ntt = setup()
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = 2
    ct = glwe.encrypt(PAR, ctx, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[3] = 1
    g = ggsw.prepare(ctx, ggsw.encrypt(PAR, ctx, s_ntt, jnp.asarray(mono), src))
    res = ggsw.external_product(PAR, ctx, ct, g)
    ph = glwe.phase(PAR, ctx, s_ntt, res)
    t = limb_ops.torus_float(np.asarray(ph))
    frac = t - np.roll(vals, 3) * 2.0**-PAR.k_pt
    frac = frac - np.rint(frac)
    assert np.max(np.abs(frac)) < 2.0 ** -(PAR.k_pt + 4), np.log2(
        np.max(np.abs(frac)) + 1e-300
    )


def test_external_product_chain():
    """Chained digit products: X^1 * X^2 == X^3 (coordinate product
    semantics, coordinate_prepared.rs:145-160)."""
    ctx, src, sk, s_ntt = setup()
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = 1
    ct = glwe.encrypt(PAR, ctx, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    for e in (1, 2):
        mono = np.zeros(PAR.n, dtype=np.int32)
        mono[e] = 1
        gp = ggsw.prepare(ctx, ggsw.encrypt(PAR, ctx, s_ntt, jnp.asarray(mono), src))
        ct = ggsw.external_product(PAR, ctx, ct, gp)
    got = decode_all(glwe.phase(PAR, ctx, s_ntt, ct))
    want = np.zeros(PAR.n, dtype=np.int64)
    want[3] = 1
    assert np.array_equal(got, want)


def test_external_product_batched():
    ctx, src, sk, s_ntt = setup()
    pts = np.zeros((3, PAR.n), dtype=np.int64)
    pts[0, 0] = 1
    pts[1, 1] = 2
    pts[2, 2] = 3
    cts = glwe.encrypt(PAR, ctx, s_ntt, glwe.encode_vec(PAR, jnp.asarray(pts)), src)
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[2] = 1
    gp = ggsw.prepare(ctx, ggsw.encrypt(PAR, ctx, s_ntt, jnp.asarray(mono), src))
    res = ggsw.external_product(PAR, ctx, cts, gp)
    assert res.shape == cts.shape
    for i in range(3):
        got = decode_all(glwe.phase(PAR, ctx, s_ntt, res[i]))
        want = np.asarray(poly.rotate(jnp.asarray(pts[i]), 2))
        assert np.array_equal(got, want), i
