"""Four-step (MXU) NTT: roundtrip + conv exactness vs golden models."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops.ntt4 import get_ntt4_context, ntt4_fwd, ntt4_inv
from fhe_ram_tpu.ops.modular import mul_mod, to_canonical
from fhe_ram_tpu.utils import native


def test_roundtrip():
    for n in (64, 256):
        ctx = get_ntt4_context(n, DEFAULT_PRIMES)
        rng = np.random.default_rng(2)
        x = rng.integers(-(2**16), 2**16, size=(5, n)).astype(np.int32)
        X = ntt4_fwd(ctx, jnp.asarray(x))
        y = ntt4_inv(ctx, X)
        p, _ = ctx.consts(y.ndim)
        yc = np.asarray(to_canonical(y, p), dtype=np.int64)
        for pi in range(len(DEFAULT_PRIMES)):
            assert np.array_equal(yc[pi], x), (n, pi)


def test_conv_matches_golden():
    n = 64
    ctx = get_ntt4_context(n, DEFAULT_PRIMES)
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**16), 2**16, size=n)
    b = rng.integers(-(2**16), 2**16, size=n)
    A = ntt4_fwd(ctx, jnp.asarray(a, jnp.int32))
    B = ntt4_fwd(ctx, jnp.asarray(b, jnp.int32))
    p, ip = ctx.consts(A.ndim)
    got = np.asarray(to_canonical(ntt4_inv(ctx, mul_mod(A, B, p, ip)), p),
                     dtype=np.int64)
    if native.available():
        want = native.negacyclic_conv(a, b)
    else:
        want = None
    from tests.test_ntt import negacyclic_conv_ref
    want2 = negacyclic_conv_ref(a, b)
    for pi, q in enumerate(DEFAULT_PRIMES):
        w = np.array([v % q for v in want2], dtype=np.int64)
        assert np.array_equal((got[pi] - w) % q, np.zeros(n)), q
        if want is not None:
            assert np.array_equal((got[pi] - want) % q, np.zeros(n)), q


def test_e2e_read_with_fourstep_backend():
    """Full small-RAM read with the fourstep backend enabled globally."""
    import importlib
    from fhe_ram_tpu.ops import ntt as ntt_mod
    from fhe_ram_tpu.core import glwe as glwe_mod

    ntt_mod.set_backend("fourstep")
    # drop params-keyed jit caches built under the butterfly backend
    glwe_mod._encrypt_jit.cache_clear()
    glwe_mod._phase_jit.cache_clear()
    from fhe_ram_tpu.core import ggsw as ggsw_mod, keyswitch as ks_mod
    ggsw_mod._encrypt_jit.cache_clear()
    ks_mod._akey_jit.cache_clear()
    try:
        from fhe_ram_tpu.params import PARAMS_TEST_FLAT as PAR
        from fhe_ram_tpu.ops.ntt import get_ntt_context
        from fhe_ram_tpu.core import glwe, keys, rng
        from fhe_ram_tpu.ram import address as address_mod
        from fhe_ram_tpu.ram import ram as ram_mod

        ctx = get_ntt_context(PAR.n, PAR.primes)
        src = rng.Source(71)
        sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
        server = ram_mod.FheRam(PAR, ekp)
        rnd = np.random.default_rng(8)
        data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
        idx = 7
        ap = address_mod.prepare(ctx, address_mod.encrypt(PAR, ctx, s_ntt, idx, src))
        out = np.asarray(server.read(server.init_state(ram_ct), ap))
        for i in range(PAR.word_size):
            want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
            ph = glwe.phase(PAR, ctx, s_ntt, jnp.asarray(out[i]))
            val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want
            assert noise < -(PAR.k_pt + 1)
    finally:
        ntt_mod.set_backend("butterfly")
        glwe_mod._encrypt_jit.cache_clear()
        glwe_mod._phase_jit.cache_clear()
        ggsw_mod._encrypt_jit.cache_clear()
        ks_mod._akey_jit.cache_clear()
