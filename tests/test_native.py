"""Cross-validation of the int32+float32 TPU arithmetic against the
wide-integer C++ golden models (native/fheram_native.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops.ntt import get_ntt_context, ntt_fwd, ntt_inv
from fhe_ram_tpu.ops.modular import mul_mod, to_canonical
from fhe_ram_tpu.ops.crt import garner_digits, int_digits9
from fhe_ram_tpu.ops.modular import prime_consts
from fhe_ram_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_conv_crosscheck():
    n = 128
    ctx = get_ntt_context(n, DEFAULT_PRIMES)
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**16), 2**16, size=n)
    b = rng.integers(-(2**16), 2**16, size=n)
    # native exact conv
    want = native.negacyclic_conv(a, b)
    # jax NTT conv per prime
    A = ntt_fwd(ctx, jnp.asarray(a, jnp.int32))
    B = ntt_fwd(ctx, jnp.asarray(b, jnp.int32))
    p, ip = ctx.consts(A.ndim)
    got = np.asarray(to_canonical(ntt_inv(ctx, mul_mod(A, B, p, ip)), p),
                     dtype=np.int64)
    for pi, q in enumerate(DEFAULT_PRIMES):
        assert np.array_equal((got[pi] - want) % q, np.zeros(n)), q


def test_garner_crosscheck():
    rng = np.random.default_rng(1)
    xs = rng.integers(-(2**48), 2**48, size=256)
    rs = []
    for q in DEFAULT_PRIMES:
        m = np.mod(xs, q)
        rs.append(np.where(m > q // 2, m - q, m))
    want = native.garner3_digits(rs[0], rs[1], rs[2], DEFAULT_PRIMES, 9, 8)
    r = jnp.asarray(np.stack(rs), jnp.int32)
    p, ip = prime_consts(DEFAULT_PRIMES, r.ndim)
    v1, v2, v3 = garner_digits(DEFAULT_PRIMES, r, p, ip)
    digs = int_digits9(DEFAULT_PRIMES, v1, v2, v3)
    got = np.stack([np.asarray(d, np.int64) for d in digs], axis=-1)
    assert np.array_equal(got, want)


def test_deinterleave_matches_numpy():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=64 * 4).astype(np.uint8)
    got = native.deinterleave_i8(data, 64, 4)
    want = data.reshape(64, 4).astype(np.int8).astype(np.int32).T
    assert np.array_equal(got, want)
    back = native.interleave_u8(got, 64, 4)
    assert np.array_equal(back, data)
