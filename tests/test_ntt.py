"""NTT roundtrip + negacyclic convolution exactness vs bignum model."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops.ntt import get_ntt_context, ntt_fwd, ntt_inv
from fhe_ram_tpu.ops.modular import mul_mod, to_canonical


def negacyclic_conv_ref(a, b):
    """Exact negacyclic convolution with Python ints (object dtype)."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b[j])
            if k >= n:
                out[k - n] -= v
            else:
                out[k] += v
    return out


def _conv_via_ntt(ctx, a, b):
    """Pointwise multiply in NTT domain, invert, CRT-free single check per
    prime (returns centered residues [P, n])."""
    A = ntt_fwd(ctx, jnp.asarray(a, jnp.int32))
    B = ntt_fwd(ctx, jnp.asarray(b, jnp.int32))
    p, ip = ctx.consts(A.ndim)
    C = mul_mod(A, B, p, ip)
    c = ntt_inv(ctx, C)
    return np.asarray(to_canonical(c, p), dtype=np.int64)


def test_roundtrip():
    for n in (16, 64, 256):
        ctx = get_ntt_context(n, DEFAULT_PRIMES)
        rng = np.random.default_rng(2)
        x = rng.integers(-(2**16), 2**16, size=(5, n)).astype(np.int32)
        X = ntt_fwd(ctx, jnp.asarray(x))
        y = ntt_inv(ctx, X)
        p, _ = ctx.consts(y.ndim)
        yc = np.asarray(to_canonical(y, p), dtype=np.int64)
        for pi in range(len(DEFAULT_PRIMES)):
            assert np.array_equal(yc[pi], x), f"roundtrip failed n={n} prime={pi}"


def test_negacyclic_convolution_exact():
    n = 64
    ctx = get_ntt_context(n, DEFAULT_PRIMES)
    rng = np.random.default_rng(3)
    for trial in range(4):
        a = rng.integers(-(2**16), 2**16, size=n)
        b = rng.integers(-(2**16), 2**16, size=n)
        want = negacyclic_conv_ref(a, b)
        got = _conv_via_ntt(ctx, a, b)
        for pi, p in enumerate(DEFAULT_PRIMES):
            w = np.array([((v % p) + p) % p for v in want], dtype=np.int64)
            g = (got[pi] % p + p) % p
            assert np.array_equal(g, w), f"conv mismatch prime {p}"


def test_monomial_convolution():
    """X^k * a == rotate(a, k) through the NTT (validates twist/negacyclic)."""
    from fhe_ram_tpu.ops.poly import rotate

    n = 32
    ctx = get_ntt_context(n, DEFAULT_PRIMES)
    rng = np.random.default_rng(4)
    a = rng.integers(-(2**16), 2**16, size=n).astype(np.int32)
    for k in (0, 1, 5, n - 1):
        mono = np.zeros(n, dtype=np.int32)
        mono[k] = 1
        got = _conv_via_ntt(ctx, a, mono)
        want = np.asarray(rotate(jnp.asarray(a), k))
        for pi, p in enumerate(DEFAULT_PRIMES):
            assert np.array_equal((got[pi] - want) % p, np.zeros(n)), f"k={k} p={p}"


def test_batched_shapes():
    n = 32
    ctx = get_ntt_context(n, DEFAULT_PRIMES)
    x = np.arange(2 * 3 * n, dtype=np.int32).reshape(2, 3, n) % 7
    X = ntt_fwd(ctx, jnp.asarray(x))
    assert X.shape == (len(DEFAULT_PRIMES), 2, 3, n)
    y = ntt_inv(ctx, X)
    p, _ = ctx.consts(y.ndim)
    yc = np.asarray(to_canonical(y, p))
    for pi in range(len(DEFAULT_PRIMES)):
        assert np.array_equal(yc[pi], x)
