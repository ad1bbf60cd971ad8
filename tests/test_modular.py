"""Exactness tests for int32+float32 modular arithmetic against Python
bignum ground truth, including adversarial boundary values."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops import modular


def _check_contract(r, p, bound=0.501):
    assert np.all(np.abs(np.asarray(r)) <= bound * p + 1)


def test_reduce_once_exact():
    rng = np.random.default_rng(0)
    for p in DEFAULT_PRIMES:
        xs = np.concatenate(
            [
                rng.integers(-(2**30), 2**30, size=20000),
                np.array([0, 1, -1, 2**30 - 1, -(2**30) + 1, p, -p, p // 2, -(p // 2)]),
            ]
        ).astype(np.int64)
        pa = jnp.full(xs.shape, p, dtype=jnp.int32)
        ipa = jnp.full(xs.shape, np.float32(1.0 / p))
        r = np.asarray(modular.reduce_once(jnp.asarray(xs, dtype=jnp.int32), pa, ipa), dtype=np.int64)
        assert np.all((r - xs) % p == 0)
        _check_contract(r, p)


def test_mul_mod_exact_random():
    rng = np.random.default_rng(1)
    for p in DEFAULT_PRIMES:
        a = rng.integers(-int(2.6 * p), int(2.6 * p), size=50000).astype(np.int64)
        b = rng.integers(-int(1.01 * p), int(1.01 * p), size=50000).astype(np.int64)
        pa = jnp.full(a.shape, p, dtype=jnp.int32)
        ipa = jnp.full(a.shape, np.float32(1.0 / p))
        r = np.asarray(
            modular.mul_mod(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), pa, ipa),
            dtype=np.int64,
        )
        assert np.all((r - a * b) % p == 0)
        _check_contract(r, p)


def test_mul_mod_boundary():
    for p in DEFAULT_PRIMES:
        ext = [0, 1, -1, p - 1, -(p - 1), p, -p, p // 2, -(p // 2), int(2.6 * p), -int(2.6 * p)]
        bext = [0, 1, -1, p - 1, p // 2, -(p // 2), int(1.01 * p), -int(1.01 * p)]
        a, b = np.meshgrid(np.array(ext, dtype=np.int64), np.array(bext, dtype=np.int64))
        a, b = a.ravel(), b.ravel()
        pa = jnp.full(a.shape, p, dtype=jnp.int32)
        ipa = jnp.full(a.shape, np.float32(1.0 / p))
        r = np.asarray(
            modular.mul_mod(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), pa, ipa),
            dtype=np.int64,
        )
        assert np.all((r - a * b) % p == 0)
        _check_contract(r, p)


def test_to_canonical():
    for p in DEFAULT_PRIMES:
        x = np.array([0, 1, -1, p // 2, -(p // 2), int(0.501 * p), -int(0.501 * p)], dtype=np.int64)
        pa = jnp.full(x.shape, p, dtype=jnp.int32)
        r = np.asarray(modular.to_canonical(jnp.asarray(x, jnp.int32), pa), dtype=np.int64)
        assert np.all((r - x) % p == 0)
        assert np.all(np.abs(r) <= p // 2 + 1)
