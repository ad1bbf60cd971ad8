"""Garner reconstruction + limb folding exactness vs bignum model."""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops.modular import prime_consts
from fhe_ram_tpu.ops.crt import garner_digits, int_digits9, crt_fold
from fhe_ram_tpu.ops.limb import normalize, torus_float


def _residues(xs):
    P = len(DEFAULT_PRIMES)
    r = np.zeros((P,) + xs.shape, dtype=np.int64)
    for pi, p in enumerate(DEFAULT_PRIMES):
        m = np.mod(xs, p)
        r[pi] = np.where(m > p // 2, m - p, m)
    return r


def test_garner_and_digits_reconstruct():
    rng = np.random.default_rng(5)
    # worst-case external-product magnitudes ~2^48, plus boundary values
    xs = np.concatenate(
        [
            rng.integers(-(2**48), 2**48, size=2000),
            np.array([0, 1, -1, 2**48, -(2**48), 2**52, -(2**52)]),
        ]
    )
    r = jnp.asarray(_residues(xs.astype(object).astype(np.int64)), dtype=jnp.int32)
    p, ip = prime_consts(DEFAULT_PRIMES, r.ndim)
    v1, v2, v3 = garner_digits(DEFAULT_PRIMES, r, p, ip)
    digits = int_digits9(DEFAULT_PRIMES, v1, v2, v3)
    recon = np.zeros(xs.shape, dtype=object)
    for k, d in enumerate(digits):
        recon += np.asarray(d, dtype=np.int64).astype(object) * (2 ** (9 * k))
    assert np.all(recon == xs.astype(object)), "garner+digits reconstruction failed"


def test_crt_fold_to_limbs():
    """Folding integer conv results (weight 2^-17(l+1)) into limbs must
    reproduce the real-valued sum to output precision."""
    rng = np.random.default_rng(6)
    n, Lk, Lout = 8, 4, 3
    conv_int = rng.integers(-(2**40), 2**40, size=(Lk, n))
    r = jnp.asarray(_residues(conv_int), dtype=jnp.int32)
    p, ip = prime_consts(DEFAULT_PRIMES, r.ndim)
    acc = crt_fold(DEFAULT_PRIMES, r, 17, Lout, p, ip)
    out = np.asarray(normalize(acc), dtype=np.int64)
    # exact integer comparison at scale 2^68: got/want * 2^68 as ints
    scale = 17 * Lk  # 68
    mod = 1 << scale
    for i in range(n):
        W = 0
        for l in range(Lk):
            W += int(conv_int[l, i]) << (scale - 17 * (l + 1))
        G = 0
        for j in range(Lout):
            G += int(out[j, i]) << (scale - 17 * (j + 1))
        d = (G - W) % mod
        if d > mod // 2:
            d -= mod
        # dropped sub-limb digits contribute < 2^(scale - 17*Lout + 10)
        assert abs(d) < 1 << (scale - 17 * Lout + 10), (i, d)


def test_accumulation_bound_covered_by_3_primes_not_by_2():
    """The CRT-basis feasibility arithmetic behind BENCH_NOTES.md
    "2-prime CRT: priced out": the 3-prime basis covers the worst-case
    external-product accumulation; ANY 2-prime sub-basis (and any pair
    of primes under the Barrett cap 2^19.6) does not -- even at the
    READOPT-truncated row count or the theoretical minimum T=2."""
    from fhe_ram_tpu.ops.crt import accumulation_bound_log2, basis_capacity_log2

    n = 4096
    cap3 = basis_capacity_log2(DEFAULT_PRIMES)
    assert accumulation_bound_log2(8, n) < cap3      # full gadget: 2^47
    assert accumulation_bound_log2(4, n) < cap3      # READOPT reads
    for drop in range(3):
        pair = tuple(p for i, p in enumerate(DEFAULT_PRIMES) if i != drop)
        cap2 = basis_capacity_log2(pair)
        assert accumulation_bound_log2(2, n) > cap2  # even T=2 overflows
    # the hard cap: two maximal Barrett-exact primes still fall short
    cap2_max = basis_capacity_log2((793559, 793561))  # ~2^19.6 each
    assert accumulation_bound_log2(2, n) > cap2_max + 6  # >64x short
