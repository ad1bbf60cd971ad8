"""CRT (Garner) reconstruction of exact integer convolution results and
folding into base-2^17 torus limbs -- int32-only.

After `ntt_inv` we hold, per prime, the centered residues of the true
integer negacyclic-convolution coefficients.  The true integers are
bounded by B = T * N * 2^16 * 2^16 (T = number of accumulated
digit-convolutions, <= 8) ~ 2^48 << M/2 ~ 2^57.4, so balanced Garner
mixed-radix digits reconstruct them exactly:

    x = v1 + p1*(v2 + p2*v3),   |vi| <= pi/2.

Because x can exceed int32, it is never materialized: it is expanded into
balanced base-2^9 digits (constants p1, p1*p2 are pre-split into 9-bit
chunks so every product fits int32), then the digits are shifted into the
destination base-2^17 limb accumulator.

Reference counterpart: the FFT64 backend's iDFT + float->torus rounding
(spqlios, consumed at e.g. /root/reference/src/coordinate_prepared.rs:155
via glwe_external_product).  Ours is exact.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .modular import mul_mod, to_canonical

I32 = jnp.int32

_D9 = 9           # digit width for the constant splits
_NDIG = 8         # base-2^9 digits covering |x| < 2^63


def accumulation_bound_log2(t_rows: int, n: int, base2k: int = 17) -> float:
    """log2 of the worst-case true-integer magnitude of one folded
    convolution accumulation: t_rows digit-row negacyclic convolutions,
    each summing n products of balanced base-2^base2k operands
    (|digit|, |key limb| <= 2^(base2k-1)).

    Why a 2-prime basis is OUT (round-4 feasibility analysis, see
    BENCH_NOTES.md "2-prime CRT"): exact reconstruction needs
    prod(primes) > 2 * bound.  With the Barrett-exactness prime cap
    (~2^19.6, ops/modular.py), two primes give capacity ~2^37.9 while
    the bound is 2^47 at the full gadget (t_rows = 8) and 2^45 even at
    the theoretical minimum t_rows = 2 -- and the CENTRAL-LIMIT 6-sigma
    magnitude (~2^38.6, unsound for cryptographic correctness anyway)
    still exceeds the capacity.  Closing the gap via a smaller limb
    base (2^13-ish) raises limb/digit counts ~35-100% across every
    transform and VMP -- strictly more work than the 1/3 saved by
    dropping a prime; 24-bit primes break int32/f32 Barrett exactness
    and would force double-word arithmetic into every pointwise op."""
    import math

    return math.log2(t_rows) + math.log2(n) + 2.0 * (base2k - 1)


def basis_capacity_log2(primes) -> float:
    """log2 of the largest integer magnitude a CRT basis reconstructs
    exactly from balanced residues: prod(primes)/2."""
    import math

    return math.log2(float(np.prod([float(p) for p in primes]))) - 1.0


@lru_cache(maxsize=8)
def garner_consts(primes: tuple[int, ...]):
    """Precomputed Garner constants for a 3-prime basis."""
    p1, p2, p3 = primes
    inv_p1_mod_p2 = pow(p1, p2 - 2, p2)
    inv_p1p2_mod_p3 = pow(p1 * p2 % p3, p3 - 2, p3)
    p1_mod_p3 = p1 % p3

    def split9(v: int, ndig: int):
        return [(v >> (_D9 * i)) & ((1 << _D9) - 1) for i in range(ndig)]

    return {
        "c12": inv_p1_mod_p2,
        "c123": inv_p1p2_mod_p3,
        "p1_mod_p3": p1_mod_p3,
        "p1_digits": split9(p1, 3),
        "p1p2_digits": split9(p1 * p2, 5),
    }


def garner_digits(primes, r, p, inv_p):
    """Balanced mixed-radix digits (v1, v2, v3) from residues r[P, ...].

    r: int32[P, ...] balanced-lazy residues (|.| <= 0.6p).
    Returns three int32[...] arrays with |vi| <= pi/2."""
    assert len(primes) == 3, "garner wired for 3 primes"
    g = garner_consts(tuple(primes))
    r1, r2, r3 = r[0], r[1], r[2]
    p1, p2, p3 = p[0], p[1], p[2]
    ip2, ip3 = inv_p[1], inv_p[2]

    v1 = to_canonical(r1, p1)
    # v2 = (r2 - v1) * p1^-1 mod p2 ; |r2 - v1| <= 0.6p2 + p1/2 <= 2^20
    c12 = jnp.asarray(np.int32(g["c12"] - (primes[1] if g["c12"] > primes[1] // 2 else 0)))
    v2 = to_canonical(mul_mod(r2 - v1, c12, p2, ip2), p2)
    # v3 = ((r3 - v1) - p1*v2) * (p1 p2)^-1 mod p3
    p1m3 = g["p1_mod_p3"]
    p1m3_c = jnp.asarray(np.int32(p1m3 - (primes[2] if p1m3 > primes[2] // 2 else 0)))
    t = to_canonical(mul_mod(v2, p1m3_c, p3, ip3), p3)
    c123 = jnp.asarray(np.int32(g["c123"] - (primes[2] if g["c123"] > primes[2] // 2 else 0)))
    v3 = to_canonical(mul_mod(r3 - v1 - t, c123, p3, ip3), p3)
    return v1, v2, v3


def int_digits9(primes, v1, v2, v3):
    """Expand x = v1 + p1 v2 + p1p2 v3 into balanced base-2^9 digits.

    Returns int32[..., _NDIG] with |d| <= 2^8 and
    x == sum_k d[..., k] * 2^(9k)."""
    g = garner_consts(tuple(primes))
    cols = [jnp.zeros_like(v1) for _ in range(_NDIG)]
    cols[0] = cols[0] + v1
    for j, c in enumerate(g["p1_digits"]):
        if c:
            cols[j] = cols[j] + np.int32(c) * v2
    for j, c in enumerate(g["p1p2_digits"]):
        if c:
            cols[j] = cols[j] + np.int32(c) * v3
    # sequential balanced carry propagation
    digits = []
    carry = jnp.zeros_like(v1)
    for k in range(_NDIG):
        t = cols[k] + carry
        d = ((t + (1 << (_D9 - 1))) & ((1 << _D9) - 1)) - (1 << (_D9 - 1))
        carry = (t - d) >> _D9
        digits.append(d)
    return digits  # list of int32[...], len _NDIG (top carry dropped: |x| < 2^62)


def fold_int_to_limbs(digits, key_limb: int, base2k: int, out_limbs: int, acc):
    """Scatter base-2^9 digits of an integer that carries torus weight
    2^-(base2k*(key_limb+1)) into a base-2^17 limb accumulator.

    acc: int32[..., out_limbs, N] updated functionally (returned).
    Contributions with weight >= 1 vanish mod 1; contributions finer than
    the last limb are dropped (same truncation as the reference's result
    normalization)."""
    w = base2k * (key_limb + 1)  # the integer x multiplies 2^-w
    for k, d in enumerate(digits):
        e = _D9 * k - w  # this digit has weight 2^e
        if e >= 0:
            continue  # integer part, vanishes mod 1
        t = (-e - 1) // base2k  # destination limb index
        if t >= out_limbs:
            continue  # below output precision
        s = e + base2k * (t + 1)  # 0 <= s < base2k
        acc = acc.at[..., t, :].add(d << s)
    return acc


def crt_fold(primes, conv, base2k: int, out_limbs: int, p, inv_p):
    """Full pipeline: per-prime conv residues -> exact limb contributions.

    conv: int32[P, ..., Lk, N] (Lk = key limb axis, balanced residues).
    Returns int32[..., out_limbs, N] -- unnormalized limb accumulator
    holding sum_l conv_int[..., l, :] * 2^-(base2k*(l+1))."""
    Lk = conv.shape[-2]
    v1, v2, v3 = garner_digits(primes, conv, p, inv_p)
    digits = int_digits9(primes, v1, v2, v3)  # each [..., Lk, N]
    out_shape = v1.shape[:-2] + (out_limbs,) + v1.shape[-1:]
    acc = jnp.zeros(out_shape, dtype=I32)
    for l in range(Lk):
        dl = [d[..., l, :] for d in digits]
        acc = fold_int_to_limbs(dl, l, base2k, out_limbs, acc)
    return acc
