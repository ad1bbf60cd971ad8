"""Negacyclic polynomial index ops: rotations (X^k) and Galois
automorphisms (X -> X^g), as precomputed gather permutations.

In R = Z[X]/(X^N+1):
  * rotate_k:  X^i -> X^(i+k), wrapping with sign flip (X^N = -1).
  * automorphism sigma_g: sum a_i X^i -> sum a_i sign(g,i) X^(g*i mod N),
    g odd (or any integer treated mod 2N; g = -1 is the inversion map).

Tables are numpy-precomputed per (n, g) / (n, k) and cached; application
is a single `take` + sign multiply along the last axis, which XLA lowers
to an efficient TPU gather.

Reference counterparts: VecZnxRotate / automorphism application inside
GLWEAutomorphismKey ops (poulpy; consumed at e.g. src/ram.rs:629,
src/coordinate_prepared.rs:119-142).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

I32 = jnp.int32


def rotate(x, k: int):
    """Multiply by X^k (static k). x: int32[..., N].

    Lowered as slice+concat+negate, not a gather: a minor-dim scalar
    gather serializes on TPU, while slices are plain copies."""
    n = x.shape[-1]
    k = k % (2 * n)
    neg = k >= n
    k %= n
    if k == 0:
        return -x if neg else x
    lo = -x[..., n - k :]
    hi = x[..., : n - k]
    out = jnp.concatenate([lo, hi], axis=-1)
    return -out if neg else out


@lru_cache(maxsize=None)
def _auto_tables(n: int, g: int):
    """Gather tables for sigma_g: out[j] = sign[j] * in[src[j]]."""
    g = g % (2 * n)
    assert g % 2 == 1, "galois element must be odd"
    j = np.arange(n)
    dst = (g * j) % (2 * n)
    pos = dst % n
    sgn = np.where(dst < n, 1, -1)
    # invert the permutation: out[pos[i]] = sgn[i] * in[i]
    src = np.zeros(n, dtype=np.int64)
    src[pos] = j
    sign = np.zeros(n, dtype=np.int64)
    sign[pos] = sgn
    return src.astype(np.int32), sign.astype(np.int32)


def automorphism(x, g: int):
    """Apply sigma_g (static galois element g). x: int32[..., N]."""
    n = x.shape[-1]
    src, sign = _auto_tables(n, g)
    return jnp.take(x, jnp.asarray(src), axis=-1) * jnp.asarray(sign)


