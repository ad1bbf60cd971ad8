"""Client-side randomness: counter-based (threefry) PRNG wrappers.

Replaces the reference's seeded ChaCha `Source` (poulpy-hal;
examples/fhe-ram.rs:41-43, 32-byte seeds).  Determinism comes from fixed
seed material; we do not replicate the reference's byte streams
(ciphertext-level equality is not a goal -- decrypted-plaintext equality
is, see SURVEY.md §7 hard part 4).

Security note (seed entropy): a single threefry2x32 key holds only 64
bits of state, so masks drawn from ONE jax PRNG stream could be
recovered by brute-forcing 2^64 keys no matter how much seed entropy is
supplied.  `Source` therefore derives FOUR independent threefry keys
from disjoint 64-bit chunks of a 256-bit seed and every secret-relevant
sample (uniform mask limbs, gaussian noise) combines all four streams
(XOR for uniforms, sum of quarter-variance draws for gaussians), so
recovering the randomness requires guessing the full 256-bit seed
material.  `Source()` (no argument) seeds from os.urandom(32); small
integer seeds remain supported FOR REPRODUCIBLE TESTS AND BENCHMARKS
ONLY and carry no security claim.
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
_STREAMS = 4


def _seed_bytes(seed) -> bytes:
    """Normalize seed material to exactly 32 bytes."""
    if seed is None:
        return os.urandom(32)
    if isinstance(seed, (bytes, bytearray)):
        if len(seed) < 32:
            raise ValueError("byte seeds must supply >= 32 bytes of entropy")
        return bytes(seed[:32])
    if isinstance(seed, int):
        # deterministic expansion for test/bench reproducibility only
        return hashlib.shake_256(seed.to_bytes(16, "little", signed=True)).digest(32)
    raise TypeError(f"unsupported seed type {type(seed)!r}")


class Source:
    """Stateful split-on-demand PRNG key holder (client-side only).

    seed: None (default) -> os.urandom(32); bytes (>= 32) -> used
    directly; int -> deterministic expansion (tests/benchmarks only).
    """

    def __init__(self, seed=None):
        material = _seed_bytes(seed)
        keys = []
        for i in range(_STREAMS):
            chunk = material[8 * i : 8 * (i + 1)]
            keys.append(
                jax.random.PRNGKey(int.from_bytes(chunk, "little", signed=True)))
        self._keys = jnp.stack(keys)  # [_STREAMS, 2] uint32

    def split(self):
        """Return a [_STREAMS, 2] stacked key; advance all streams."""
        pairs = jax.vmap(jax.random.split)(self._keys)  # [S, 2, 2]
        self._keys = pairs[:, 0]
        return pairs[:, 1]


def _stream_keys(key):
    """Accept either a stacked [_STREAMS, 2] key or a legacy single key."""
    if key.ndim == 2:
        return [key[i] for i in range(key.shape[0])]
    return [key]


def uniform_limbs(key, shape, base2k: int = 17):
    """Uniform torus elements in canonical digit form [0, 2^base2k).

    XOR of all independent streams: uniform if ANY stream is uniform, so
    the combined output is computationally uniform unless every
    stream's key is known (see module docstring)."""
    out = None
    for k in _stream_keys(key):
        r = jax.random.randint(k, shape, 0, 1 << base2k, dtype=I32)
        out = r if out is None else out ^ r
    return out


def gaussian_int(key, shape, sigma: float):
    """Discrete gaussian (rounded continuous) as int32.

    Sum of per-stream draws at sigma/sqrt(S): N(0, sigma^2) overall, and
    the noise stays unpredictable unless every stream key is known."""
    ks = _stream_keys(key)
    s = sigma / float(np.sqrt(len(ks)))
    acc = None
    for k in ks:
        r = jax.random.normal(k, shape) * s
        acc = r if acc is None else acc + r
    return jnp.rint(acc).astype(I32)


def ternary_secret(key, rank: int, n: int, density: float = 0.5):
    """Sparse ternary secret with exact hamming weight density*n per
    component, balanced signs (reference: sk.fill_ternary_prob(0.5),
    examples/fhe-ram.rs:50-51; README security estimate uses exact
    SparseTernary(p=n/2)).

    The permutation is driven by uniform scores XORed across all
    streams (argsort of the combined scores), so the secret inherits the
    full seed entropy, not one 64-bit stream."""
    nz = int(round(n * density))
    template = np.zeros(n, dtype=np.int32)
    template[: nz // 2] = 1
    template[nz // 2 : nz] = -1
    template = jnp.asarray(template)
    ks = _stream_keys(key)
    out = []
    for r in range(rank):
        scores = None
        for i, k in enumerate(ks):
            k2 = jax.random.fold_in(k, r)
            s = jax.random.bits(k2, (n,), dtype=jnp.uint32)
            scores = s if scores is None else scores ^ s
        perm = jnp.argsort(scores)
        out.append(template[perm])
    return jnp.stack(out, axis=0)
