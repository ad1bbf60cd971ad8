"""Client-side randomness: counter-based (threefry) PRNG wrappers.

Replaces the reference's seeded ChaCha `Source` (poulpy-hal;
examples/fhe-ram.rs:41-43).  Determinism comes from fixed integer seeds;
we do not replicate the reference's byte streams (ciphertext-level
equality is not a goal -- decrypted-plaintext equality is, see SURVEY.md
§7 hard part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32


class Source:
    """Stateful split-on-demand PRNG key holder (client-side only)."""

    def __init__(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def split(self):
        self._key, k = jax.random.split(self._key)
        return k


def uniform_limbs(key, shape, base2k: int = 17):
    """Uniform torus elements in canonical digit form [0, 2^base2k)."""
    return jax.random.randint(key, shape, 0, 1 << base2k, dtype=I32)


def gaussian_int(key, shape, sigma: float):
    """Discrete gaussian (rounded continuous) as int32."""
    return jnp.rint(jax.random.normal(key, shape) * sigma).astype(I32)


def ternary_secret(key, rank: int, n: int, density: float = 0.5):
    """Sparse ternary secret with exact hamming weight density*n per
    component, balanced signs (reference: sk.fill_ternary_prob(0.5),
    examples/fhe-ram.rs:50-51; README security estimate uses exact
    SparseTernary(p=n/2))."""
    nz = int(round(n * density))
    template = np.zeros(n, dtype=np.int32)
    template[: nz // 2] = 1
    template[nz // 2 : nz] = -1
    out = []
    for r in range(rank):
        key, k = jax.random.split(key)
        out.append(jax.random.permutation(k, jnp.asarray(template)))
    return jnp.stack(out, axis=0)
