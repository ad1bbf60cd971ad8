"""FheUint: encrypted machine words for the Phantom-VM components.

Two forms, mirroring poulpy-schemes' bdd_arithmetic (consumed by the
reference at src/arithmetic.rs:6-9, src/store.rs:11-13,
src/conversion.rs:9):

  * FheUint "word" form: ONE GLWE with bit j of the value encoded as
    bit * 2^-k_pt at coefficient j * gap, gap = N / bits.  (The
    reference's partial trace keeping T::LOG_BITS slots implies exactly
    this stride layout, src/arithmetic.rs:228.)
  * FheUintPrepared: per-bit GGSW(bit_j) in NTT domain,
    int32[P, W, D, C, C2, Lg, N] -- the form consumed by CMux-based
    blind rotations and circuits.

TPU-first notes: all W bits' GGSWs are stacked so per-bit CMuxes run as
single batched external products (core/ggsw.external_product_batched).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext
from ..ops import limb as limb_ops
from ..core import glwe, ggsw, rng

I32 = jnp.int32


def gap(params: Params, bits: int = 32) -> int:
    assert params.n % bits == 0
    return params.n // bits


def encrypt_word(params: Params, ctx: NTTContext, s_ntt, value: int,
                 source: rng.Source, bits: int = 32):
    """FheUint word-form GLWE of `value`."""
    g = gap(params, bits)
    vals = np.zeros(params.n, dtype=np.int64)
    for j in range(bits):
        vals[j * g] = (value >> j) & 1
    pt = glwe.encode_vec(params, jnp.asarray(vals))
    return glwe.encrypt(params, ctx, s_ntt, pt, source)


def encrypt_prepared(params: Params, ctx: NTTContext, s_ntt, value: int,
                     source: rng.Source, bits: int = 32,
                     dnum: int | None = None, limbs: int | None = None):
    """FheUintPrepared: stacked prepared GGSW(bit_j),
    int32[P, W, D, C, C2, Lg, N].

    dnum/limbs default to the ct-level GGSW layout; pass
    (dnum_ggsw, limbs_evk_ggsw) for the GGSW-apply parameterization used
    by the FheUint->Address conversion (the applying GGSW must carry one
    digit per limb of the target GGSW's rows, cf. the reference test's
    k_ggsw_apply > k_ggsw_res at src/conversion.rs:118-137)."""
    digs = []
    for j in range(bits):
        # fresh buffer per bit: jnp.asarray can alias numpy memory
        # zero-copy on CPU, and async dispatch would race with reuse
        mono = np.zeros(params.n, dtype=np.int32)
        mono[0] = (value >> j) & 1
        digs.append(ggsw.encrypt(params, ctx, s_ntt, jnp.asarray(mono), source,
                                 dnum=dnum, limbs=limbs))
    stacked = jnp.stack(digs, axis=0)  # [W, D, C, C2, Lg, N]
    return ggsw.prepare(ctx, stacked)  # [P, W, ...]


def decrypt_word(params: Params, ctx: NTTContext, s_ntt, ct,
                 bits: int = 32) -> int:
    """Decode a word-form FheUint back to an integer (client-side)."""
    g = gap(params, bits)
    ph = np.asarray(glwe.phase(params, ctx, s_ntt, ct))
    t = limb_ops.torus_float(ph)
    out = 0
    for j in range(bits):
        b = int(np.rint(t[j * g] * (1 << params.k_pt))) & 1
        out |= b << j
    return out


def trivial_word(params: Params, slot_vals, bits: int = 32):
    """Noise-free 'encryption' (zero mask) of per-slot integer values.
    slot_vals: int array [W] placed at coefficients j*gap."""
    g = gap(params, bits)
    n = params.n
    vals = np.zeros(n, dtype=np.int64)
    for j, v in enumerate(slot_vals):
        vals[j * g] = int(v)
    pt = glwe.encode_vec(params, jnp.asarray(vals))
    C = params.rank + 1
    ct = jnp.zeros((C, params.limbs_ct, n), dtype=I32)
    return ct.at[params.rank].set(pt)
