"""Base-2^17 signed-limb torus arithmetic (int32, vectorized).

A torus element t in [-1/2, 1/2) is stored as int32[..., L, N] with
t = sum_j limb[..., j, :] * 2^-(17*(j+1)).  After `normalize`, limbs are
balanced: |limb| <= 2^16.  This mirrors the reference's VecZnx base2k
layout (poulpy-hal; SURVEY.md §2.2) -- gadget decomposition of a
normalized ciphertext is simply its limbs.

TPU notes: carry propagation is sequential in the (tiny) limb axis and
fully vectorized over N -- a handful of fused VPU ops under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32


def normalize(x, base2k: int = 17):
    """Carry-propagate limbs to the balanced range |limb| <= 2^(base2k-1).

    x: int32[..., L, N] with |limb| < ~2^29 (so carries fit).
    The carry out of limb 0 (integer part) is dropped (torus mod 1)."""
    L = x.shape[-2]
    b = base2k
    half = 1 << (b - 1)
    mask = (1 << b) - 1
    out = [None] * L
    carry = None
    for j in range(L - 1, -1, -1):
        t = x[..., j, :] if carry is None else x[..., j, :] + carry
        d = ((t + half) & mask) - half
        carry = (t - d) >> b
        out[j] = d
    return jnp.stack(out, axis=-2)


def add(x, y):
    return x + y


def sub(x, y):
    return x - y


def negate(x):
    return -x


def shift_right(x, bits: int, base2k: int = 17):
    """Exact torus division by 2^bits of balanced limbs (bits < base2k).

    The low `bits` of limb j move down to limb j+1; the last limb's low
    bits are truncated (2^-(17L - bits) rounding).  Used to pre-scale
    trace/packing inputs by 1/N resp. 1/M so the subsequent automorphism
    sums need no mid-loop division (see core/keyswitch.trace for why
    mid-loop halving is unsound)."""
    assert 0 < bits < base2k
    L = x.shape[-2]
    mask = (1 << bits) - 1
    out = []
    for j in range(L):
        h = x[..., j, :] >> bits
        if j > 0:
            h = h + ((x[..., j - 1, :] & mask) << (base2k - bits))
        out.append(h)
    return jnp.stack(out, axis=-2)


def halve(x, base2k: int = 17):
    return shift_right(x, 1, base2k)


def resize_limbs(x, new_l: int):
    """Truncate or zero-extend the limb axis (precision change)."""
    L = x.shape[-2]
    if new_l <= L:
        return x[..., :new_l, :]
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, new_l - L)
    return jnp.pad(x, pad)


def encode_value(value, k: int, limbs: int, n: int, base2k: int = 17, index: int = 0):
    """Encode integer `value` at torus precision 2^-k into limb layout
    (coefficient `index`), i.e. value * 2^-k as a torus element.

    Mirrors GLWEPlaintext::encode_coeff_i64 (reference example usage:
    examples/fhe-ram.rs:196)."""
    t = (k + base2k - 1) // base2k  # lowest limb touched
    s = base2k * t - k + base2k * 0
    # value * 2^-k = value * 2^(base2k*t - k) * 2^(-base2k*t)
    # place into limb t-1 (weight 2^-(base2k*t)) with shift s
    assert t >= 1 and t <= limbs
    out = jnp.zeros((limbs, n), dtype=I32)
    out = out.at[t - 1, index].set(jnp.asarray(value, dtype=I32) << s)
    return normalize(out, base2k)


def decode_coeff(limbs_arr, k: int, base2k: int = 17, index: int = 0):
    """Decode coefficient `index` at precision k: round(t * 2^k) as int.

    Returns a Python int (numpy path; not jitted -- client-side op)."""
    import numpy as np

    x = np.asarray(limbs_arr)
    L = x.shape[-2]
    val = 0.0
    for j in range(L):
        val += float(x[j, index]) * 2.0 ** (-base2k * (j + 1))
    return int(np.rint(val * 2.0**k))


def torus_float(limbs_arr, base2k: int = 17):
    """Torus value(s) as float64 numpy array (client-side; for noise
    measurement in tests, mirrors decrypt_glwe noise calc in
    examples/fhe-ram.rs:212-237)."""
    import numpy as np

    x = np.asarray(limbs_arr, dtype=np.float64)
    L = x.shape[-2]
    w = np.array([2.0 ** (-base2k * (j + 1)) for j in range(L)])
    return np.tensordot(w, x, axes=([0], [x.ndim - 2]))
