"""GLWE ciphertexts over the limb torus: encrypt / decrypt / encode.

Layout: ct = int32[..., rank+1, L, N]; components a_0..a_{rank-1}, b last.
Convention: b = sum_i a_i * s_i + m + e, so phase(ct) = b - sum a_i s_i.

Reference counterparts: poulpy-core GLWE / GLWEEncryptSk / GLWEDecrypt /
encode_vec_i64 (consumed at /root/reference/src/ram.rs:334-380 and
examples/fhe-ram.rs:179-237).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..ops.ntt import NTTContext, ntt_fwd, ntt_inv
from ..ops.modular import mul_mod, reduce_once
from ..ops.crt import crt_fold
from ..ops import limb as limb_ops
from . import rng

I32 = jnp.int32


def secret_prepare(ctx: NTTContext, sk):
    """NTT-domain secret: int32[P, rank, N]."""
    return ntt_fwd(ctx, sk)


def _conv_with_secret(ctx: NTTContext, a, s_ntt, out_limbs: int):
    """sum_i a_i (*) s_i for a: int32[..., rank, L, N] torus limbs and
    s_ntt: [P, rank, N]. Returns torus limbs int32[..., out_limbs, N]
    (unnormalized)."""
    rank = a.shape[-3]
    a_ntt = ntt_fwd(ctx, a)  # [P, ..., rank, L, N]
    p, ip = ctx.consts(a_ntt.ndim - 1)
    acc = None
    for r in range(rank):
        s_b = s_ntt[:, r]
        s_b = s_b.reshape((s_b.shape[0],) + (1,) * (a_ntt.ndim - 3) + (s_b.shape[-1],))
        t = mul_mod(a_ntt[..., r, :, :], s_b, p, ip)
        acc = t if acc is None else acc + t
    if rank > 1:
        acc = reduce_once(acc, p, ip)
    conv = ntt_inv(ctx, acc)  # [P, ..., L, N] residues of exact int convs
    return crt_fold(ctx.primes, conv, 17, out_limbs, p, ip)


def _encrypt_impl(params: Params, ctx: NTTContext, s_ntt, pt, ka, ke):
    L = pt.shape[-2]
    n = pt.shape[-1]
    rank = params.rank
    a_shape = pt.shape[:-2] + (rank, L, n)
    a = rng.uniform_limbs(ka, a_shape)
    a = limb_ops.normalize(a)
    conv = _conv_with_secret(ctx, a, s_ntt, L)
    e = rng.gaussian_int(ke, pt.shape[:-2] + (n,), params.sigma)
    b = conv + pt
    b = b.at[..., L - 1, :].add(e)
    b = limb_ops.normalize(b)
    return jnp.concatenate([a, b[..., None, :, :]], axis=-3)


@lru_cache(maxsize=None)
def _encrypt_jit(params: Params):
    from ..ops.ntt import get_ntt_context
    import jax

    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda s_ntt, pt, ka, ke: _encrypt_impl(params, ctx, s_ntt, pt, ka, ke))


def encrypt(params: Params, ctx: NTTContext, s_ntt, pt, source: rng.Source):
    """Encrypt pt (torus limbs int32[..., L, N], normalized) under s.

    Returns ct int32[..., rank+1, L, N]. Noise sigma at the last limb
    scale (2^-(17L)), matching the reference's SIGMA=3.2 convention.
    Jit-compiled per (params, shape) -- client ops stay fast eagerly."""
    return _encrypt_jit(params)(s_ntt, pt, source.split(), source.split())


def _phase_impl(params: Params, ctx: NTTContext, s_ntt, ct):
    rank = params.rank
    a = ct[..., :rank, :, :]
    b = ct[..., rank, :, :]
    L = ct.shape[-2]
    conv = _conv_with_secret(ctx, a, s_ntt, L)
    return limb_ops.normalize(b - conv)


@lru_cache(maxsize=None)
def _phase_jit(params: Params):
    from ..ops.ntt import get_ntt_context
    import jax

    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda s_ntt, ct: _phase_impl(params, ctx, s_ntt, ct))


def phase(params: Params, ctx: NTTContext, s_ntt, ct):
    """Decrypt to the noisy phase: b - sum a_i s_i (normalized limbs)."""
    return _phase_jit(params)(s_ntt, ct)


def encode_vec(params: Params, values, limbs: int | None = None):
    """Encode an int vector [..., N] at precision k_pt into ct-limb layout
    (values * 2^-k_pt per coefficient).  Mirrors encode_vec_i64
    (reference: src/ram.rs:368)."""
    k = params.k_pt
    b = params.base2k
    L = limbs if limbs is not None else params.limbs_ct
    assert k <= b, "k_pt beyond one limb not wired"
    x = jnp.asarray(values, I32) << (b - k)
    out = jnp.zeros(x.shape[:-1] + (L, x.shape[-1]), dtype=I32)
    out = out.at[..., 0, :].set(x)
    return limb_ops.normalize(out)


def decode_coeff0(params: Params, phase_limbs, want: int | None = None):
    """Decode coefficient 0 at precision k_pt (numpy, client-side) and
    measure the log2 noise (mirrors decrypt_glwe,
    examples/fhe-ram.rs:212-237).

    Returns (value, noise_log2)."""
    x = np.asarray(phase_limbs, dtype=np.float64)
    L = x.shape[-2]
    t = 0.0
    for j in range(L):
        t += x[..., j, 0] * 2.0 ** (-17 * (j + 1))
    k = params.k_pt
    val = np.rint(t * 2.0**k).astype(np.int64)
    # centered mod 2^k
    m = 1 << k
    val = ((val + m // 2) % m) - m // 2
    if want is None:
        return val, None
    frac = t - np.float64(want) * 2.0**-k
    frac = frac - np.rint(frac)
    with np.errstate(divide="ignore"):
        noise = np.log2(np.maximum(np.abs(frac), 2.0**-120))
    return val, noise


def cast_u8_signed(value: int, bits: int) -> int:
    """Expected decode of a RAM byte at precision `bits`: the byte is
    stored as its signed-i8 value (src/ram.rs:365), decoding reduces it
    centered mod 2^bits (generalizes the example's cast_u8_to_signed,
    examples/fhe-ram.rs:25-32, to bits up to 9)."""
    v8 = value - 256 if value >= 128 else value
    m = 1 << bits
    return ((v8 + m // 2) % m) - m // 2
