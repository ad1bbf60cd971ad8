"""CPU (interpret=True) correctness tests for the Pallas NTT kernels.

The kernels are the production TPU default (bench.py sets
FHERAM_NTT=pallas); these tests pin their semantics without TPU
hardware via the kernels' interpret mode:
  * forward -> inverse roundtrip is the identity on small coefficients,
  * a negacyclic convolution through the pallas spectrum equals both the
    butterfly backend's convolution and a numpy schoolbook model,
  * fused_external_pallas equals the composed fwd -> VMP -> inv path.
"""

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops.ntt import get_ntt_context, ntt_fwd, ntt_inv
from fhe_ram_tpu.ops.modular import mul_mod, reduce_once, to_canonical, prime_consts
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, ntt_fwd_pallas, ntt_inv_pallas, fused_external_pallas)

N = 4096
PRIMES = DEFAULT_PRIMES
PCTX = get_pallas_context(N, PRIMES)
CTX = get_ntt_context(N, PRIMES)


def _negacyclic_conv_naive(a, b):
    """Schoolbook negacyclic convolution over Z (exact, int64)."""
    n = len(a)
    full = np.convolve(a.astype(np.int64), b.astype(np.int64))
    out = full[:n].copy()
    out[: n - 1] -= full[n:]
    return out


def test_pallas_roundtrip_identity():
    rnd = np.random.default_rng(0)
    x = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(2, N)), jnp.int32)
    spec = ntt_fwd_pallas(PCTX, x, interpret=True)
    back = ntt_inv_pallas(PCTX, spec, interpret=True)
    # the inverse folds 1/N: residues mod every prime must equal x
    for pi, p in enumerate(PRIMES):
        got = np.asarray(to_canonical(back[pi], p))
        assert np.array_equal(got, np.asarray(x)), f"prime {p}"


def test_pallas_conv_matches_butterfly_and_naive():
    rnd = np.random.default_rng(1)
    a = rnd.integers(-(1 << 14), 1 << 14, size=N).astype(np.int32)
    b = rnd.integers(-(1 << 14), 1 << 14, size=N).astype(np.int32)
    want = _negacyclic_conv_naive(a, b)

    p, ip = prime_consts(PRIMES, 2)

    # pallas spectrum (its own order)
    fa = ntt_fwd_pallas(PCTX, jnp.asarray(a)[None], interpret=True)[:, 0]
    fb = ntt_fwd_pallas(PCTX, jnp.asarray(b)[None], interpret=True)[:, 0]
    prod = reduce_once(mul_mod(fa, fb, p, ip), p, ip)
    conv_pl = ntt_inv_pallas(PCTX, prod[:, None], interpret=True)[:, 0]

    # butterfly spectrum (different order; same convolution)
    fa2 = ntt_fwd(CTX, jnp.asarray(a))
    fb2 = ntt_fwd(CTX, jnp.asarray(b))
    prod2 = reduce_once(mul_mod(fa2, fb2, p, ip), p, ip)
    conv_bf = ntt_inv(CTX, prod2)

    for pi, pr in enumerate(PRIMES):
        w = np.asarray(to_canonical(jnp.asarray(want % pr), np.int32(pr)))
        w = np.where(w > pr // 2, w - pr, w)
        got_pl = np.asarray(to_canonical(conv_pl[pi], pr))
        got_bf = np.asarray(to_canonical(conv_bf[pi], pr))
        assert np.array_equal(got_pl, w), f"pallas vs naive, prime {pr}"
        assert np.array_equal(got_bf, w), f"butterfly vs naive, prime {pr}"


def test_fused_external_matches_composed():
    rnd = np.random.default_rng(2)
    B, T, M = 2, 3, 2
    x = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(B, T, N)), jnp.int32)
    keys_coeff = jnp.asarray(rnd.integers(-4, 5, size=(T, M, N)), jnp.int32)
    keys_ntt = ntt_fwd_pallas(PCTX, keys_coeff, interpret=True)  # [P, T, M, N]

    fused = fused_external_pallas(PCTX, x, keys_ntt, interpret=True)

    # composed: fwd all digits, pointwise multiply-accumulate, inverse
    fx = ntt_fwd_pallas(PCTX, x, interpret=True)  # [P, B, T, N]
    p, ip = prime_consts(PRIMES, 4)
    acc = jnp.zeros((len(PRIMES), B, M, N), jnp.int32)
    for t in range(T):
        acc = acc + mul_mod(fx[:, :, t][:, :, None], keys_ntt[:, t][:, None], p, ip)
    acc = reduce_once(acc, p, ip)
    composed = ntt_inv_pallas(PCTX, acc.reshape(len(PRIMES), B * M, N),
                              interpret=True).reshape(len(PRIMES), B, M, N)

    for pi, pr in enumerate(PRIMES):
        got = np.asarray(to_canonical(fused[pi], pr))
        want = np.asarray(to_canonical(composed[pi], pr))
        assert np.array_equal(got, want), f"prime {pr}"


def test_fused_fold_kernel_matches_composed():
    """v2 kernel (in-VMEM Garner+fold+normalize epilogue + fused base):
    must equal the v1-kernel + ops.crt.crt_fold + normalize chain."""
    from fhe_ram_tpu.ops.crt import crt_fold
    from fhe_ram_tpu.ops import limb as limb_ops
    from fhe_ram_tpu.ops.ntt_pallas import fused_external_fold_pallas

    rnd = np.random.default_rng(3)
    B, C2, Lk, Lout, T = 1, 2, 4, 3, 6
    M = C2 * Lk
    x = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(B, T, N)), jnp.int32)
    keys_coeff = jnp.asarray(rnd.integers(-3, 4, size=(T, M, N)), jnp.int32)
    keys_ntt = ntt_fwd_pallas(PCTX, keys_coeff, interpret=True)

    conv = fused_external_pallas(PCTX, x, keys_ntt, interpret=True)
    p, ip = prime_consts(PRIMES, conv.ndim)
    conv = conv.reshape(len(PRIMES), B, C2, Lk, N)
    ks = limb_ops.normalize(crt_fold(PRIMES, conv, 17, Lout, p, ip))

    base = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, C2, Lout, N)), jnp.int32)
    want = limb_ops.normalize(base - ks)
    got = fused_external_fold_pallas(PCTX, x, keys_ntt[:, None], Lout, C2,
                                     base=base, sign=-1, interpret=True)
    # the kernel adds base to the RAW folded limbs (one normalize);
    # compare at the torus level (balanced representations may differ)
    tf = limb_ops.torus_float
    d = np.abs(tf(np.asarray(got)) - tf(np.asarray(want)))
    d = np.minimum(d, 1.0 - d)
    assert d.max() < 2.0 ** -49, d.max()


def test_fused_fold_chain_matches_sequential():
    """digits=2 chained grid (VMEM scratch carry between digit steps)
    must equal two sequential single-digit kernel calls bit-exactly."""
    from fhe_ram_tpu.ops.ntt_pallas import fused_external_fold_pallas

    rnd = np.random.default_rng(7)
    B, C2, Lout = 2, 2, 3
    T = C2 * Lout  # chain invariant: output limbs feed the next digit
    M = C2 * Lout
    x = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, T, N)), jnp.int32)
    keys_coeff = jnp.asarray(rnd.integers(-3, 4, size=(2, T, M, N)), jnp.int32)
    keys_ntt = jnp.stack(
        [ntt_fwd_pallas(PCTX, keys_coeff[d], interpret=True) for d in range(2)],
        axis=1)  # [P, 2, T, M, N]

    s1 = fused_external_fold_pallas(PCTX, x, keys_ntt[:, :1], Lout, C2,
                                    interpret=True)
    s2 = fused_external_fold_pallas(PCTX, s1.reshape(B, T, N),
                                    keys_ntt[:, 1:], Lout, C2, interpret=True)
    chained = fused_external_fold_pallas(PCTX, x, keys_ntt, Lout, C2,
                                         interpret=True)
    assert np.array_equal(np.asarray(chained), np.asarray(s2))

    # spectral-input variant (shared fwd NTT hoisted out, batched reads)
    xn = ntt_fwd_pallas(PCTX, x, interpret=True)  # [P, B, T, N]
    spec = fused_external_fold_pallas(PCTX, xn, keys_ntt[:, :1], Lout, C2,
                                      x_is_ntt=True, interpret=True)
    assert np.array_equal(np.asarray(spec), np.asarray(s1))

    # per-item-keys batched variant: item a uses keys_ntt digit a
    from fhe_ram_tpu.ops.ntt_pallas import fused_external_fold_batched

    xb = jnp.stack([x, x + 1], axis=0)  # [A=2, B, T, N]
    kb = jnp.stack([keys_ntt[:, :1], keys_ntt[:, 1:]], axis=0)
    got = fused_external_fold_batched(PCTX, xb, kb, Lout, C2, interpret=True)
    want0 = s1
    want1 = fused_external_fold_pallas(PCTX, x + 1, keys_ntt[:, 1:], Lout, C2,
                                       interpret=True)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want0))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want1))

    # per-item base fusion (VM CMux): normalize(base + conv) in-epilogue,
    # tbf=1 (no padding waste for B == 1 rows)
    from fhe_ram_tpu.ops import limb as limb_ops
    basev = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(2, B, C2, Lout, N)), jnp.int32)
    gotb = fused_external_fold_batched(PCTX, xb, kb, Lout, C2,
                                       base=basev, tbf=1, interpret=True)
    for a in range(2):
        raw = fused_external_fold_batched(PCTX, xb[a : a + 1], kb[a : a + 1],
                                          Lout, C2, tbf=1, interpret=True)[0]
        tf = limb_ops.torus_float
        want = limb_ops.normalize(basev[a] + raw)
        d = np.abs(tf(np.asarray(gotb[a])) - tf(np.asarray(want)))
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 2.0 ** -49, (a, d.max())

    # SHARED-spectral chained variant (batched level-0): one spectral
    # operand for every item, digit 0 consumes it, digit 1 transforms
    # the VMEM carry -- must equal the per-item coefficient chain
    kb2 = jnp.stack([keys_ntt, jnp.roll(keys_ntt, 1, axis=-1)], axis=0)
    got2 = fused_external_fold_batched(PCTX, xn, kb2, Lout, C2,
                                       x_is_ntt=True, interpret=True)
    for a in range(2):
        want = fused_external_fold_pallas(PCTX, x, kb2[a], Lout, C2,
                                          interpret=True)
        assert np.array_equal(np.asarray(got2[a]), np.asarray(want)), a
