"""CPU (interpret=True) tests for the fused automorphism-keyswitch
chain kernels: in-kernel signed permutations, the one-launch trace
chain, and the pack merge level with in-kernel glue.

These kernels replace the composed per-step path (XLA automorphism
gather + fused_external_fold_pallas launch per step) on the TPU; here
we pin bit-exactness against that composed path."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fhe_ram_tpu.params import DEFAULT_PRIMES
from fhe_ram_tpu.ops import poly
from fhe_ram_tpu.ops import limb as limb_ops
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, ntt_fwd_pallas, fused_external_fold_pallas,
    fused_trace_pallas, fused_pack_merge_pallas,
    _perm_tile_tables, _perm_apply, _SL, _LN, I32)

N = 4096
PCTX = get_pallas_context(N, DEFAULT_PRIMES)


def _perm_debug(x, g, t):
    tabs = [jnp.asarray(v) for v in _perm_tile_tables(N, g, t)]

    def kernel(x_ref, plr, psr, wmr, sgr, o_ref):
        o_ref[...] = _perm_apply(x_ref[...], plr[...], psr[...],
                                 wmr[...], sgr[...])

    x4 = x.reshape(-1, _SL, _LN)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x4.shape, I32),
        interpret=True)(x4, *tabs)
    return out.reshape(x.shape)


def test_perm_tiles_match_poly_ops():
    rnd = np.random.default_rng(0)
    x = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(3, N)), jnp.int32)
    for g in [(N >> k) + 1 for k in range(12)] + [5, 2 * N - 1]:
        want = np.asarray(poly.automorphism(x, g))
        got = np.asarray(_perm_debug(x, g, 0))
        assert np.array_equal(got, want), f"automorphism g={g}"
    for t in [0, 1, 64, 1000, 4095, 4096, 8191]:
        want = np.asarray(poly.rotate(x, t))
        got = np.asarray(_perm_debug(x, 1, t))
        assert np.array_equal(got, want), f"rotate t={t}"


def _composed_step(ct, key_step, g, base_extra=None):
    """One composed trace/merge keyswitch step, mirroring
    core/keyswitch.keyswitch's pallas branch with ct -> sigma_g(ct)."""
    B, C2, L, n = ct.shape
    rank = C2 - 1
    ct_g = poly.automorphism(ct, g)
    x = ct_g[:, :rank].reshape(B, rank * L, n)
    b_emb = ct_g[:, rank][:, None]
    pad = jnp.zeros((B, C2 - 1, L, n), dtype=I32)
    base = jnp.concatenate([pad, b_emb], axis=-3)
    if base_extra is not None:
        base = base + base_extra
    return fused_external_fold_pallas(
        PCTX, x, key_step[:, None], L, C2, base=base, sign=-1,
        interpret=True)


def _rand_keys(rnd, S, T, M):
    kc = jnp.asarray(rnd.integers(-3, 4, size=(S, T, M, N)), jnp.int32)
    return jnp.stack(
        [ntt_fwd_pallas(PCTX, kc[s], interpret=True) for s in range(S)],
        axis=0)  # [S, P, T, M, N]


def test_fused_trace_matches_composed():
    rnd = np.random.default_rng(1)
    B, rank, L, Lk, S = 2, 1, 3, 4, 3
    C2 = rank + 1
    gals = tuple((N >> k) + 1 for k in range(S))
    keys = _rand_keys(rnd, S, rank * L, C2 * Lk)
    ct0 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, C2, L, N)), jnp.int32)

    ct = ct0
    for s, g in enumerate(gals):
        ct = _composed_step(ct, keys[s], g, base_extra=ct)
    got = fused_trace_pallas(PCTX, ct0, keys, gals, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ct))


def test_fused_trace_single_step_matches_composed():
    """S == 1 takes the static-descriptor path (identity permutation
    matmuls skipped for g = N/2^l + 1, l <= 5) -- must stay bit-exact."""
    rnd = np.random.default_rng(4)
    B, rank, L, Lk = 2, 1, 3, 4
    C2 = rank + 1
    for l in (0, 5, 11):  # identity-perm, identity-perm, full-perm
        g = (N >> l) + 1
        keys = _rand_keys(rnd, 1, rank * L, C2 * Lk)
        ct0 = jnp.asarray(
            rnd.integers(-(1 << 16), 1 << 16, size=(B, C2, L, N)), jnp.int32)
        want = _composed_step(ct0, keys[0], g, base_extra=ct0)
        got = fused_trace_pallas(PCTX, ct0, keys, (g,), interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(want)), l


def test_fused_pack_merge_matches_composed():
    rnd = np.random.default_rng(2)
    nb, rank, L, Lk = 3, 1, 3, 4  # nb=3 exercises the TBT padding
    C2 = rank + 1
    l = 4
    t = 1 << l
    g = (N >> l) + 1
    keys = _rand_keys(rnd, 1, rank * L, C2 * Lk)[0]
    A = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)), jnp.int32)
    B = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)), jnp.int32)

    xb = poly.rotate(B, t)
    u = A + xb
    v = A - xb
    want = _composed_step(v, keys, g, base_extra=u)
    got = fused_pack_merge_pallas(PCTX, A, B, t, g, keys, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))
