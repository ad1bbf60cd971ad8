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


def test_fused_pack_tree_matches_composed():
    """The one-launch pack tree must equal the per-level fused merges
    (which test_fused_pack_merge_matches_composed pins to the composed
    rotate/automorphism/keyswitch path)."""
    from fhe_ram_tpu.ops.ntt_pallas import fused_pack_tree_pallas

    rnd = np.random.default_rng(7)
    M, nb, rank, L, Lk = 8, 3, 1, 3, 4
    C2 = rank + 1
    levels = M.bit_length() - 1
    gals = [(N >> l) + 1 for l in range(levels)]
    keys = {g: _rand_keys(rnd, 1, rank * L, C2 * Lk)[0] for g in gals}
    cts = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(M, nb, C2, L, N)), jnp.int32)

    cur = cts
    for l in range(levels - 1, -1, -1):
        t = 1 << l
        g = (N >> l) + 1
        A = cur[:t].reshape(-1, C2, L, N)
        B = cur[t : 2 * t].reshape(-1, C2, L, N)
        out = fused_pack_merge_pallas(PCTX, A, B, t, g, keys[g],
                                      interpret=True)
        cur = out.reshape(t, nb, C2, L, N)
    want = cur[0]

    ks = jnp.stack([keys[(N >> (levels - 1 - si)) + 1]
                    for si in range(levels)])
    got = fused_pack_tree_pallas(PCTX, cts, ks, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fused_dp_chain_matches_composed(monkeypatch):
    """The one-launch carry-DP chain (fused_dp_chain_pallas, via
    vm/arithmetic._dp_group_fused) must be bit-exact vs the REAL
    composed _dp_group loop run through the same interpret-mode pallas
    kernels: same spectrum, per-bit keyed CMux calls vs in-VMEM chain.

    Ops cover every static-table branch: emit (addi), subtab+emit (sub),
    and the slt MSB-flip variant selected at grid step d == 0."""
    from fhe_ram_tpu.params import PARAMS_README_2_18 as par
    from fhe_ram_tpu.ops import ntt as ntt_mod
    from fhe_ram_tpu.ops import ntt_pallas as ntt_pallas_mod
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import ggsw
    from fhe_ram_tpu.vm import arithmetic, circuits

    rnd = np.random.default_rng(7)
    bits = 4
    ops = ("addi", "sub", "slt")
    C = par.rank + 1
    D = par.limbs_ct
    Lg = 4  # key limbs (the VM bit GGSWs' k_ggsw = 68 = 4 * base2k)

    def rand_prep():
        kc = jnp.asarray(rnd.integers(
            -3, 4, size=(bits, D, C, C, Lg, N)), jnp.int32)
        return ntt_fwd_pallas(PCTX, kc, interpret=True)

    rs1p, rs2p, immp = rand_prep(), rand_prep(), rand_prep()
    ctx = get_ntt_context(par.n, par.primes)

    # composed reference: the real _dp_group per-bit loop, with its
    # keyed CMuxes routed through the interpret-mode pallas kernels
    monkeypatch.setattr(ntt_pallas_mod, "fused_path_active", lambda n: False)
    monkeypatch.setattr(ntt_mod, "get_backend", lambda: "pallas")
    monkeypatch.setattr(
        circuits, "cmux_keyed",
        lambda params, cctx, bp, h, l, trunc=(None, None):
        ggsw.external_product_keyed(
            params, cctx, h - l, bp, base=l, trunc=trunc, interpret=True))
    want = arithmetic._dp_group(par, ctx, ops, rs1p, rs2p, immp, bits)

    got = arithmetic._dp_group_fused(par, ctx, ops, rs1p, rs2p, immp, bits,
                                     interpret=True)
    for op in ops:
        assert np.array_equal(np.asarray(got[op]), np.asarray(want[op])), op


def test_fused_bitwise_matches_composed(monkeypatch):
    """The one-launch bitwise truth-table kernel (fused_bitwise_pallas,
    via vm/arithmetic._bitwise_group_fused) must be bit-exact vs the
    REAL composed two-level keyed-CMux loop run through the same
    interpret-mode pallas kernels."""
    from fhe_ram_tpu.params import PARAMS_README_2_18 as par
    from fhe_ram_tpu.ops import ntt as ntt_mod
    from fhe_ram_tpu.ops import ntt_pallas as ntt_pallas_mod
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import ggsw
    from fhe_ram_tpu.vm import arithmetic, circuits

    rnd = np.random.default_rng(11)
    bits = 4
    ops = ("xori", "and", "or")
    C = par.rank + 1
    D = par.limbs_ct
    Lg = 4
    ctx = get_ntt_context(par.n, par.primes)

    def rand_prep():
        kc = jnp.asarray(rnd.integers(
            -3, 4, size=(bits, D, C, C, Lg, N)), jnp.int32)
        return ntt_fwd_pallas(PCTX, kc, interpret=True)

    rs1p, rs2p, immp = rand_prep(), rand_prep(), rand_prep()

    monkeypatch.setattr(ntt_pallas_mod, "fused_path_active", lambda n: False)
    monkeypatch.setattr(ntt_mod, "get_backend", lambda: "pallas")
    monkeypatch.setattr(
        circuits, "cmux_keyed",
        lambda params, cctx, bp, h, l, trunc=(None, None):
        ggsw.external_product_keyed(
            params, cctx, h - l, bp, base=l, trunc=trunc, interpret=True))
    want = arithmetic._bitwise_group(par, ctx, ops, rs1p, rs2p, immp, bits)

    got = arithmetic._bitwise_group_fused(par, ctx, ops, rs1p, rs2p, immp,
                                          bits, interpret=True)
    for op in ops:
        assert np.array_equal(np.asarray(got[op]), np.asarray(want[op])), op


def test_fused_blind_rotate_matches_composed(monkeypatch):
    """The one-launch blind-rotation chain (fused_blind_rotate_pallas)
    must be bit-exact vs the REAL composed CMux loops in
    vm/arithmetic.glwe_blind_rotation and
    vm/conversion.scalar_to_ggsw_blind_rotation, run through the same
    interpret-mode pallas kernels."""
    from fhe_ram_tpu.params import PARAMS_README_2_18 as par
    from fhe_ram_tpu.ops import ntt as ntt_mod
    from fhe_ram_tpu.ops import ntt_pallas as ntt_pallas_mod
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import ggsw
    from fhe_ram_tpu.vm import arithmetic, circuits, conversion

    rnd = np.random.default_rng(9)
    C2 = par.rank + 1
    L = par.limbs_ct
    Lg = 4
    W = 6
    ctx = get_ntt_context(par.n, par.primes)

    def rand_prep(D, Lgk):
        kc = jnp.asarray(rnd.integers(
            -3, 4, size=(W, D, C2, C2, Lgk, N)), jnp.int32)
        return ntt_fwd_pallas(PCTX, kc, interpret=True)

    monkeypatch.setattr(ntt_pallas_mod, "fused_path_active", lambda n: False)
    monkeypatch.setattr(ntt_mod, "get_backend", lambda: "pallas")
    monkeypatch.setattr(
        circuits, "cmux",
        lambda params, cctx, bp, h, l: ggsw.external_product_batched(
            params, cctx, h - l, bp, base=l, interpret=True))
    monkeypatch.setattr(
        circuits, "cmux_keyed",
        lambda params, cctx, bp, h, l, trunc=(None, None):
        ggsw.external_product_keyed(
            params, cctx, h - l, bp, base=l, trunc=trunc, interpret=True))

    # arithmetic path: single ct, L ct limbs, negated amounts with lsh
    prep = rand_prep(L, Lg)
    ct = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(C2, L, N)), jnp.int32)
    want = arithmetic.glwe_blind_rotation(par, ctx, ct, prep, 1, 4, lsh=2)
    got = circuits.blind_rotate_fused(
        par, ct[None], prep, range(1, 4),
        [-1 << (k - 1 + 2) for k in range(1, 4)], interpret=True)[0]
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # conversion path: D*C2 rows at the GGSW parameterization (exercises
    # the TBT row blocking), positive amounts
    D = par.limbs_ggsw
    prep_g = rand_prep(D, par.limbs_evk_ggsw)
    tv = np.zeros(par.n, dtype=np.int32)
    tv[0] = 1
    want = conversion.scalar_to_ggsw_blind_rotation(
        par, ctx, tv, prep_g, rsh=2, mask_bits=3, lsh=1, negate=False)
    real_brf = circuits.blind_rotate_fused
    monkeypatch.setattr(ntt_pallas_mod, "fused_path_active", lambda n: True)
    monkeypatch.setattr(
        circuits, "blind_rotate_fused",
        lambda *a, **kw: real_brf(*a, **{**kw, "interpret": True}))
    got = conversion.scalar_to_ggsw_blind_rotation(
        par, ctx, tv, prep_g, rsh=2, mask_bits=3, lsh=1, negate=False)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fused_split_matches_composed():
    """fused_split_pallas (ONE keyswitch, two outputs, glue in-VMEM)
    must be bit-exact with the composed halved-split formula:
    child0 = x + KS(sigma_g x) (trace step), child1 = X^-t(2x - child0)
    (core/keyswitch.extract_slots composed branch)."""
    from fhe_ram_tpu.ops.ntt_pallas import fused_split_pallas

    rnd = np.random.default_rng(7)
    B, rank, L, Lk = 3, 1, 3, 4
    C2 = rank + 1
    ct = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(B, C2, L, N)),
                     jnp.int32)
    for l in (0, 3, 5):
        g = (N >> l) + 1
        t = 1 << l
        keys = _rand_keys(rnd, 1, rank * L, C2 * Lk)[0]  # [P, T, M, N]

        # composed reference: the full trace step (base = x + embed(
        # sigma_g b)), then the rotation identity for child1
        ct_g = poly.automorphism(ct, g)
        x = ct_g[:, :rank].reshape(B, rank * L, N)
        b_emb = ct_g[:, rank][:, None]
        pad = jnp.zeros((B, C2 - 1, L, N), dtype=I32)
        base = jnp.concatenate([pad, b_emb], axis=-3) + ct
        c0_want = fused_external_fold_pallas(
            PCTX, x, keys[:, None], L, C2, base=base, sign=-1,
            interpret=True)
        c1_want = limb_ops.normalize(poly.rotate(2 * ct - c0_want, -t))

        c0, c1 = fused_split_pallas(PCTX, ct, t, g, keys, interpret=True)
        assert np.array_equal(np.asarray(c0), np.asarray(c0_want)), f"l={l} c0"
        assert np.array_equal(np.asarray(c1), np.asarray(c1_want)), f"l={l} c1"


def test_fused_split_tree_matches_per_level():
    """fused_split_tree_pallas (ALL split levels in one launch, state
    doubling in VMEM) must be bit-exact vs the per-level
    fused_split_pallas loop in extract_slots' concat layout."""
    from fhe_ram_tpu.ops.ntt_pallas import (
        fused_split_pallas, fused_split_tree_pallas)

    rnd = np.random.default_rng(13)
    nb, rank, L, Lk = 2, 1, 3, 4
    C2 = rank + 1
    ct = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)),
                     jnp.int32)
    for S in (1, 3):
        gals = tuple((N >> l) + 1 for l in range(S))
        keys = {g: _rand_keys(rnd, 1, rank * L, C2 * Lk)[0] for g in gals}

        # per-level reference in the extract_slots layout
        nodes = ct[:, None]  # [nb, 1, C2, L, N]
        for l in range(S):
            g = gals[l]
            flat = nodes.reshape((-1,) + nodes.shape[-3:])
            c0, c1 = fused_split_pallas(PCTX, flat, 1 << l, g, keys[g],
                                        interpret=True)
            c0 = c0.reshape(nodes.shape)
            c1 = c1.reshape(nodes.shape)
            nodes = jnp.concatenate([c0, c1], axis=1)

        got = fused_split_tree_pallas(
            PCTX, ct, gals, jnp.stack([keys[g] for g in gals]),
            interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(nodes)), S
