"""READ-path gadget truncation (params.Params.read_ks_digits ff.).

The read pipeline may decompose fewer input digits against fewer
evaluation-key limbs -- a priced noise trade that never touches the
write path (read results are ephemeral).  Pinned here:

  * interpret-mode bit-exactness of the truncated fused trace / pack
    merge kernels vs the composed truncated keyswitch path,
  * end-to-end decode correctness of a truncated read (small ring,
    composed CPU path), measured noise within the analytic bound,
  * read_batch consistency under truncation,
  * the noise model: PARAMS_2_18_READOPT's analytic read bound clears
    the decode requirement and its refresh budget is IDENTICAL to the
    untruncated wide config (the write path is untouched).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from dataclasses import replace

from fhe_ram_tpu.params import (
    DEFAULT_PRIMES, PARAMS_TEST_SMALL_WIDE, PARAMS_TEST_SMALL,
    PARAMS_2_18_WIDE, PARAMS_2_18_READOPT)
from fhe_ram_tpu.ops import poly
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops.ntt_pallas import (
    get_pallas_context, ntt_fwd_pallas, fused_external_fold_pallas,
    fused_trace_pallas, fused_pack_merge_pallas, I32)
from fhe_ram_tpu.core import glwe, keys, rng, noise
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod

N = 4096
PCTX = get_pallas_context(N, DEFAULT_PRIMES)

TRUNC = dict(read_ks_digits=2, read_ks_limbs=3,
             read_ep_digits=2, read_ep_limbs=3)
PAR_TRUNC = replace(PARAMS_TEST_SMALL_WIDE, **TRUNC)


def _rand_keys(rnd, S, T, M):
    kc = jnp.asarray(rnd.integers(-3, 4, size=(S, T, M, N)), jnp.int32)
    return jnp.stack(
        [ntt_fwd_pallas(PCTX, kc[s], interpret=True) for s in range(S)],
        axis=0)


def _composed_trunc_step(ct, key_step, g, Td, base_extra=None):
    """One composed truncated trace step: decompose only the top Td
    limbs of sigma_g(ct)'s a-part (key_step already sliced to T=rank*Td
    rows and its kept limbs)."""
    B, C2, L, n = ct.shape
    rank = C2 - 1
    ct_g = poly.automorphism(ct, g)
    x = ct_g[:, :rank, :Td].reshape(B, rank * Td, n)
    b_emb = ct_g[:, rank][:, None]
    pad = jnp.zeros((B, C2 - 1, L, n), dtype=I32)
    base = jnp.concatenate([pad, b_emb], axis=-3)
    if base_extra is not None:
        base = base + base_extra
    return fused_external_fold_pallas(
        PCTX, x, key_step[:, None], L, C2, base=base, sign=-1,
        interpret=True)


def test_fused_trace_truncated_matches_composed():
    rnd = np.random.default_rng(21)
    B, rank, L, Td, Lkr, S = 2, 1, 3, 2, 3, 3
    C2 = rank + 1
    gals = tuple((N >> k) + 1 for k in range(S))
    keys_t = _rand_keys(rnd, S, rank * Td, C2 * Lkr)
    ct0 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, C2, L, N)), jnp.int32)
    ct = ct0
    for s, g in enumerate(gals):
        ct = _composed_trunc_step(ct, keys_t[s], g, Td, base_extra=ct)
    got = fused_trace_pallas(PCTX, ct0, keys_t, gals, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ct))


def test_fused_pack_merge_truncated_matches_composed():
    rnd = np.random.default_rng(22)
    nb, rank, L, Td, Lkr = 3, 1, 3, 2, 3
    C2 = rank + 1
    t, g = 8, (N >> 3) + 1
    key = _rand_keys(rnd, 1, rank * Td, C2 * Lkr)[0]
    A = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)), jnp.int32)
    B_ = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(nb, C2, L, N)), jnp.int32)
    xb = poly.rotate(B_, t)
    u, v = A + xb, A - xb
    ct_g = poly.automorphism(v, g)
    x = ct_g[:, :rank, :Td].reshape(nb, rank * Td, N)
    b_emb = ct_g[:, rank][:, None]
    pad = jnp.zeros((nb, C2 - 1, L, N), dtype=I32)
    base = jnp.concatenate([pad, b_emb], axis=-3) + u
    want = fused_external_fold_pallas(
        PCTX, x, key[:, None], L, C2, base=base, sign=-1, interpret=True)
    got = fused_pack_merge_pallas(PCTX, A, B_, t, g, key, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def _build(par, seed=7):
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    return ctx, src, s_ntt, ram_mod.FheRam(par, ekp)


def test_truncated_read_decodes():
    """E2E truncated read on the composed CPU path: exact decode at
    every index class, measured noise within the analytic bound."""
    par = PAR_TRUNC
    ctx, src, s_ntt, server = _build(par)
    rnd = np.random.default_rng(11)
    data = rnd.integers(0, 256,
                        size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    state = server.init_state(ram_ct)
    bound = noise.read_noise_log2(par)
    assert bound < -(par.k_pt + 1)
    for idx in [0, 1, par.max_addr // 2 + 3, par.max_addr - 1]:
        ap = address_mod.prepare(
            ctx, address_mod.encrypt(par, ctx, s_ntt, idx, src))
        out = np.asarray(server.read(state, ap))
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(
                int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out[i])
            val, nz = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (idx, i, val, want)
            assert nz < bound + 1.0, (nz, bound)  # 6-sigma bound + slack


def test_truncated_read_batch_matches_single():
    par = PAR_TRUNC
    ctx, src, s_ntt, server = _build(par, seed=9)
    rnd = np.random.default_rng(13)
    data = rnd.integers(0, 256,
                        size=par.max_addr * par.word_size).astype(np.uint8)
    state = server.init_state(ram_mod.encrypt_ram(par, ctx, s_ntt, data, src))
    idxs = [3, par.max_addr - 2]
    aps = [address_mod.prepare(
        ctx, address_mod.encrypt(par, ctx, s_ntt, i, src)) for i in idxs]
    stacked = tuple(
        jnp.stack([a.coordinates[i] for a in aps], axis=0)
        for i in range(len(aps[0].coordinates)))
    outs = np.asarray(server.read_batch(state, stacked))
    for b, idx in enumerate(idxs):
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(
                int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, outs[b, i])
            val, _ = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (idx, i, val, want)


def test_truncated_rmw_cycle():
    """rpw truncates only its final trace (output-ephemeral); the write
    path stays full precision -- the cycle must decode exactly and the
    stored data's read-back must stay correct."""
    par = PAR_TRUNC
    ctx, src, s_ntt, server = _build(par, seed=5)
    rnd = np.random.default_rng(17)
    data = rnd.integers(0, 256,
                        size=par.max_addr * par.word_size).astype(np.uint8)
    state = server.init_state(ram_mod.encrypt_ram(par, ctx, s_ntt, data, src))
    idx = par.max_addr // 3
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    ap = address_mod.prepare(ctx, addr)
    out, state = server.read_prepare_write(state, ap)
    for i in range(par.word_size):
        want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]),
                                   par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, np.asarray(out)[i])
        val, _ = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want
    neww = [7, 42, 0, 255][: par.word_size]
    wct = ram_mod.encrypt_write_word(par, ctx, s_ntt, neww, src)
    state = server.write(state, wct, addr)
    ap2 = address_mod.prepare(
        ctx, address_mod.encrypt(par, ctx, s_ntt, idx, src))
    out2 = np.asarray(server.read(state, ap2))
    for i in range(par.word_size):
        want = glwe.cast_u8_signed(int(neww[i]), par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, out2[i])
        val, _ = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want


def test_readopt_noise_model():
    """PARAMS_2_18_READOPT: analytic read bound clears decode with
    margin; refresh budget is IDENTICAL to the wide config (truncation
    never touches the write path)."""
    b = noise.read_noise_log2(PARAMS_2_18_READOPT)
    assert b < -(PARAMS_2_18_READOPT.k_pt + 1) - 3  # >= 3 bits of margin
    assert (noise.refresh_budget(PARAMS_2_18_READOPT)
            == noise.refresh_budget(PARAMS_2_18_WIDE))
    # truncation strictly increases the priced read noise
    assert b > noise.read_noise_log2(PARAMS_2_18_WIDE)


def test_trunc_params_validation():
    with pytest.raises(AssertionError):
        replace(PARAMS_TEST_SMALL, read_ep_digits=2)  # chained digits
    with pytest.raises(AssertionError):
        replace(PARAMS_TEST_SMALL_WIDE, read_ks_digits=4)  # > limbs_ct
