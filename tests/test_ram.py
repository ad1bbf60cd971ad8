"""End-to-end FHE-RAM tests mirroring the reference integration driver
(examples/fhe-ram.rs): keygen -> encrypt RAM -> encrypt address -> read ->
read_prepare_write -> write -> read-back, with value equality and noise
bound assertions at every step."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import (
    PARAMS_TEST_SMALL, PARAMS_TEST_FLAT, PARAMS_TEST_SMALL_WIDE,
    PARAMS_TEST_3LVL)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def build(par, seed=7):
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    server = ram_mod.FheRam(par, ekp)
    return ctx, src, s_ntt, server


def check_word(par, ctx, s_ntt, out, data, idx, note=""):
    W = par.word_size
    for i in range(W):
        want = glwe.cast_u8_signed(int(data[idx * W + i]), par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, out[i])
        val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want, f"{note} subram {i}: {val} != {want}"
        assert noise < -(par.k_pt + 1), f"{note} noise {noise}"


@pytest.mark.parametrize(
    "par", [PARAMS_TEST_FLAT, PARAMS_TEST_SMALL, PARAMS_TEST_SMALL_WIDE],
    ids=["flat_n2_1", "tree_n2_2", "wide_digit"])
def test_read(par):
    ctx, src, s_ntt, server = build(par)
    rnd = np.random.default_rng(11)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    for idx in [0, 1, par.max_addr // 2 + 3, par.max_addr - 1]:
        addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
        ap = address_mod.prepare(ctx, addr)
        out = server.read(server.init_state(ram_ct), ap)
        check_word(par, ctx, s_ntt, np.asarray(out), data, idx, f"read idx={idx}")


@pytest.mark.parametrize("par", [PARAMS_TEST_FLAT, PARAMS_TEST_SMALL],
                         ids=["flat_n2_1", "tree_n2_2"])
def test_read_batch_matches_single(par):
    """read_batch (shared-NTT + batch-gridded path on TPU, lax.map
    fallback elsewhere) must decode identically to per-address reads."""
    ctx, src, s_ntt, server = build(par, seed=9)
    rnd = np.random.default_rng(13)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    idxs = [0, par.max_addr - 1, int(rnd.integers(0, par.max_addr))]
    aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
           for i in idxs]
    coords_b = tuple(
        jnp.stack([a.coordinates[j] for a in aps], axis=0)
        for j in range(len(aps[0].coordinates)))

    outs = server.read_batch(server.init_state(ram_ct), coords_b)
    assert outs.shape[0] == len(idxs)
    for b, idx in enumerate(idxs):
        check_word(par, ctx, s_ntt, np.asarray(outs[b]), data, idx,
                   f"batch idx={idx}")


def test_read_cached_matches_plain():
    """read/read_batch with the spectral cache must decode identically
    (the cache is the level-0 fwd transform, skipped per call)."""
    par = PARAMS_TEST_SMALL_WIDE
    ctx, src, s_ntt, server = build(par, seed=21)
    rnd = np.random.default_rng(23)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    st = server.init_state(ram_ct)
    cache = server.spectral_cache(st)

    idxs = [3, par.max_addr - 2]
    aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
           for i in idxs]
    for idx, ap in zip(idxs, aps):
        out = server.read(st, ap, cache=cache)
        check_word(par, ctx, s_ntt, np.asarray(out), data, idx,
                   f"cached read idx={idx}")
    coords_b = tuple(
        jnp.stack([a.coordinates[j] for a in aps], axis=0)
        for j in range(len(aps[0].coordinates)))
    outs = server.read_batch(st, coords_b, cache=cache)
    for b, idx in enumerate(idxs):
        check_word(par, ctx, s_ntt, np.asarray(outs[b]), data, idx,
                   f"cached batch idx={idx}")


def test_read_batch_sliced(monkeypatch):
    """B > _BATCH_CHUNK runs HBM-bounded slices (full lax.map slices +
    a remainder call) and must decode identically."""
    par = PARAMS_TEST_SMALL
    ctx, src, s_ntt, server = build(par, seed=10)
    rnd = np.random.default_rng(17)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    monkeypatch.setattr(ram_mod, "_BATCH_CHUNK", 2)
    idxs = [0, 1, par.max_addr - 1, int(rnd.integers(0, par.max_addr)),
            par.max_addr // 2]  # 2 full slices + remainder of 1
    aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
           for i in idxs]
    coords_b = tuple(
        jnp.stack([a.coordinates[j] for a in aps], axis=0)
        for j in range(len(aps[0].coordinates)))

    outs = server.read_batch(server.init_state(ram_ct), coords_b)
    assert outs.shape[0] == len(idxs)
    for b, idx in enumerate(idxs):
        check_word(par, ctx, s_ntt, np.asarray(outs[b]), data, idx,
                   f"sliced batch idx={idx}")


@pytest.mark.parametrize(
    "par", [PARAMS_TEST_FLAT, PARAMS_TEST_SMALL, PARAMS_TEST_SMALL_WIDE,
            PARAMS_TEST_3LVL],
    ids=["flat_n2_1", "tree_n2_2", "wide_digit", "tree_n2_3"])
def test_read_write_cycle(par):
    ctx, src, s_ntt, server = build(par, seed=8)
    rnd = np.random.default_rng(12)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    idx = int(rnd.integers(0, par.max_addr))
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    ap = address_mod.prepare(ctx, addr)

    st = server.init_state(ram_ct)

    # protocol guard: write before read_prepare_write must refuse
    new_word = rnd.integers(0, 256, size=par.word_size).astype(np.uint8)
    w_ct = ram_mod.encrypt_write_word(par, ctx, s_ntt, new_word, src)
    with pytest.raises(AssertionError):
        server.write(st, w_ct, addr)

    # read_prepare_write returns the same value as read
    out, st = server.read_prepare_write(st, ap)
    check_word(par, ctx, s_ntt, np.asarray(out), data, idx, "rpw")

    # protocol guard: read / rpw while a write is pending must refuse
    with pytest.raises(AssertionError):
        server.read(st, ap)
    with pytest.raises(AssertionError):
        server.read_prepare_write(st, ap)

    # write the new word
    st = server.write(st, w_ct, addr)
    data[idx * par.word_size : (idx + 1) * par.word_size] = new_word

    # read back at the written address
    out = server.read(st, ap)
    check_word(par, ctx, s_ntt, np.asarray(out), data, idx, "read-back")

    # other addresses must be untouched
    for other in [(idx + 1) % par.max_addr, (idx + par.max_addr // 2) % par.max_addr]:
        a2 = address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, other, src))
        out2 = server.read(st, a2)
        check_word(par, ctx, s_ntt, np.asarray(out2), data, other, f"other idx={other}")


def test_batch_pack_schedules_equivalent():
    """The SLICED (per-address lax.map, default) and FOLDED batched-pack
    schedules must produce bit-identical batched reads (round-4: the
    sliced hybrid fixes the folded schedule's +48% per-row glue
    degradation at large batches; see BENCH_NOTES)."""
    par = PARAMS_TEST_SMALL
    ctx, src, s_ntt, server = build(par, seed=23)
    rnd = np.random.default_rng(29)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    aps = [address_mod.prepare(
        ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
        for i in [3, 77, 201, 255]]
    coords_b = tuple(
        jnp.stack([a.coordinates[i] for a in aps], axis=0)
        for i in range(len(aps[0].coordinates)))
    atk = server.keys.atk_glwe
    old = ram_mod._BATCH_PACK_SLICED
    try:
        ram_mod._BATCH_PACK_SLICED = True
        sliced = np.asarray(ram_mod.read_batch_impl(
            par, ctx, ram_ct, coords_b, atk))
        ram_mod._BATCH_PACK_SLICED = False
        folded = np.asarray(ram_mod.read_batch_impl(
            par, ctx, ram_ct, coords_b, atk))
        # hybrid depth (round 5): shallow per-address + deep folded.
        # PARAMS_TEST_SMALL packs 4 leaves/address; stop at 2 nodes.
        ram_mod._BATCH_PACK_SLICED = True
        old_deep = ram_mod._BATCH_PACK_DEEP
        ram_mod._BATCH_PACK_DEEP = 2
        try:
            hybrid = np.asarray(ram_mod.read_batch_impl(
                par, ctx, ram_ct, coords_b, atk))
        finally:
            ram_mod._BATCH_PACK_DEEP = old_deep
    finally:
        ram_mod._BATCH_PACK_SLICED = old
    assert np.array_equal(sliced, folded)
    assert np.array_equal(sliced, hybrid)


@pytest.mark.parametrize(
    "par", [PARAMS_TEST_FLAT, PARAMS_TEST_SMALL, PARAMS_TEST_3LVL],
    ids=["flat_n2_1", "tree_n2_2", "tree_n2_3"])
def test_rmw_batch(par):
    """Batched read-modify-write (rmw_batch_impl, round 4): B distinct
    addresses read their pre-write values and all B words land; other
    addresses are untouched.  Enabled by the exact-data-carry write
    (deltas add on the original data)."""
    ctx, src, s_ntt, server = build(par, seed=31)
    rnd = np.random.default_rng(37)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    idxs = [2, 9, par.max_addr - 3]
    addrs = [address_mod.encrypt(par, ctx, s_ntt, i, src) for i in idxs]
    aps = [address_mod.prepare(ctx, a) for a in addrs]
    coords_prep = tuple(
        jnp.stack([a.coordinates[i] for a in aps], axis=0)
        for i in range(len(aps[0].coordinates)))
    coords_coeff = tuple(
        jnp.stack([a.coordinates[i] for a in addrs], axis=0)
        for i in range(len(addrs[0].coordinates)))
    new_words = rnd.integers(0, 256,
                             size=(len(idxs), par.word_size)).astype(np.uint8)
    w_b = jnp.stack([
        ram_mod.encrypt_write_word(par, ctx, s_ntt, nw, src)
        for nw in new_words], axis=0)

    state = server.init_state(ram_ct)
    outs, state = server.rmw_batch(state, coords_prep, coords_coeff, w_b)
    outs = np.asarray(outs)

    # 1. the batched read-outs are the PRE-write values
    for b, idx in enumerate(idxs):
        check_word(par, ctx, s_ntt, outs[b], data, idx, f"rmw out b={b}")

    # 2. all B new words landed
    for b, idx in enumerate(idxs):
        ap2 = address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt,
                                                           idx, src))
        got = np.asarray(server.read(state, ap2))
        check_word(par, ctx, s_ntt, got, new_words.reshape(-1), b,
                   f"rmw landed b={b}")

    # 3. untouched address intact
    other = 5
    assert other not in idxs
    ap3 = address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt,
                                                       other, src))
    got = np.asarray(server.read(state, ap3))
    check_word(par, ctx, s_ntt, got, data, other, "rmw untouched")
