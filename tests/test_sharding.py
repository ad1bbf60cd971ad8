"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 test plan item 5): sharded results must equal single-device
results exactly (integer arithmetic => bit-exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def world():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(3)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    rnd = np.random.default_rng(21)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    idxs = [1, 17, 100, 255]
    aps = [address_mod.prepare(ctx, address_mod.encrypt(PAR, ctx, s_ntt, i, src))
           for i in idxs]
    return ctx, s_ntt, ekp, data, ram_ct, idxs, aps


def test_batched_read_sharded_matches_single(world):
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    mesh = mesh_mod.make_mesh(8, rows=2)
    coords = mesh_mod.stack_addresses(aps)

    data_sh = mesh_mod.shard_data_rows(mesh, ram_ct)
    coords_sh = mesh_mod.shard_addr_batch(mesh, coords)
    atk_sh = jax.device_put(ekp.atk_glwe, mesh_mod.replicated(mesh))

    fn = mesh_mod.batched_read_fn(PAR, mesh)
    out_sh = np.asarray(fn(data_sh, coords_sh, atk_sh))

    server = ram_mod.FheRam(PAR, ekp)
    for b, ap in enumerate(aps):
        out1 = np.asarray(server.read(server.init_state(ram_ct), ap))
        assert np.array_equal(out_sh[b], out1), f"batch {b} mismatch"


def test_row_sharded_read_matches(world):
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    mesh = mesh_mod.make_mesh(8, rows=4)  # RAM has 4 rows at this config
    fn = mesh_mod.sharded_read_fn(PAR, mesh)
    data_sh = mesh_mod.shard_data_rows(mesh, ram_ct)
    atk_sh = jax.device_put(ekp.atk_glwe, mesh_mod.replicated(mesh))
    out = np.asarray(fn(data_sh, aps[0].coordinates, atk_sh))
    server = ram_mod.FheRam(PAR, ekp)
    out1 = np.asarray(server.read(server.init_state(ram_ct), aps[0]))
    assert np.array_equal(out, out1)


def test_sharded_read_decrypts_correctly(world):
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    mesh = mesh_mod.make_mesh(8, rows=2)
    coords = mesh_mod.stack_addresses(aps)
    fn = mesh_mod.batched_read_fn(PAR, mesh)
    out = np.asarray(
        fn(
            mesh_mod.shard_data_rows(mesh, ram_ct),
            mesh_mod.shard_addr_batch(mesh, coords),
            jax.device_put(ekp.atk_glwe, mesh_mod.replicated(mesh)),
        )
    )
    for b, idx in enumerate(idxs):
        for i in range(PAR.word_size):
            want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
            ph = glwe.phase(PAR, ctx, s_ntt, jnp.asarray(out[b, i]))
            val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want
            assert noise < -(PAR.k_pt + 1)


# --------------------------------------------------------------------------
# sharded write / RMW (round 5): the delta walk at shard-local rows
# --------------------------------------------------------------------------

def _unpermute_rows(mesh, data_sh):
    """Invert shard_data_rows' strided row placement."""
    r = mesh.shape["rows"]
    perm = mesh_mod.row_shard_perm(PAR.num_rows, r)
    return np.asarray(data_sh)[:, np.argsort(perm)]


def _decode_word(ctx, s_ntt, out, want_bytes):
    for i in range(PAR.word_size):
        want = glwe.cast_u8_signed(int(want_bytes[i]), PAR.k_pt)
        ph = glwe.phase(PAR, ctx, s_ntt, jnp.asarray(np.asarray(out)[i]))
        val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
        assert int(val) == want, (i, val, want)
        assert noise < -(PAR.k_pt + 1), (i, noise)


def test_sharded_rmw_matches_single(world):
    """sharded_rmw_fn's new data is BIT-EXACT vs the single-chip
    rpw_impl + write_impl pipeline (after un-permuting the strided row
    placement), and the read-out decodes to the pre-write value."""
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    src = rng.Source(77)
    idx = 42
    addr = address_mod.encrypt(PAR, ctx, s_ntt, idx, src)
    ap = address_mod.prepare(ctx, addr)
    new_word = [7, 250]
    w = ram_mod.encrypt_write_word(PAR, ctx, s_ntt, new_word, src)

    mesh = mesh_mod.make_mesh(8, rows=4)
    rep = mesh_mod.replicated(mesh)
    fn = mesh_mod.sharded_rmw_fn(PAR, mesh)
    out, nd = fn(mesh_mod.shard_data_rows(mesh, ram_ct),
                 jax.device_put(ap.coordinates, rep),
                 jax.device_put(addr.coordinates, rep),
                 jax.device_put(w, rep),
                 jax.device_put(ekp, rep))
    nd = _unpermute_rows(mesh, nd)

    o1, d1, tree = ram_mod.rpw_impl(PAR, ctx, ram_ct, ap.coordinates,
                                    ekp.atk_glwe)
    d2 = ram_mod.write_impl(PAR, ctx, d1, tree, w, addr.coordinates, ekp)
    assert np.array_equal(nd, np.asarray(d2))
    _decode_word(ctx, s_ntt, out, data[idx * PAR.word_size:
                                       (idx + 1) * PAR.word_size])
    # read back the written word through the sharded new data
    server = ram_mod.FheRam(PAR, ekp)
    out2 = server.read(server.init_state(jnp.asarray(nd)), ap)
    _decode_word(ctx, s_ntt, out2, new_word)


def test_sharded_rpw_write_pair_matches(world):
    """sharded_rpw_fn + sharded_write_fn reproduce rpw_impl/write_impl
    bit-exactly (read-out, tree root, and written data)."""
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    src = rng.Source(78)
    idx = 200
    addr = address_mod.encrypt(PAR, ctx, s_ntt, idx, src)
    ap = address_mod.prepare(ctx, addr)
    w = ram_mod.encrypt_write_word(PAR, ctx, s_ntt, [1, 2], src)

    mesh = mesh_mod.make_mesh(8, rows=2)
    rep = mesh_mod.replicated(mesh)
    atk_sh = jax.device_put(ekp.atk_glwe, rep)
    out, root = mesh_mod.sharded_rpw_fn(PAR, mesh)(
        mesh_mod.shard_data_rows(mesh, ram_ct),
        jax.device_put(ap.coordinates, rep), atk_sh)
    o1, d1, tree = ram_mod.rpw_impl(PAR, ctx, ram_ct, ap.coordinates,
                                    ekp.atk_glwe)
    assert np.array_equal(np.asarray(out), np.asarray(o1))
    assert np.array_equal(np.asarray(root), np.asarray(tree[-1]))

    nd = mesh_mod.sharded_write_fn(PAR, mesh)(
        mesh_mod.shard_data_rows(mesh, ram_ct), root,
        jax.device_put(w, rep),
        jax.device_put(addr.coordinates, rep),
        jax.device_put(ekp, rep))
    d2 = ram_mod.write_impl(PAR, ctx, d1, tree, w, addr.coordinates, ekp)
    assert np.array_equal(_unpermute_rows(mesh, nd), np.asarray(d2))


def test_batched_rmw_sharded_matches_single(world):
    """batched_rmw_fn (dp-sharded RMW batch x row-sharded RAM, round 5)
    is BIT-EXACT vs the single-chip rmw_batch_impl: same read-outs,
    same new data (after un-permuting the strided rows)."""
    ctx, s_ntt, ekp, data, ram_ct, idxs, aps = world
    src = rng.Source(79)
    rnd = np.random.default_rng(41)
    B = 4
    b_idxs = [3, 40, 129, 250]
    addrs = [address_mod.encrypt(PAR, ctx, s_ntt, i, src) for i in b_idxs]
    b_aps = [address_mod.prepare(ctx, a) for a in addrs]
    coords_prep = mesh_mod.stack_addresses(b_aps)
    coords_coeff = tuple(
        jnp.stack([a.coordinates[i] for a in addrs], axis=0)
        for i in range(len(addrs[0].coordinates)))
    new_words = rnd.integers(0, 256, size=(B, PAR.word_size)).astype(
        np.uint8)
    w_b = jnp.stack([
        ram_mod.encrypt_write_word(PAR, ctx, s_ntt, nw, src)
        for nw in new_words], axis=0)

    mesh = mesh_mod.make_mesh(8, rows=2)  # dp=4 x rows=2
    rep = mesh_mod.replicated(mesh)
    fn = mesh_mod.batched_rmw_fn(PAR, mesh)
    outs_sh, nd = fn(mesh_mod.shard_data_rows(mesh, ram_ct),
                     mesh_mod.shard_addr_batch(mesh, coords_prep),
                     mesh_mod.shard_addr_batch(mesh, coords_coeff),
                     jax.device_put(w_b, jax.sharding.NamedSharding(
                         mesh, jax.sharding.PartitionSpec("dp"))),
                     jax.device_put(ekp, rep))
    nd = _unpermute_rows(mesh, nd)

    outs1, nd1 = ram_mod.rmw_batch_impl(PAR, ctx, ram_ct, coords_prep,
                                        coords_coeff, w_b, ekp)
    assert np.array_equal(np.asarray(outs_sh), np.asarray(outs1))
    assert np.array_equal(nd, np.asarray(nd1))

    # decode gates: pre-write read-outs + one landed word
    for b, idx in enumerate(b_idxs):
        _decode_word(ctx, s_ntt, np.asarray(outs_sh)[b],
                     data[idx * PAR.word_size:(idx + 1) * PAR.word_size])
    server = ram_mod.FheRam(PAR, ekp)
    got = server.read(server.init_state(jnp.asarray(nd)), b_aps[2])
    _decode_word(ctx, s_ntt, got, new_words[2])
