"""Pallas ring all-gather (parallel/collective.py) on the virtual CPU
mesh: the remote-DMA ring must be bit-exact against lax.all_gather
(TPU interpret mode emulates the async remote copies), and the
row-sharded read must decode correctly with FHERAM_RING_AG wired in."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from fhe_ram_tpu.parallel import collective, mesh as mesh_mod


@pytest.mark.parametrize("r", [2, 4, 8])
def test_ring_all_gather_matches_lax(r):
    mesh = jax.make_mesh((r,), ("x",))
    rnd = np.random.default_rng(3)
    x = jnp.asarray(rnd.integers(-(1 << 20), 1 << 20, size=(r, 8, 256)),
                    jnp.int32)

    ring = jax.jit(jax.shard_map(
        lambda v: collective.ring_all_gather(v[0], "x", r, interpret=True),
        mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False))
    ref = jax.jit(jax.shard_map(
        lambda v: jax.lax.all_gather(v[0], "x"),
        mesh=mesh, in_specs=P("x"), out_specs=P("x"), check_vma=False))

    got = np.asarray(ring(x))
    want = np.asarray(ref(x))
    assert np.array_equal(got, want)


def test_sharded_read_with_ring_collective(monkeypatch):
    """The sharded batched read end-to-end with the ring exchange in
    place of XLA's all_gather: bit-exact vs the default path."""
    from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod

    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(3)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    rnd = np.random.default_rng(21)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    ap = address_mod.prepare(ctx, address_mod.encrypt(PAR, ctx, s_ntt, 17,
                                                      src))

    m = mesh_mod.make_mesh(4, rows=2)
    data_sh = mesh_mod.shard_data_rows(m, ram_ct)
    atk_sh = jax.device_put(ekp.atk_glwe, mesh_mod.replicated(m))

    fn = mesh_mod.sharded_read_fn(PAR, m)
    want = np.asarray(fn(data_sh, ap.coordinates, atk_sh))

    monkeypatch.setattr(collective, "USE_RING_AG", True)
    fn_ring = mesh_mod.sharded_read_fn(PAR, m)
    got = np.asarray(fn_ring(data_sh, ap.coordinates, atk_sh))
    assert np.array_equal(got, want)

    # FHERAM_RING_AG=2: merge-interleaved exchange tail (round 5)
    monkeypatch.setattr(collective, "USE_RING_AG", False)
    monkeypatch.setattr(collective, "RING_AG_MODE", "2")
    fn_mx = mesh_mod.sharded_read_fn(PAR, m)
    got2 = np.asarray(fn_mx(data_sh, ap.coordinates, atk_sh))
    assert np.array_equal(got2, want)


@pytest.mark.parametrize("r", [2, 4, 8])
def test_exchange_matches_ppermute(r):
    """The Pallas partner exchange (FHERAM_RING_AG=2 primitive) is
    bit-exact vs lax.ppermute at every XOR stride."""
    mesh = jax.make_mesh((r,), ("x",))
    rnd = np.random.default_rng(5)
    x = jnp.asarray(rnd.integers(-(1 << 20), 1 << 20, size=(r, 4, 256)),
                    jnp.int32)
    s = 1
    while s < r:
        got = np.asarray(jax.jit(jax.shard_map(
            lambda v, s=s: collective.exchange(v[0], "x", s, r,
                                               interpret=True)[None],
            mesh=mesh, in_specs=P("x"), out_specs=P("x"),
            check_vma=False))(x))
        perm = [(i, i ^ s) for i in range(r)]
        want = np.asarray(jax.jit(jax.shard_map(
            lambda v, perm=tuple(perm): jax.lax.ppermute(
                v, "x", perm), mesh=mesh, in_specs=P("x"),
            out_specs=P("x"), check_vma=False))(x))
        assert np.array_equal(got, want), s
        s <<= 1


def test_merge_exchange_tail_matches_gathered_tail(monkeypatch):
    """The recursive-doubling tail (mesh._merge_exchange_tail) produces
    the SAME replicated pack root as all_gather + pack_tree on every
    shard -- the merges are the same calls on the same operands, so the
    equality is bit-exact.  8 shards = 3 interleaved rounds."""
    from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import keys, rng, packer

    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(4)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    from fhe_ram_tpu.core import glwe
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))

    r = 8
    mesh = jax.make_mesh((r,), ("rows",))
    rnd = np.random.default_rng(6)
    # one pre-packed "local root" per shard (any ct values work: the
    # equality is structural)
    roots = jnp.asarray(rnd.integers(-(1 << 16), 1 << 16,
                                     size=(r, 2, PAR.rank + 1,
                                           PAR.limbs_ct, PAR.n)), jnp.int32)
    atk = ekp.atk_glwe

    def tail_mx(v):
        return mesh_mod._merge_exchange_tail(PAR, ctx, v[0], atk, "rows", r)

    def tail_ag(v):
        nodes = jax.lax.all_gather(v[0], "rows")
        return packer.pack_tree(PAR, ctx, nodes, atk, dilate=1,
                                prescale=False)

    got = np.asarray(jax.jit(jax.shard_map(
        lambda v: tail_mx(v)[None], mesh=mesh, in_specs=P("rows"),
        out_specs=P("rows"), check_vma=False))(roots))
    want = np.asarray(jax.jit(jax.shard_map(
        lambda v: tail_ag(v)[None], mesh=mesh, in_specs=P("rows"),
        out_specs=P("rows"), check_vma=False))(roots))
    # every shard must hold the identical global root
    assert np.array_equal(got, want)
    for k in range(1, r):
        assert np.array_equal(got[k], got[0])
