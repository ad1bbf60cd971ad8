"""Pallas kernels under shard_map partitioning (interpret mode).

The fused-kernel path requires the production ring size (N = 4096), so
PARAMS_TEST_SMALL cannot drive it; this module runs a MINIMAL N=4096
geometry (2 RAM rows, 1-byte words) through the row-sharded read on the
virtual CPU mesh with every Pallas kernel interpreted
(ops.ntt_pallas._INTERPRET), and decode-checks the result -- evidence
that the production fused pipeline partitions correctly, not just the
composed path (round-3 review item)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_ram_tpu.params import Params
from fhe_ram_tpu.ops import ntt as ntt_mod
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keyswitch, rng
from fhe_ram_tpu.core import keys as keys_mod
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.parallel import mesh as mesh_mod

# Minimal production-ring geometry: N=4096, 2 RAM rows (max_addr 2^13),
# single-byte words, wide single-GGSW coordinates -> base2d [[12],[1]].
PAR = Params(k_pt=3, max_addr=1 << 13, word_size=1, decomp_n=(12,))


@pytest.fixture(scope="module")
def pallas_world():
    from fhe_ram_tpu.ops import ntt_pallas

    assert len(jax.devices()) >= 2
    ctx = get_ntt_context(PAR.n, PAR.primes)

    # Keygen + encryption produce COEFFICIENT-domain objects (exact
    # integers, identical under any backend); run them on the fast
    # butterfly path.  NTT-domain ("prepared") forms are spectrum-order
    # sensitive and are created below under the pallas backend.
    assert ntt_mod.get_backend() == "butterfly"
    src = rng.Source(23)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ek_coeff = keys_mod.keygen(PAR, sk, src)  # full set: write needs tsk
    rnd = np.random.default_rng(9)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    idxs = [5, PAR.n + 17]  # one per RAM row
    addrs = [address_mod.encrypt(PAR, ctx, s_ntt, i, src) for i in idxs]
    w_ct = ram_mod.encrypt_write_word(PAR, ctx, s_ntt, [177], src)

    ntt_mod.set_backend("pallas")
    ntt_pallas._INTERPRET = True
    try:
        ekp = keys_mod.prepare(PAR, ek_coeff)
        aps = [address_mod.prepare(ctx, a) for a in addrs]
        yield ctx, s_ntt, data, ram_ct, ekp, idxs, aps, addrs, w_ct
    finally:
        ntt_pallas._INTERPRET = False
        ntt_mod.set_backend("butterfly")


def _decode_check(ctx, s_ntt, data, out, idx):
    # the output ct is coefficient-domain, but phase() multiplies by the
    # BUTTERFLY-order s_ntt -- decode under that backend (the fixture
    # leaves "pallas" active during the test body)
    prev = ntt_mod.get_backend()
    ntt_mod.set_backend("butterfly")
    try:
        for i in range(PAR.word_size):
            want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]),
                                       PAR.k_pt)
            ph = glwe.phase(PAR, ctx, s_ntt, jnp.asarray(np.asarray(out)[i]))
            val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want, (idx, i, val, want)
            assert noise < -(PAR.k_pt + 1), (idx, i, noise)
    finally:
        ntt_mod.set_backend(prev)


def test_row_sharded_fused_read_interpret(pallas_world):
    ctx, s_ntt, data, ram_ct, ekp, idxs, aps, addrs, w_ct = pallas_world
    mesh = mesh_mod.make_mesh(2, rows=2)
    fn = mesh_mod.sharded_read_fn(PAR, mesh)
    data_sh = mesh_mod.shard_data_rows(mesh, ram_ct)
    atk_sh = jax.device_put(ekp.atk_glwe, mesh_mod.replicated(mesh))
    out = np.asarray(fn(data_sh, aps[0].coordinates, atk_sh))
    _decode_check(ctx, s_ntt, data, out, idxs[0])


def test_batched_sharded_fused_read_interpret(pallas_world):
    ctx, s_ntt, data, ram_ct, ekp, idxs, aps, addrs, w_ct = pallas_world
    mesh = mesh_mod.make_mesh(4, rows=2)  # dp=2 x rows=2
    coords = mesh_mod.stack_addresses(aps)
    fn = mesh_mod.batched_read_fn(PAR, mesh)
    out = np.asarray(fn(
        mesh_mod.shard_data_rows(mesh, ram_ct),
        mesh_mod.shard_addr_batch(mesh, coords),
        jax.device_put(ekp.atk_glwe, mesh_mod.replicated(mesh)),
    ))
    for b, idx in enumerate(idxs):
        _decode_check(ctx, s_ntt, data, out[b], idx)


def test_row_sharded_fused_rmw_interpret(pallas_world):
    """The sharded WRITE path under Pallas partitioning (round 5): one
    full RMW with the production fused kernels per shard in interpret
    mode -- the read-out decodes to the pre-write value and a read of
    the new data returns the written word.  R == n_shards here, so the
    extraction's select-after-loop edge (log2(dilate) == s) runs."""
    ctx, s_ntt, data, ram_ct, ekp, idxs, aps, addrs, w_ct = pallas_world
    mesh = mesh_mod.make_mesh(2, rows=2)
    rep = mesh_mod.replicated(mesh)
    idx = idxs[1]
    out, nd = mesh_mod.sharded_rmw_fn(PAR, mesh)(
        mesh_mod.shard_data_rows(mesh, ram_ct),
        jax.device_put(aps[1].coordinates, rep),
        jax.device_put(addrs[1].coordinates, rep),
        jax.device_put(w_ct, rep),
        jax.device_put(ekp, rep))
    _decode_check(ctx, s_ntt, data, np.asarray(out), idx)

    out2 = np.asarray(mesh_mod.sharded_read_fn(PAR, mesh)(
        nd, aps[1].coordinates,
        jax.device_put(ekp.atk_glwe, rep)))
    _decode_check(ctx, s_ntt, np.asarray([177], np.uint8), out2, 0)
