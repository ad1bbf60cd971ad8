"""Checkpoint/resume roundtrips for keys, RAM state, and addresses."""

import numpy as np
import jax
import pytest

from fhe_ram_tpu.params import PARAMS_TEST_FLAT as PAR, PARAMS_TEST_SMALL
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod
from fhe_ram_tpu.utils import io as io_mod


def test_keys_state_address_roundtrip(tmp_path):
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(9)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ek = keys.keygen(PAR, sk, src)

    kp = tmp_path / "keys.npz"
    io_mod.save_keys(str(kp), PAR, ek)
    ek2 = io_mod.load_keys(str(kp), PAR)
    assert set(ek2.atk_glwe) == set(ek.atk_glwe)
    for g in ek.atk_glwe:
        assert np.array_equal(ek.atk_glwe[g], ek2.atk_glwe[g])
    assert np.array_equal(ek.tsk, ek2.tsk)

    rnd = np.random.default_rng(1)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    sp = tmp_path / "state.npz"
    io_mod.save_ram_state(str(sp), PAR, ram_ct, ram_mod.make_tree(PAR))
    d2, t2 = io_mod.load_ram_state(str(sp), PAR)
    assert np.array_equal(ram_ct, d2)

    addr = address_mod.encrypt(PAR, ctx, s_ntt, 3, src)
    ap = tmp_path / "addr.npz"
    io_mod.save_address(str(ap), PAR, addr)
    a2 = io_mod.load_address(str(ap), PAR)
    assert all(np.array_equal(x, y) for x, y in zip(addr.coordinates, a2.coordinates))

    # a reload must decrypt correctly end-to-end
    ekp = keys.prepare(PAR, ek2)
    server = ram_mod.FheRam(PAR, ekp)
    out = server.read(server.init_state(d2), address_mod.prepare(ctx, a2))
    want = glwe.cast_u8_signed(int(data[3 * PAR.word_size]), PAR.k_pt)
    ph = glwe.phase(PAR, ctx, s_ntt, out[0])
    val, noise = glwe.decode_coeff0(PAR, np.asarray(ph), want)
    assert int(val) == want


def test_params_mismatch_rejected(tmp_path):
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(10)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    ek = keys.keygen(PAR, sk, src)
    kp = tmp_path / "keys.npz"
    io_mod.save_keys(str(kp), PAR, ek)
    with pytest.raises(ValueError):
        io_mod.load_keys(str(kp), PARAMS_TEST_SMALL)
