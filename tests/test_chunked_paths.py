"""Exercise the sequential-slice (lax.map) chunked product and pack-merge
paths that large geometries use, at small sizes via lowered thresholds."""

import numpy as np
import jax.numpy as jnp

import fhe_ram_tpu.ram.ram as ram_mod
import fhe_ram_tpu.core.packer as packer_mod
from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod


def test_chunked_read_matches_unchunked(monkeypatch):
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(77)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    rnd = np.random.default_rng(3)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    ap = address_mod.prepare(ctx, address_mod.encrypt(PAR, ctx, s_ntt, 33, src))

    base = np.asarray(ram_mod.read_impl(PAR, ctx, ram_ct, ap.coordinates,
                                        ekp.atk_glwe))

    # force both chunked paths (PAR: W=2, R=4 -> slices of 1 row; pack
    # merges sliced to 1 ct)
    monkeypatch.setattr(ram_mod, "_PRODUCT_CHUNK_ROWS", 2)
    monkeypatch.setattr(packer_mod, "_KS_CHUNK", 1)
    chunked = np.asarray(ram_mod.read_impl(PAR, ctx, ram_ct, ap.coordinates,
                                           ekp.atk_glwe))
    assert np.array_equal(base, chunked), "chunked paths must be bit-exact"
