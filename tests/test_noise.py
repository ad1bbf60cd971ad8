"""Analytic noise model vs measured noise (core/noise.py).

The reference asserts GGSW noise against analytic bounds
(src/conversion.rs:184-192,215) and publishes a >= ~40M-operation
refresh budget (README.md:36).  These tests check, on the small ring:
  * every measured per-op noise stays below its analytic bound,
  * the bound is TIGHT-ish (within ~14 bits of the measurement, so the
    model tracks reality rather than being vacuous),
  * blind-rotation-derived GGSWs pass an assert_noise-style gate,
  * the computed refresh budget at the production 2^18 config clears
    the reference's ~40M figure.
"""

import math

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import (
    PARAMS_TEST_SMALL as PAR, PARAMS_README_2_18, PARAMS_2_18_WIDE,
    PARAMS_2_18_TURBO)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops
from fhe_ram_tpu.core import glwe, ggsw, keyswitch, keys, noise, rng
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod

CTX = get_ntt_context(PAR.n, PAR.primes)


def setup(seed=3):
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    return src, sk, s_ntt, ekp


def _max_noise_log2(ph, want_vec):
    t = limb_ops.torus_float(np.asarray(ph))
    frac = t - np.asarray(want_vec, np.float64) * 2.0 ** (-PAR.k_pt)
    frac = frac - np.rint(frac)
    return float(np.log2(np.max(np.abs(frac)) + 2.0 ** -120))


def test_fresh_noise_bound():
    src, sk, s_ntt, _ = setup()
    vals = np.arange(PAR.n) % 5 - 2
    ct = glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    got = _max_noise_log2(glwe.phase(PAR, CTX, s_ntt, ct), vals)
    bound = noise.bound_log2(noise.var_fresh(PAR, PAR.limbs_ct))
    assert got < bound, (got, bound)
    assert got > bound - 14, f"bound too loose: measured {got}, bound {bound}"


def test_external_product_noise_bound():
    src, sk, s_ntt, _ = setup()
    vals = np.arange(PAR.n) % 5 - 2
    ct = glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[3] = 1
    g = ggsw.prepare(CTX, ggsw.encrypt(PAR, CTX, s_ntt, jnp.asarray(mono), src))
    res = ggsw.external_product(PAR, CTX, ct, g)
    from fhe_ram_tpu.ops import poly
    want = np.asarray(poly.rotate(jnp.asarray(vals), 3))
    got = _max_noise_log2(glwe.phase(PAR, CTX, s_ntt, res), want)
    var = noise.var_external_product(
        PAR, PAR.limbs_ct, noise.var_fresh(PAR, PAR.limbs_ggsw),
        PAR.limbs_ct, var_in=noise.var_fresh(PAR, PAR.limbs_ct))
    bound = noise.bound_log2(var, noise.det_trunc(PAR.limbs_ct))
    assert got < bound, (got, bound)
    assert got > bound - 14, (got, bound)


def test_trace_noise_bound():
    src, sk, s_ntt, ekp = setup()
    vals = np.zeros(PAR.n, dtype=np.int64)
    vals[0] = 2
    ct = glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)
    res = keyswitch.trace(PAR, CTX, ct, ekp.atk_glwe)
    got = _max_noise_log2(glwe.phase(PAR, CTX, s_ntt, res), vals)
    var, det = noise.trace_noise(PAR, noise.var_fresh(PAR, PAR.limbs_ct),
                                 PAR.limbs_ct)
    bound = noise.bound_log2(var, det)
    assert got < bound, (got, bound)
    assert got > bound - 14, (got, bound)


def test_read_noise_bound():
    src, sk, s_ntt, ekp = setup(seed=9)
    rnd = np.random.default_rng(2)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, CTX, s_ntt, data, src)
    server = ram_mod.FheRam(PAR, ekp)
    bound = noise.read_noise_log2(PAR)
    worst = -1000.0
    for idx in [0, 133]:
        ap = address_mod.prepare(
            CTX, address_mod.encrypt(PAR, CTX, s_ntt, idx, src))
        out = np.asarray(server.read(server.init_state(ram_ct), ap))
        for i in range(PAR.word_size):
            want = glwe.cast_u8_signed(int(data[idx * PAR.word_size + i]), PAR.k_pt)
            ph = glwe.phase(PAR, CTX, s_ntt, out[i])
            val, nlog = glwe.decode_coeff0(PAR, np.asarray(ph), want)
            assert int(val) == want
            worst = max(worst, float(nlog))
    assert worst < bound, (worst, bound)
    assert worst > bound - 16, f"read bound too loose: {worst} vs {bound}"
    # the analytic read bound itself must clear the decode requirement
    assert bound < -(PAR.k_pt + 1)


def test_ggsw_assert_noise_fresh():
    src, sk, s_ntt, _ = setup(seed=4)
    mono = np.zeros(PAR.n, dtype=np.int32)
    mono[5] = 1
    g = ggsw.encrypt(PAR, CTX, s_ntt, jnp.asarray(mono), src)
    bound = noise.bound_log2(noise.var_fresh(PAR, PAR.limbs_ggsw))
    measured = noise.assert_ggsw_noise(PAR, CTX, sk, s_ntt, g, mono, bound)
    assert measured.max() > bound - 14, "fresh GGSW bound too loose"


def test_ggsw_assert_noise_conversion():
    """Blind-rotation-derived GGSW noise gate (the reference's
    conversion noise test, src/conversion.rs:100-220)."""
    from fhe_ram_tpu.vm import conversion, fheuint

    src, sk, s_ntt, _ = setup(seed=6)
    ptr_bits = (PAR.max_addr - 1).bit_length()
    value = 173
    up = fheuint.encrypt_prepared(
        PAR, CTX, s_ntt, value, src, bits=ptr_bits,
        dnum=PAR.dnum_ggsw, limbs=PAR.limbs_evk_ggsw)
    addr, _ = conversion.fheuint_to_address(PAR, CTX, up)

    base2d = PAR.base2d()
    remain = value
    for ci, base1d in enumerate(base2d.rows):
        k = remain & (base1d.max() - 1)
        remain //= base1d.max()
        tot = 0
        digval = k
        for di, b in enumerate(base1d.bases):
            # expected monomial X^(-(digit << tot)) (negacyclic sign)
            e = (digval & ((1 << b) - 1)) << tot
            mono = np.zeros(PAR.n, dtype=np.int64)
            if e == 0:
                mono[0] = 1
            else:
                mono[PAR.n - e] = -1
            var = noise.conversion_ggsw_row_var(PAR, n_cmux=b)
            bound = noise.bound_log2(var + noise.var_trunc(PAR.limbs_ggsw),
                                     noise.det_trunc(PAR.limbs_ggsw))
            noise.assert_ggsw_noise(
                PAR, CTX, sk, s_ntt, addr.coordinates[ci][di], mono, bound)
            digval >>= b
            tot += b


def test_refresh_budget_production():
    """The computed refresh budget at the 2^18 production config must
    clear the reference's published ~40M figure (README.md:36)."""
    for par in (PARAMS_README_2_18, PARAMS_2_18_WIDE):
        budget = noise.refresh_budget(par)
        assert budget >= 40_000_000, budget
        # the analytic read bound clears decode at the production config
        assert noise.read_noise_log2(par) < -(par.k_pt + 1)
    # wide digits must not be noisier than the reference decomposition
    # (ONE external product per coordinate adds key noise once, not 4x)
    assert (noise.read_noise_log2(PARAMS_2_18_WIDE)
            <= noise.read_noise_log2(PARAMS_README_2_18) + 1e-9)
    # turbo (k_ggsw=51) trades noise margin for speed but must keep the
    # decode bound AND the reference's published refresh budget
    assert noise.read_noise_log2(PARAMS_2_18_TURBO) < -(PARAMS_2_18_TURBO.k_pt + 1)
    assert noise.refresh_budget(PARAMS_2_18_TURBO) >= 40_000_000
    # turbo x readopt cross: truncated read path on 3-limb address GGSWs
    from fhe_ram_tpu.params import PARAMS_2_18_TURBO_READOPT as _tr
    assert noise.read_noise_log2(_tr) < -(_tr.k_pt + 1)
    assert noise.refresh_budget(_tr) >= 40_000_000
    # 2^14 readopt: deeper ep truncation must keep a >= 6-bit margin to
    # the k_pt=3 decode bound
    from fhe_ram_tpu.params import PARAMS_2_14_READOPT as _r14
    assert noise.read_noise_log2(_r14) < -(_r14.k_pt + 1) - 6
    assert noise.refresh_budget(_r14) >= 40_000_000


def test_write_cycle_variance_slope_empirical():
    """Empirical validation of the refresh-budget slope (round-4 review
    item): run many RMW cycles on one address and check the measured
    per-cycle noise-VARIANCE growth of the base-level data rows against
    the analytic per-cycle term noise.write_cycle_added_var -- the
    load-bearing quantity behind the 1.3e8-cycle budget and the
    READOPT/TURBO preset pricing.

    The write path touches every base row each cycle (rpw rotation +
    delta add within the written chunk + final inverse-coordinate
    product), so all W*R*N coefficients sample the modeled
    distribution."""
    src, sk, s_ntt, ekp = setup(seed=17)
    rnd = np.random.default_rng(33)
    data = rnd.integers(0, 256, size=PAR.max_addr * PAR.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(PAR, CTX, s_ntt, data, src)
    server = ram_mod.FheRam(PAR, ekp)
    state = server.init_state(ram_ct)

    a = 37  # fixed address: row a // n, slot a % n
    addr = address_mod.encrypt(PAR, CTX, s_ntt, a, src)
    ap = address_mod.prepare(CTX, addr)

    # expected base-level plaintext per (subram, row, slot)
    W, R, n = PAR.word_size, PAR.num_rows, PAR.n
    words = data.reshape(PAR.max_addr, W).astype(np.int8).astype(np.int64)
    padded = np.zeros((R * n, W), dtype=np.int64)
    padded[: PAR.max_addr] = words
    expect = padded.T.reshape(W, R, n).copy()

    def row_err_var(state):
        ph = glwe.phase(PAR, CTX, s_ntt,
                        state.data.reshape(W * R, PAR.rank + 1,
                                           PAR.limbs_ct, n))
        t = limb_ops.torus_float(np.asarray(ph)).reshape(W, R, n)
        frac = t - expect * 2.0 ** (-PAR.k_pt)
        frac -= np.rint(frac)
        return float(np.mean(frac ** 2))

    cycles = 40
    vars_t = [row_err_var(state)]
    for t in range(cycles):
        _, state = server.read_prepare_write(state, ap)
        w_bytes = rnd.integers(0, 256, size=W).astype(np.uint8)
        w_ct = ram_mod.encrypt_write_word(PAR, CTX, s_ntt, w_bytes, src)
        state = server.write(state, w_ct, addr)
        expect[:, a // n, a % n] = w_bytes.astype(np.int8)
        vars_t.append(row_err_var(state))

    # linear fit var(t) = var0 + slope * t
    ts = np.arange(cycles + 1, dtype=np.float64)
    slope = float(np.polyfit(ts, np.asarray(vars_t), 1)[0])
    var_model, _det = noise.write_cycle_added_var(PAR)

    # decode sanity: the data is still perfectly readable at the end
    assert vars_t[-1] < (2.0 ** (-(PAR.k_pt + 1))) ** 2 / 36.0

    # the analytic per-cycle variance must BOUND the measurement and
    # stay within ~2x of it (model tracks reality, isn't vacuous)
    assert 0 < slope <= 2.0 * var_model, (slope, var_model)
    assert slope >= var_model / 16.0, (
        f"model 16x above measurement: slope={slope:.3e} "
        f"model={var_model:.3e}")


def test_rpw_truncation_priced_out():
    """RPW-path gadget truncation is PRICED OUT (round-4 analysis): the
    rpw tree noise reaches every RAM row each cycle via the write delta,
    and the pack's coherent M^2/3 amplification blows truncation noise
    up ~9 orders -- even the mildest variant (one key limb off the pack
    keyswitches) collapses the refresh budget below the reference's
    ~40M bar.  The model prices it so nobody re-tries silently; the
    production presets keep rpw at the full gadget."""
    from fhe_ram_tpu.params import Params

    base = dict(decomp_n=(12,), read_ks_digits=2, read_ks_limbs=3,
                read_ep_digits=2, read_ep_limbs=3)
    full = Params(**base)
    assert noise.refresh_budget(full) >= 100_000_000
    for kv in (dict(rpw_ks_limbs=3),
               dict(rpw_ks_limbs=3, rpw_ep_limbs=3),
               dict(rpw_ks_limbs=3, rpw_ep_limbs=3, rpw_ks_digits=2,
                    rpw_ep_digits=2)):
        assert noise.refresh_budget(Params(**base, **kv)) < 40_000_000


def test_bitdecomp_bit_noise_bounded():
    """The sign-bootstrap output-bit noise bound (vm/bitdecomp.py,
    noise.bitdecomp_bit_noise_log2) clears the bit-decode bound with
    margin at the production Lg=5 bsk gadget (-22.5 vs -10), and
    prices OUT the Lg=3 bsk the round-5 first cut ran."""
    from fhe_ram_tpu.params import (
        PARAMS_2_18_TURBO_READOPT, PARAMS_2_18_READOPT, PARAMS_README_2_18)

    for p in (PARAMS_2_18_TURBO_READOPT, PARAMS_2_18_READOPT,
              PARAMS_README_2_18):
        b = noise.bitdecomp_bit_noise_log2(p, bsk_limbs=5)
        assert b < -(p.k_pt + 1) - 4, (b, p.k_pt)
        # the Lg=3 bsk is priced OUT at production precision (-9.7 vs
        # the -10 bound): the model must catch it
        assert noise.bitdecomp_bit_noise_log2(p, bsk_limbs=3) > -(
            p.k_pt + 1) - 4
