"""Parameter-mapping assertions backing SECURITY.md.

The security claim (~168 bits, reference README.md:38-61) is an
estimator run at (n=2^12, q=2^85, sparse-ternary weight n/2, sigma=3.2).
These tests pin every production preset to exactly those inputs and
check the limb-depth => q mapping (SECURITY.md "Estimator inputs")."""

import numpy as np

from fhe_ram_tpu import params as P
from fhe_ram_tpu.core import rng

# Every preset a user can deploy (test-only presets use small rings and
# make no security claim).
PRODUCTION_PRESETS = {
    "README_2_18": P.PARAMS_README_2_18,
    "CODE_2_14": P.PARAMS_CODE_2_14,
    "2_24": P.PARAMS_2_24,
    "2_18_WIDE": P.PARAMS_2_18_WIDE,
    "2_14_WIDE": P.PARAMS_2_14_WIDE,
    "2_24_WIDE": P.PARAMS_2_24_WIDE,
    "2_18_TURBO": P.PARAMS_2_18_TURBO,
    "2_18_READOPT": P.PARAMS_2_18_READOPT,
    "2_24_READOPT": P.PARAMS_2_24_READOPT,
    "2_14_READOPT": P.PARAMS_2_14_READOPT,
    "2_18_TURBO_READOPT": P.PARAMS_2_18_TURBO_READOPT,
}

# The estimator inputs of the documented run (SECURITY.md).
EST_LOG_N = 12
EST_LOG_Q = 85           # largest ciphertext modulus analog, 2^(17*5)
EST_SIGMA = 3.2
EST_DENSITY = 0.5


def test_every_production_preset_matches_estimator_inputs():
    for name, par in PRODUCTION_PRESETS.items():
        assert par.log_n == EST_LOG_N, name
        assert par.sigma == EST_SIGMA, name
        assert par.xs_density == EST_DENSITY, name
        # the binding RLWE sample: the largest torus precision in use
        max_k = max(par.k_ct, par.k_ggsw, par.k_evk_trace, par.k_evk_ggsw)
        assert max_k <= EST_LOG_Q, (
            f"{name}: precision {max_k} exceeds the analyzed q=2^{EST_LOG_Q}")
        # the defaults actually realize the analyzed modulus
        assert par.k_evk_ggsw == EST_LOG_Q, name


def test_limb_depth_q_mapping():
    """k = 17 * limbs for every layout: the limb representation at L
    limbs IS the discretized torus with modulus analog 2^(17 L)."""
    for name, par in PRODUCTION_PRESETS.items():
        assert par.base2k == 17, name
        assert par.k_ct == par.base2k * par.limbs_ct, name
        assert par.k_ggsw <= par.base2k * par.limbs_ggsw, name
        assert par.k_evk_trace <= par.base2k * par.limbs_evk_trace, name
        assert par.k_evk_ggsw == par.base2k * par.limbs_evk_ggsw, name
        # ceil-limb slack never exceeds one limb
        assert par.base2k * (par.limbs_ggsw - 1) < par.k_ggsw, name


def test_secret_distribution_is_exact_weight_sparse_ternary():
    """core/rng.ternary_secret realizes ND.SparseTernary(n, p=n/2):
    exact Hamming weight density*n, balanced signs, values in
    {-1, 0, 1}."""
    import jax

    n = 1 << EST_LOG_N
    for rank in (1, 2):
        sk = np.asarray(rng.ternary_secret(jax.random.key(7), rank, n,
                                           density=EST_DENSITY))
        assert sk.shape == (rank, n)
        assert set(np.unique(sk)) <= {-1, 0, 1}
        for c in range(rank):
            nz = int(np.sum(sk[c] != 0))
            assert nz == n // 2, f"weight {nz} != n/2"
            assert int(np.sum(sk[c] == 1)) == n // 4
            assert int(np.sum(sk[c] == -1)) == n // 4


def test_truncation_and_geometry_do_not_touch_estimator_inputs():
    """READOPT/TURBO/WIDE/2^24 vary only server-side evaluation choices
    or RAM geometry; the (n, q, Xs, Xe) tuple is invariant across
    presets (SECURITY.md 'What does NOT affect security')."""
    base = PRODUCTION_PRESETS["README_2_18"]
    for name, par in PRODUCTION_PRESETS.items():
        assert (par.log_n, par.sigma, par.xs_density, par.k_evk_ggsw) == (
            base.log_n, base.sigma, base.xs_density, base.k_evk_ggsw), name
