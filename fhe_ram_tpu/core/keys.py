"""Evaluation-key generation, preparation, and the GGSW inversion
(GGSW(X^a) -> GGSW(X^-a)) used by the write path.

Key set (reference: src/keys.rs:20-31,134-181):
  * atk_glwe: one automorphism key per trace galois element
    (k_evk_trace, dnum_ct digit-rows),
  * atk_ggsw_inv: automorphism key for g = -1
    (k_evk_ggsw, dnum_ggsw digit-rows),
  * tsk: the GGLWE->GGSW tensor key.  Here it is simply a GGSW
    encrypting -s with dnum_ggsw digits at k_evk_ggsw: multiplying an
    encryption of m by it yields an encryption of -s*m, which is exactly
    the a-row phase a reconstructed GGSW needs (see ggsw_automorphism_inv).

GGSW inversion (reference: GGSWAutomorphism via auto+tensor keys,
src/coordinate_prepared.rs:119-142): apply sigma_{-1} to each digit-row's
b-row (permute + keyswitch), then rebuild the a-rows by external product
with the tensor key.  Only phases matter (core/ggsw.py docstring), so any
encryption with phase -sigma(mu)*g_d*s is a valid a-row.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from ..ops import limb as limb_ops
from ..ops import poly
from . import glwe, ggsw, keyswitch, rng

I32 = jnp.int32


@dataclass
class EvaluationKeys:
    """Coefficient-domain keys (client-side output of keygen)."""

    atk_glwe: dict    # {g: int32[D, rank, C2, L_trace, N]}
    atk_ggsw_inv: jnp.ndarray  # [D_ggsw, rank, C2, L_ggswk, N]
    tsk: jnp.ndarray  # GGSW(-s): [D_ggsw, C, C2, L_ggswk, N]


@dataclass
class EvaluationKeysPrepared:
    """NTT-domain keys (server-side; reference EvaluationKeysPrepared)."""

    atk_glwe: dict    # {g: int32[P, D, rank, C2, L_trace, N]}
    atk_ggsw_inv: jnp.ndarray
    tsk: jnp.ndarray


import jax  # noqa: E402

jax.tree_util.register_dataclass(
    EvaluationKeysPrepared,
    data_fields=["atk_glwe", "atk_ggsw_inv", "tsk"],
    meta_fields=[],
)


def keygen(params: Params, sk, source: rng.Source) -> EvaluationKeys:
    """Generate all evaluation keys under secret sk (int32[rank, N]).

    Mirrors EvaluationKeys::encrypt_sk (src/keys.rs:134-181)."""
    ctx = get_ntt_context(params.n, params.primes)
    s_ntt = glwe.secret_prepare(ctx, sk)

    atk = {}
    for g in params.trace_gal_els:
        atk[g] = keyswitch.automorphism_key_encrypt(
            params, ctx, sk, s_ntt, g, source,
            dnum=params.dnum_ct, limbs=params.limbs_evk_trace)

    atk_inv = keyswitch.automorphism_key_encrypt(
        params, ctx, sk, s_ntt, -1, source,
        dnum=params.dnum_ggsw, limbs=params.limbs_evk_ggsw)

    tsk = ggsw.encrypt(params, ctx, s_ntt, -sk[0], source,
                       dnum=params.dnum_ggsw, limbs=params.limbs_evk_ggsw)
    assert params.rank == 1, "tensor key wired for rank 1"

    return EvaluationKeys(atk_glwe=atk, atk_ggsw_inv=atk_inv, tsk=tsk)


def prepare(params: Params, keys: EvaluationKeys) -> EvaluationKeysPrepared:
    ctx = get_ntt_context(params.n, params.primes)
    return EvaluationKeysPrepared(
        atk_glwe={g: keyswitch.key_prepare(ctx, k) for g, k in keys.atk_glwe.items()},
        atk_ggsw_inv=keyswitch.key_prepare(ctx, keys.atk_ggsw_inv),
        tsk=ggsw.prepare(ctx, keys.tsk),
    )


def ggsw_automorphism_inv(params: Params, ctx: NTTContext, ggsw_ct,
                          keys: EvaluationKeysPrepared):
    """Map GGSW(mu) (coefficient domain, [D, C, C2, Lg, N], rank 1) to
    GGSW(sigma_{-1}(mu)) -- for monomials: GGSW(X^e) -> GGSW(X^-e)."""
    D, C, C2, Lg, n = ggsw_ct.shape
    assert params.rank == 1 and C == 2
    rank = 1
    # b-rows: (d, c=rank) -- GLWEs encrypting mu * g_d. Batch over d.
    rowb = ggsw_ct[:, rank]  # [D, C2, Lg, N]
    rowb = keyswitch.automorphism_ks(params, ctx, rowb, -1, keys.atk_ggsw_inv,
                                     out_limbs=Lg)
    # a-rows: encryptions of -s * sigma(mu) * g_d via the tensor key.
    rowa = ggsw.external_product(params, ctx, rowb, keys.tsk, out_limbs=Lg)
    return jnp.stack([rowa, rowb], axis=1)  # [D, C(=2), C2, Lg, N]
