"""Evaluation-key generation, preparation, and GGSW automorphisms
(GGSW(mu) -> GGSW(sigma_g(mu))), generic in rank and galois element.

Key set (reference: src/keys.rs:20-31,134-181):
  * atk_glwe: one automorphism key per trace galois element
    (k_evk_trace, dnum_ct digit-rows),
  * atk_ggsw: automorphism keys at the GGSW parameterization
    (k_evk_ggsw, one per galois element used on GGSWs; the RAM write
    needs only g = -1, reference keys.rs:171-173),
  * tsk: the GGLWE->GGSW tensor key -- one GGSW(-s_c) per secret
    component c, stacked [rank, D, C, C2, Lg, N].  Multiplying an
    encryption of m by tsk[c] yields an encryption of -s_c*m, which is
    exactly the phase a reconstructed GGSW a-row needs.

GGSW automorphism (reference: GGSWAutomorphism via auto+tensor keys,
src/coordinate_prepared.rs:119-142, generic in galois element and rank
like keys.rs:167-169): apply sigma_g to each digit-row's b-row (permute
+ keyswitch with the matching GGSW-level key), then rebuild every a-row
c by an external product of the new b-row with tsk[c].  Only phases
matter (core/ggsw.py docstring), so any encryption with phase
-sigma(mu)*g_d*s_c is a valid a-row."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from . import glwe, ggsw, keyswitch, rng

I32 = jnp.int32


@dataclass
class EvaluationKeys:
    """Coefficient-domain keys (client-side output of keygen)."""

    atk_glwe: dict    # {g: int32[D, rank, C2, L_trace, N]}
    atk_ggsw: dict    # {g: int32[D_ggsw, rank, C2, L_ggswk, N]}
    tsk: jnp.ndarray  # stacked GGSW(-s_c): [rank, D_ggsw, C, C2, L_ggswk, N]

    @property
    def atk_ggsw_inv(self):
        """The p = -1 key (the one the RAM write path consumes)."""
        return self.atk_ggsw[-1]


@dataclass
class EvaluationKeysPrepared:
    """NTT-domain keys (server-side; reference EvaluationKeysPrepared)."""

    atk_glwe: dict    # {g: int32[P, D, rank, C2, L_trace, N]}
    atk_ggsw: dict
    tsk: jnp.ndarray  # [P, rank, D, C, C2, Lg, N]

    @property
    def atk_ggsw_inv(self):
        return self.atk_ggsw[-1]


jax.tree_util.register_dataclass(
    EvaluationKeysPrepared,
    data_fields=["atk_glwe", "atk_ggsw", "tsk"],
    meta_fields=[],
)


def keygen(params: Params, sk, source: rng.Source,
           ggsw_gal_els: tuple[int, ...] = (-1,)) -> EvaluationKeys:
    """Generate all evaluation keys under secret sk (int32[rank, N]).

    Mirrors EvaluationKeys::encrypt_sk (src/keys.rs:134-181);
    ggsw_gal_els selects the galois elements usable by
    ggsw_automorphism (default: only the inversion map p = -1)."""
    ctx = get_ntt_context(params.n, params.primes)
    s_ntt = glwe.secret_prepare(ctx, sk)

    atk = {}
    for g in params.trace_gal_els:
        atk[g] = keyswitch.automorphism_key_encrypt(
            params, ctx, sk, s_ntt, g, source,
            dnum=params.dnum_ct, limbs=params.limbs_evk_trace)

    atk_ggsw = {}
    for g in ggsw_gal_els:
        atk_ggsw[g] = keyswitch.automorphism_key_encrypt(
            params, ctx, sk, s_ntt, g, source,
            dnum=params.dnum_ggsw, limbs=params.limbs_evk_ggsw)

    tsk = jnp.stack([
        ggsw.encrypt(params, ctx, s_ntt, -sk[c], source,
                     dnum=params.dnum_ggsw, limbs=params.limbs_evk_ggsw)
        for c in range(params.rank)
    ], axis=0)

    return EvaluationKeys(atk_glwe=atk, atk_ggsw=atk_ggsw, tsk=tsk)


def prepare(params: Params, keys: EvaluationKeys) -> EvaluationKeysPrepared:
    ctx = get_ntt_context(params.n, params.primes)
    return EvaluationKeysPrepared(
        atk_glwe={g: keyswitch.key_prepare(ctx, k) for g, k in keys.atk_glwe.items()},
        atk_ggsw={g: keyswitch.key_prepare(ctx, k) for g, k in keys.atk_ggsw.items()},
        tsk=ggsw.prepare(ctx, keys.tsk),
    )


def ggsw_automorphism(params: Params, ctx: NTTContext, ggsw_ct, g: int,
                      keys: EvaluationKeysPrepared):
    """Map GGSW(mu) (coefficient domain, [D, C, C2, Lg, N]) to
    GGSW(sigma_g(mu)) -- for monomials with g = -1:
    GGSW(X^e) -> GGSW(X^-e).

    Requires the galois element's GGSW-level key (keygen ggsw_gal_els).
    Generic in rank: the b-rows are keyswitched under sigma_g, then
    every a-row c is rebuilt as b-row x tsk[c]
    (reference coordinate_prepared.rs:119-142)."""
    D, C, C2, Lg, n = ggsw_ct.shape
    rank = params.rank
    assert C == rank + 1 and C2 == rank + 1
    assert g in keys.atk_ggsw, f"no GGSW automorphism key for g={g}"
    # b-rows: (d, c=rank) -- GLWEs encrypting mu * g_d.  Batch over d.
    rowb = ggsw_ct[:, rank]  # [D, C2, Lg, N]
    rowb = keyswitch.automorphism_ks(params, ctx, rowb, g, keys.atk_ggsw[g],
                                     out_limbs=Lg)
    # a-rows: encryptions of -s_c * sigma(mu) * g_d via the tensor key.
    rows = [ggsw.external_product(params, ctx, rowb, keys.tsk[:, c],
                                  out_limbs=Lg)
            for c in range(rank)]
    rows.append(rowb)
    return jnp.stack(rows, axis=1)  # [D, C(=rank+1), C2, Lg, N]


def ggsw_automorphism_inv(params: Params, ctx: NTTContext, ggsw_ct,
                          keys: EvaluationKeysPrepared):
    """GGSW(X^e) -> GGSW(X^-e): the write path's inversion
    (reference prepare_inv, src/coordinate_prepared.rs:119-142)."""
    return ggsw_automorphism(params, ctx, ggsw_ct, -1, keys)
