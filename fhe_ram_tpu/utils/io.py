"""Serialization of keys, addresses, and RAM state (checkpoint/resume).

The reference exposes raw getters/setters on EvaluationKeys for external
serialization and keeps ciphertexts as plain byte buffers
(src/keys.rs:88-131; SURVEY.md §5 checkpoint notes) but ships no format.
Here: a single .npz per object, int32 arrays, with a manifest entry
recording the Params so loads can be validated.
"""

from __future__ import annotations

import json
from dataclasses import asdict

import numpy as np
import jax.numpy as jnp

from ..params import Params
from ..core.keys import EvaluationKeys, EvaluationKeysPrepared
from ..ram.address import Address


def _params_json(params: Params) -> str:
    return json.dumps(asdict(params), sort_keys=True)


def _check_params(meta, params: Params):
    if params is not None and json.loads(meta) != json.loads(_params_json(params)):
        raise ValueError("checkpoint was written with different Params")


def save_keys(path: str, params: Params, keys: EvaluationKeys):
    arrays = {f"atk_{g}": np.asarray(v) for g, v in keys.atk_glwe.items()}
    arrays.update({f"atkg_{g}": np.asarray(v) for g, v in keys.atk_ggsw.items()})
    arrays["tsk"] = np.asarray(keys.tsk)
    np.savez_compressed(path, __params__=_params_json(params), **arrays)


def load_keys(path: str, params: Params | None = None) -> EvaluationKeys:
    z = np.load(path, allow_pickle=False)
    _check_params(str(z["__params__"]), params)
    atk, atk_ggsw = {}, {}
    for k in z.files:
        if k.startswith("atkg_"):
            atk_ggsw[int(k[5:])] = jnp.asarray(z[k])
        elif k.startswith("atk_"):
            atk[int(k[4:])] = jnp.asarray(z[k])
    return EvaluationKeys(
        atk_glwe=atk,
        atk_ggsw=atk_ggsw,
        tsk=jnp.asarray(z["tsk"]),
    )


def save_ram_state(path: str, params: Params, data, tree=()):
    arrays = {"data": np.asarray(data)}
    for i, t in enumerate(tree):
        arrays[f"tree_{i}"] = np.asarray(t)
    np.savez_compressed(path, __params__=_params_json(params),
                        __tree_levels__=len(tree), **arrays)


def load_ram_state(path: str, params: Params | None = None):
    z = np.load(path, allow_pickle=False)
    _check_params(str(z["__params__"]), params)
    levels = int(z["__tree_levels__"])
    data = jnp.asarray(z["data"])
    tree = tuple(jnp.asarray(z[f"tree_{i}"]) for i in range(levels))
    return data, tree


def save_address(path: str, params: Params, addr: Address):
    arrays = {f"coord_{i}": np.asarray(c) for i, c in enumerate(addr.coordinates)}
    np.savez_compressed(path, __params__=_params_json(params),
                        __n2__=len(addr.coordinates), **arrays)


def load_address(path: str, params: Params | None = None) -> Address:
    z = np.load(path, allow_pickle=False)
    _check_params(str(z["__params__"]), params)
    n2 = int(z["__n2__"])
    return Address(coordinates=tuple(jnp.asarray(z[f"coord_{i}"]) for i in range(n2)))
