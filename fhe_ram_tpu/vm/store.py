"""Encrypted store-width/offset selection (reference: src/store.rs).

Builds the 16-slot test vector of every (offset 0-3 x op
NONE/SB/SH/SW) store outcome -- spliced byte/halfword combinations of
the loaded word y and the stored word x -- then blind-rotates by the
encrypted offset (stride 4) and op id, and partial-traces to clean
(src/store.rs:40-143).

Splices are built from batched slot extraction (circuits.extract_slots)
instead of the reference's splice_u8/u16 key-switch helpers -- same
results, one batched trace per source word."""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import keyswitch
from . import circuits, fheuint
from .arithmetic import glwe_blind_rotation

STORE_OPS = ("none", "sb", "sh", "sw")


def _splice(params: Params, y_slots, x_slots, byte_dst: int, width: int,
            bits: int):
    """y with its `width`-byte field at byte offset `byte_dst` replaced by
    x's low bytes (reference splice_u8/u16 semantics,
    src/store.rs:92-125)."""
    lo = byte_dst * 8
    hi = lo + width * 8
    sel = jnp.concatenate(
        [y_slots[:lo], x_slots[0 : hi - lo], y_slots[hi:]], axis=0)
    return circuits.assemble_word(params, sel, bits)


def construct_store_test_vector(params: Params, ctx: NTTContext, rs2, loaded,
                                atk, bits: int = 32):
    """The 14-slot packed test vector (src/store.rs:69-143): case
    (offset, op) lands at coefficient offset*4 + op."""
    x = circuits.extract_slots(params, ctx, rs2, atk, bits)
    y = circuits.extract_slots(params, ctx, loaded, atk, bits)

    def sp(byte_dst, width):
        return _splice(params, y, x, byte_dst, width, bits)

    cases = [
        loaded, sp(0, 1), sp(0, 2), rs2,         # offset 0
        loaded, sp(1, 1), None, None,            # offset 1 (SH/SW invalid)
        loaded, sp(2, 1), sp(2, 2), None,        # offset 2 (SW invalid)
        loaded, sp(3, 1),                        # offset 3 (SH/SW invalid)
    ]
    res = None
    for case in cases:
        if res is None:
            res = jnp.zeros_like(loaded)
        if case is not None:
            res = limb_ops.normalize(res + case)
        res = poly.rotate(res, -1)
    return limb_ops.normalize(poly.rotate(res, len(cases)))


def select_store(params: Params, ctx: NTTContext, rs2, loaded, offset_prep,
                 op_prep, atk, bits: int = 32):
    """The full selection (src/store.rs:40-67): test vector, blind-rotate
    by offset<<2 then op, partial trace."""
    res = construct_store_test_vector(params, ctx, rs2, loaded, atk, bits)

    from ..ops.ntt_pallas import fused_path_active

    if fused_path_active(params.n):
        # both blind rotations (offset<<2, then op) as ONE 4-step fused
        # chain launch: the kernel takes per-step keys from any source
        from ..ops.ntt_pallas import (get_pallas_context,
                                      fused_blind_rotate_pallas)

        keys = jnp.stack([circuits.ggsw_key_rows(offset_prep, 0),
                          circuits.ggsw_key_rows(offset_prep, 1),
                          circuits.ggsw_key_rows(op_prep, 0),
                          circuits.ggsw_key_rows(op_prep, 1)])
        pctx = get_pallas_context(params.n, params.primes)
        res = fused_blind_rotate_pallas(pctx, res[None], keys,
                                        (-4, -8, -1, -2), tbt=1)[0]
    else:
        res = glwe_blind_rotation(params, ctx, res, offset_prep, 0, 2, lsh=2)
        res = glwe_blind_rotation(params, ctx, res, op_prep, 0, 2, lsh=0)
    keep_log = bits.bit_length() - 1
    return keyswitch.trace(params, ctx, res, atk, keep_log=keep_log)


@lru_cache(maxsize=None)
def select_store_jit(params: Params, bits: int = 32):
    """Jitted select_store (one compile per shape -- the VM server loop):
    (rs2, loaded, offset_prep, op_prep, atk) -> stored word."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda rs2, loaded, offset_prep, op_prep, atk:
                   select_store(params, ctx, rs2, loaded, offset_prep,
                                op_prep, atk, bits))
