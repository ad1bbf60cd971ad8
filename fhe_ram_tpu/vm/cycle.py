"""One full encrypted Phantom-VM instruction cycle, as ONE jitted step.

The reference ships three VM components -- the RV32I ALU
(src/arithmetic.rs), the store-width selector (src/store.rs), and the
pointer->Address conversion (src/conversion.rs) -- but never composes
them with the RAM: each is tested in isolation.  This module chains

    eval_ops -> select_rd            (ALU + register write-back)
    select_store                     (store-width/offset merge)
    fheuint_to_address               (encrypted pointer -> RAM address)
    RAM read_prepare_write -> write  (fetch + store at the pointer)

into one jit-compiled, decode-checked instruction step (timed at the
production ring by scripts/vm_cycle_probe.py; CPU-tested at the VM test
ring in tests/test_vm_cycle.py).

The one representation bridge the composition needs -- absent from the
reference -- is `word_to_ram_bytes`: the VM's FheUint word form carries
bit j of the value at coefficient j*gap (vm/fheuint.py), while the RAM
stores byte i of a word as a signed-i8 VALUE at slot 0 of subram i
(ram/ram.py encrypt_ram, reference src/ram.rs:358-379).  Repacking is
cheap homomorphically: one batched trace extracts all `bits` bit-slots,
then exact +-2^k weighted sums assemble the signed bytes.  The REVERSE
bridge -- RAM byte values back to bit-sliced FheUint form -- is a
homomorphic bit decomposition, a bootstrapping-class operation that
the reference does NOT provide (src/conversion.rs is one-way) but this
framework now does: vm/bitdecomp.py (batched sign bootstraps +
tensor-key GGSW lift; decode-checked in tests/test_bitdecomp.py).  The
default cycle still takes store operands from the encrypted register
file (where a RISC-V store's operands live); a LOAD instruction chains
rpw's fetched word through bitdecomp.load_word into the next cycle's
ALU operands at bootstrapping cost (~100x a read; priced in the
bitdecomp module docstring).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import keyswitch
from ..core import keys as keys_mod
from ..ram import ram as ram_mod
from . import arithmetic, conversion, fheuint, store
from .arithmetic import RVI32_OPS

I32 = jnp.int32


def word_to_ram_bytes(params: Params, ctx: NTTContext, word_ct, atk,
                      bits: int = 32):
    """FheUint word-form GLWE -> RAM write word [bits//8, C, L, N].

    byte i = sum_{k<7} 2^k * bit_{8i+k} - 128 * bit_{8i+7}, the RAM's
    signed-i8 byte convention (glwe.cast_u8_signed; reference
    src/ram.rs:365), each produced at slot 0 by a trace of the rotated
    word.  All `bits` extractions run as ONE batched trace launch."""
    assert bits % 8 == 0
    g = fheuint.gap(params, bits)
    rots = jnp.stack([poly.rotate(word_ct, -(j * g)) for j in range(bits)],
                     axis=0)
    ext = keyswitch.trace(params, ctx, rots, atk)  # [bits, C, L, N]
    nb = bits // 8
    ext = ext.reshape((nb, 8) + word_ct.shape)
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, -128], I32)
    out = jnp.sum(ext * w[None, :, None, None, None], axis=1)
    return limb_ops.normalize(out)


def vm_cycle(params: Params, ctx: NTTContext,
             keys: keys_mod.EvaluationKeysPrepared,
             rs1p, rs2p, immp, op_id_prep,
             rs2_word, loaded_word, offset_prep, storeop_prep,
             ptr_prep, data, ops=RVI32_OPS, bits: int = 32):
    """One encrypted instruction cycle.  Everything marked (E) is
    ciphertext; the server learns nothing.

      rs1p/rs2p/immp (E): ALU operands, FheUintPrepared bit GGSWs
      op_id_prep (E): ALU op selector (blind-rotation GGSW bits)
      rs2_word/loaded_word (E): store operands, FheUint word form
      offset_prep/storeop_prep (E): store byte-offset and width selectors
      ptr_prep (E): the store pointer, FheUintPrepared at the GGSW-apply
        parameterization (dnum_ggsw/limbs_evk_ggsw)
      data (E): the RAM state array [W, R, C, L, N]

    Returns (rd_word, fetched_ram_word, new_data):
      rd_word (E): ALU result, register write-back value
      fetched_ram_word (E): the RAM word AT THE POINTER before the store
      new_data (E): RAM with select_store's merged word written at the
        pointer."""
    assert bits == 8 * params.word_size, (
        "cycle writes bits/8 bytes; match params.word_size")
    atk = keys.atk_glwe
    packed = arithmetic.eval_ops(params, ctx, rs1p, rs2p, immp, atk, ops,
                                 bits)
    rd = arithmetic.select_rd(params, ctx, packed, op_id_prep, len(ops), atk,
                              bits)
    sw = store.select_store(params, ctx, rs2_word, loaded_word, offset_prep,
                            storeop_prep, atk, bits)
    addr, addr_prep = conversion.fheuint_to_address(params, ctx, ptr_prep)
    fetched, data2, tree = ram_mod.rpw_impl(params, ctx, data,
                                            addr_prep.coordinates, atk)
    wbytes = word_to_ram_bytes(params, ctx, sw, atk, bits)
    data3 = ram_mod.write_impl(params, ctx, data2, tree, wbytes,
                               addr.coordinates, keys)
    return rd, fetched, data3


@lru_cache(maxsize=None)
def vm_cycle_jit(params: Params, ops=RVI32_OPS, bits: int = 32):
    """Jitted instruction cycle (one compile per geometry); donates the
    RAM buffer like FheRam's rpw/write."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(
        lambda keys, rs1p, rs2p, immp, op_id_prep, rs2_word, loaded_word,
               offset_prep, storeop_prep, ptr_prep, data:
        vm_cycle(params, ctx, keys, rs1p, rs2p, immp, op_id_prep, rs2_word,
                 loaded_word, offset_prep, storeop_prep, ptr_prep, data,
                 ops, bits),
        donate_argnums=(10,))
