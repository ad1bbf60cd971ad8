"""FheUint -> encrypted RAM Address conversion (reference:
src/conversion.rs) -- how a VM-computed encrypted pointer becomes a RAM
address without decryption.

For each address-coordinate digit (widths from the Base2D geometry), a
GGSW blind rotation turns the bits (u >> rsh) & mask of the encrypted
u32 into GGSW(X^(+-((u>>rsh & mask) << lsh))): start from the TRIVIAL
gadget GGSW of the test vector X^0 (zero mask -- a valid zero-noise
GGSW, since only row phases matter) and CMux every row through the bit
GGSWs.  The applying bit GGSWs live at the evk_ggsw parameterization so
their digit count matches the target rows' limbs.

Sign: Ram addresses rotate by X^-a (src/address.rs:106), so digits are
inverted here (the reference's conversion emits X^(+rot) and relies on
its caller's convention; we emit the RAM-compatible sign)."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context, ntt_fwd
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import ggsw
from ..ram.address import Address, AddressPrepared
from . import circuits

I32 = jnp.int32


def _trivial_gadget_ggsw(params: Params, tv):
    """Zero-noise GGSW(tv): row (d,c) = tv * 2^-(17(d+1)) on component c.
    tv: int32[N] small integer polynomial."""
    D = params.dnum_ct
    Lg = params.limbs_ggsw
    C = params.rank + 1
    n = params.n
    rows = np.zeros((D, C, C, Lg, n), dtype=np.int32)
    tv = np.asarray(tv, dtype=np.int32)
    for d in range(D):
        for c in range(C):
            rows[d, c, c, d, :] = tv
    return limb_ops.normalize(jnp.asarray(rows))


def scalar_to_ggsw_blind_rotation(params: Params, ctx: NTTContext, tv,
                                  fheuint_prep, rsh: int, mask_bits: int,
                                  lsh: int, negate: bool = True):
    """GGSW(tv * X^(+-((u>>rsh) & (2^mask_bits-1)) << lsh)) from the
    prepared bits of u (reference scalar_to_ggsw_blind_rotation,
    consumed at src/conversion.rs:51-60)."""
    g = _trivial_gadget_ggsw(params, tv)  # [D, C, C2, Lg, N]
    D, C, C2, Lg, n = g.shape
    assert fheuint_prep.shape[2] == Lg, (
        "conversion needs bits at the GGSW-apply parameterization: "
        "encrypt_prepared(..., dnum=params.dnum_ggsw, "
        "limbs=params.limbs_evk_ggsw)")
    rows = g.reshape(D * C, C2, Lg, n)

    from ..ops.ntt_pallas import fused_path_active

    if fused_path_active(params.n) and mask_bits > 0:
        sgn = -1 if negate else 1
        rows = circuits.blind_rotate_fused(
            params, rows, fheuint_prep, range(rsh, rsh + mask_bits),
            [sgn << (lsh + j) for j in range(mask_bits)])
        return rows.reshape(D, C, C2, Lg, n)

    for j in range(mask_bits):
        amount = 1 << (lsh + j)
        if negate:
            amount = -amount
        high = poly.rotate(rows, amount)
        bit = fheuint_prep[:, rsh + j : rsh + j + 1]
        # keyed: ONE bit GGSW selects all D*C rows
        rows = circuits.cmux_keyed(params, ctx, bit, high[None], rows[None])[0]
    return rows.reshape(D, C, C2, Lg, n)


def fheuint_to_address(params: Params, ctx: NTTContext, fheuint_prep):
    """Build a full Address from an encrypted pointer: returns
    (Address, AddressPrepared) so the result can drive BOTH reads (NTT
    domain) and writes (the write path derives inverse GGSWs from the
    coefficient-domain coordinates, ram/ram.py write_impl).

    Matches the reference's Address::set_from_fheuint, which fills a
    real Address usable by Ram::read and Ram::write alike
    (src/conversion.rs:30-82, consumed at src/ram.rs:226-294)."""
    tv = np.zeros(params.n, dtype=np.int32)
    tv[0] = 1
    coords_coeff = []
    coords_prep = []
    bit_rsh = 0
    for base1d in params.base2d().rows:
        digs = []
        bit_lsh = 0
        for bmask in base1d.bases:
            digs.append(
                scalar_to_ggsw_blind_rotation(
                    params, ctx, tv, fheuint_prep, bit_rsh, bmask, bit_lsh))
            bit_lsh += bmask
            bit_rsh += bmask
        stack = jnp.stack(digs, axis=0)
        coords_coeff.append(stack)
        coords_prep.append(ggsw.prepare(ctx, stack))
    return (Address(coordinates=tuple(coords_coeff)),
            AddressPrepared(coordinates=tuple(coords_prep)))


@lru_cache(maxsize=None)
def fheuint_to_address_jit(params: Params):
    """Jitted pointer->address conversion (one compile per shape):
    fheuint_prep -> (Address, AddressPrepared)."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(lambda fheuint_prep: fheuint_to_address(
        params, ctx, fheuint_prep))
