"""Homomorphic bit decomposition: RAM byte VALUES -> bit-sliced FheUint.

This closes the one dataflow neither this framework nor the reference
can express (vm/cycle.py module docstring; the reference's
src/conversion.rs is one-way): a word LOADED from the encrypted RAM --
byte values at slot 0 -- re-entering the ALU, which consumes per-bit
GGSWs (vm/fheuint.py FheUintPrepared).  Going from a VALUE ciphertext
to its BITS is a bootstrapping-class operation; this module implements
it with the framework's own machinery (external products, traces, the
tensor key) as a TPU-first redesign of TFHE-style sign bootstrapping:

  1. LWE view (free): slot 0 of a GLWE is an LWE ciphertext under the
     flattened secret -- phase_0 = b_0 - sum_{c,j} alpha_{c,j} s_{c,j}
     with PUBLIC coefficients alpha read off the mask polynomials
     (alpha_{c,0} = a_c[0], alpha_{c,j} = -a_c[N-j]).
  2. Per-bit mod-switch (public arithmetic): bit k of the unsigned
     value u satisfies  bit_k(u) = MSB( frac(u * 2^-(k+1)) ), and
     frac() is free on the torus -- so EVERY bit is a SIGN test of the
     same phase under a different public scale 2^(k_pt-1-k).  No
     sequential LSB/MSB peeling: the bits of a chunk extract in
     PARALLEL (TFHE's peeling loop is inherently serial; the batched
     form runs all K accumulators through ONE shared CMux chain --
     the TPU-first restructure).
  3. Batched blind rotation: acc_k = X^(v_k) * T with
     v_k = b_k - sum alpha_k,c,j s_{c,j} (mod 2N) realized by one
     CMux per nonzero-indicator of the ternary secret:
       acc <- acc + s+_{c,j} (x) (X^(-a~) acc - acc)
       acc <- acc + s-_{c,j} (x) (X^(+a~) acc - acc)
     using a bootstrapping key of GGSW(s+), GGSW(s-) indicator bits
     (s = s+ - s-).  The negacyclic test polynomial T = -h * sum_i X^i
     turns the rotation into a sign read-out: coefficient 0 of
     X^v * T is +h for v in (0, N) and -h for v in [N, 2N) -- exactly
     h * (1 - 2 * MSB).  h pre-encodes 2^-(k_pt+1) so the final
     affine  bit = trivial(h) - out  lands bit * 2^-k_pt with NO
     mid-pipeline torus division (the division-unsoundness rule,
     core/keyswitch.trace docstring).
  4. Chunked phases for precision: a value on a boundary (all lower
     bits zero) sits exactly on the sign edge, so bits are extracted
     in chunks of `chunk` bits, low chunk first; after each phase the
     extracted bits' contribution is subtracted (exact small-integer
     scaling), which multiplies the remaining value's granularity by
     2^chunk and widens every later margin by the same factor.  With
     the half-gap offset the decision margin for bit k in a phase at
     granularity `step` is  step * 2^-(k+2)  >= 2^-(chunk+1).
  5. Clean-up + assembly: one BATCHED trace zeroes the non-slot-0
     coefficients of all K accumulator outputs; bits_to_word rotates
     bit k to coefficient k*gap (the FheUint word form), and
     bits_to_prepared lifts the bits to GGSWs via the tensor key
     (circuit-bootstrap scheme switch).  Digit row d comes from its
     OWN sign test whose test polynomial is PRE-SCALED to the gadget
     level (h = 2^-(17(d+1)+1)) -- riding the same chains as extra
     batch tests -- and every a-row is b-row (x) tsk[c], the same
     construction as core/keys.ggsw_automorphism.  The VALUE bit is
     the d=0 row scaled UP by the exact integer 2^(17-k_pt).
     Shifting a CIPHERTEXT down instead is UNSOUND (the phase's mod-1
     wrap does not divide -- the trace docstring's torus-division
     rule; measured 2^-10.7 row error before this construction).  The
     lifted GGSW is a truncated 2-digit gadget (the read-EP pattern,
     READOPT's read_ep_digits = 2).

Noise / cost pricing (production PARAMS_2_18*: N = 4096, rank 1,
k_pt = 9, xs_density 0.5, byte = 8 bits, chunk = 4):

  * Mod-switch error: std = sqrt(N * density / 12) / (2N)
    ~= 2^-9.3 torus.  Decision margin per chunk-4 phase:
    step * 2^-(k+2) >= 2^-6 -- a >= 21-sigma margin (failure
    probability < 2^-300; chunk = 8 would give only 2^-10 margin at
    0.7 sigma and is why single-phase byte extraction is unsound).
  * Output bit noise: fresh-bootstrap quality, independent of input:
    var = 2 * N * density * Var_EP(fresh GGSW at the bsk gadget) plus
    one trace (the same terms core/noise.py prices for the read path);
    the subtraction feeding phase 2 adds bit-noise * 2^k, bounded by
    2^(p-1) * bootstrap noise -- still orders below the 2^-(k_pt+1)
    decode bound.
  * Bootstrapping key: 2 * rank * N GGSWs = 8192 at production at the
    Lg=5 (k=85-grade) gadget -- Lg=3 is priced OUT by the value bit's
    2^(17-k_pt) up-scale (noise.bitdecomp_bit_noise_log2: -9.7 vs the
    -10 bound; Lg=5 gives -22.5).  Coefficient form ~7.5 GiB,
    HBM-resident on one v5e (16 GiB); the prepared (NTT) form is
    P-fold larger and does not fit, so the chain forward-NTTs each
    step's pair in-body.  Sharding the bsk rows over the mesh works
    like the RAM's.
  * Compute: ceil(8/chunk) = 2 phases x N CMux steps, batch width =
    chunk bits x gadget rows x word_size bytes (the whole word shares
    every chain step's key NTT/stream; the VMP work scales with the
    batch width).  ~16k keyed products/word vs ~10^2 per encrypted
    read: a load costs ~10^2x a read, the expected bootstrapping-class
    gap.  The chain is the fused_blind_rotate_pallas pattern with
    per-step DYNAMIC amounts; the composed path below is the
    reference implementation, an in-kernel dynamic-roll variant is
    the named follow-up.

Status: decode-checked end-to-end at a toy ring
(tests/test_bitdecomp.py: N = 64, k_pt = 4, 4-bit values, chunk = 2)
including the word assembly and the GGSW lift driving a real CMux and
the ALU, AND measured at the PRODUCTION ring on the real TPU
(scripts/bitdecomp_probe.py; see BENCH_NOTES for the numbers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext
from ..ops import limb as limb_ops
from ..ops import poly
from ..core import ggsw, keyswitch, rng
from ..core import keys as keys_mod

I32 = jnp.int32


# --------------------------------------------------------------------------
# bootstrapping key
# --------------------------------------------------------------------------

def bootstrap_key(params: Params, ctx: NTTContext, sk, s_ntt,
                  source: rng.Source, dnum: int | None = None,
                  limbs: int | None = None, prepared: bool = True):
    """GGSW indicator bits of the flattened ternary secret: entry
    (c*N+j, 0) encrypts 1{s_c[j] = +1}, entry (c*N+j, 1) encrypts
    1{s_c[j] = -1}.

    prepared=True returns the NTT form [P, rank*N, 2, D, C, C2, Lg, N]
    (small rings / tests).  prepared=False returns the COEFFICIENT form
    [rank*N, 2, D, C, C2, Lg, N]: at the production ring the prepared
    key is P-fold larger (~19 GiB at Lg=4) and cannot sit in HBM, so
    sign_bootstrap forward-NTTs each step's pair inside the chain
    instead (one 2-GGSW transform per step -- amortized against the
    step's two external products).

    dnum/limbs parameterize the bsk gadget independently of the address
    GGSWs (production needs limbs=5: Lg=3 is priced out by the value
    bits' up-scale, noise.bitdecomp_bit_noise_log2; toy rings tolerate
    3).  Client-side (consumes the secret); one-time ~2*rank*N GGSW
    encryptions."""
    sk_np = np.asarray(sk)  # [rank, N]
    n = params.n
    rows = []
    for c in range(params.rank):
        for j in range(n):
            pair = []
            for sgn in (1, -1):
                mono = np.zeros(n, dtype=np.int32)
                mono[0] = 1 if int(sk_np[c, j]) == sgn else 0
                pair.append(ggsw.encrypt(params, ctx, s_ntt,
                                         jnp.asarray(mono), source,
                                         dnum=dnum, limbs=limbs))
            rows.append(jnp.stack(pair, axis=0))
    stacked = jnp.stack(rows, axis=0)  # [rank*N, 2, D, C, C2, Lg, N]
    return ggsw.prepare(ctx, stacked) if prepared else stacked


def bootstrap_key_fast(params: Params, ctx: NTTContext, sk, s_ntt,
                       source: rng.Source, dnum: int | None = None,
                       limbs: int | None = None, chunk: int = 512):
    """bootstrap_key in the FLAT coefficient gather layout
    [rank*N, 2*D*C*C2*Lg, N] (the 3-D form sign_bootstrap gathers
    copy-free; assumes the default dnum_ct digit count), with batched
    encryption: `chunk` indicator GGSWs per jit call (the per-GGSW
    loop costs 2*rank*N dispatches -- minutes over the tunnel at
    N=4096).  Same key semantics as bootstrap_key, different RNG
    draws."""
    import jax as _jax

    from ..core import glwe as glwe_mod

    D = dnum if dnum is not None else params.dnum_ct
    Lg = limbs if limbs is not None else params.limbs_ggsw
    C = params.rank + 1
    n = params.n
    sk_np = np.asarray(sk).reshape(-1)  # [rank*N]
    bits = np.stack([(sk_np == 1), (sk_np == -1)], axis=1)  # [rank*N, 2]
    bits = bits.reshape(-1).astype(np.int32)  # [2*rank*N]

    from functools import partial as _partial

    # write each chunk into ONE donated buffer ALREADY in the flat
    # [steps, 2*D*C*C2*Lg, N] gather layout sign_bootstrap consumes: at
    # the production Lg=5 size (7.5 GiB) both a concatenate and ANY
    # post-hoc device reshape double-buffer and OOM HBM
    assert chunk % 2 == 0
    rowsz = 2 * D * C * C * Lg  # C2 == C

    @_partial(_jax.jit, donate_argnums=(0,))
    def enc_into(buf, s_ntt_, b, ka, ke, start_pair):
        M = b.shape[0]
        zeros = jnp.zeros((M, D, C, Lg, n), dtype=I32)
        rows = glwe_mod._encrypt_impl(params, ctx, s_ntt_, zeros, ka, ke)
        for d in range(D):
            for c in range(C):
                rows = rows.at[:, d, c, c, d, 0].add(b)
        rows = limb_ops.normalize(rows).reshape(M // 2, rowsz, n)
        return _jax.lax.dynamic_update_slice(buf, rows, (start_pair, 0, 0))

    total = bits.shape[0]
    buf = jnp.zeros((params.rank * n, rowsz, n), dtype=I32)
    for i in range(0, total, chunk):
        b = jnp.asarray(bits[i : i + chunk])
        buf = enc_into(buf, s_ntt, b, source.split(), source.split(),
                       jnp.int32(i // 2))
    return buf


# --------------------------------------------------------------------------
# public LWE view + per-bit mod-switch
# --------------------------------------------------------------------------

def _torus_f32(limbs):
    """Top-two-limb float32 torus value (ample for the 2N-slot
    mod-switch: dropped limbs contribute < 2^-51 * scale)."""
    t = limbs[..., 0, :].astype(jnp.float32) * jnp.float32(2.0 ** -17)
    if limbs.shape[-2] > 1:
        t = t + limbs[..., 1, :].astype(jnp.float32) * jnp.float32(2.0 ** -34)
    return t


def _msw(t, scale: int, two_n: int, offset: int):
    """round(frac(t * scale) * 2N) + offset (mod 2N), elementwise."""
    v = t * jnp.float32(scale)
    v = v - jnp.round(v)  # frac, centered
    s = jnp.round(v * jnp.float32(two_n)).astype(I32) + I32(offset)
    return jnp.mod(s, I32(two_n))


# --------------------------------------------------------------------------
# batched blind rotation (sign bootstrap)
# --------------------------------------------------------------------------

def _rot_dyn(x, a, n: int):
    """X^a * x for a TRACED amount a in [0, 2N): roll + negacyclic sign
    flip on the wrapped positions (+ global flip for a >= N).
    x: int32[..., N]."""
    sh = jnp.mod(a, n)
    r = jnp.roll(x, sh, axis=-1)
    idx = jnp.arange(n)
    sign = jnp.where(idx < sh, -1, 1).astype(x.dtype)
    r = r * jnp.reshape(sign, (1,) * (r.ndim - 1) + (n,))
    return jnp.where(a >= n, -r, r)


def _h_of(params: Params, level: int) -> tuple[int, int]:
    """(limb index, limb value) of the sign-test amplitude h for a
    test at `level`: level 0 = the VALUE scale (h = 2^-(k_pt+1), the
    extracted bit lands at bit * 2^-k_pt); level d >= 1 = the GADGET
    scale (h = 2^-(17d+1), the test emits a digit row b * 2^-17d
    directly -- the test polynomial is the pre-scaled plaintext, so no
    ciphertext ever divides; see bits_to_prepared)."""
    if level == 0:
        return 0, 1 << (16 - params.k_pt)
    # h = 2^-(17*level + 1) = limb `level` (scale 2^-17(level+1)) at
    # value 2^16; the test's +-h outputs are then 2h = 2^-17*level
    # apart -- digit row level-1 of the gadget
    return level, 1 << 16


def _test_poly_limbs(params: Params, level: int = 0):
    """T = -h * sum_i X^i at the level's scale (_h_of), as normalized
    ct limbs [L, N]."""
    n, L = params.n, params.limbs_ct
    li, hv = _h_of(params, level)
    out = jnp.zeros((L, n), dtype=I32)
    return out.at[li, :].set(-hv)


def _h_slot0(params: Params, level: int = 0):
    """Trivial ct of the level's h at slot 0 (the sign affine)."""
    n, L, C = params.n, params.limbs_ct, params.rank + 1
    li, hv = _h_of(params, level)
    ct = jnp.zeros((C, L, n), dtype=I32)
    return ct.at[params.rank, li, 0].set(hv)


def sign_bootstrap(params: Params, ctx: NTTContext, ct, bsk_prep,
                   scales, offsets, levels=None):
    """K parallel sign tests under per-test public scales: returns
    int32[K, C, L, N] with slot 0 of output k equal to
    h_k * (1 - 2 * MSB(frac(phase_0(ct_k) * scales[k]))) (+ garbage in
    the other slots; trace to clean).  ct: one GLWE [C, L, N] shared by
    every test, or [K, C, L, N] with test k reading its OWN ciphertext
    (the word-batched form: all bytes of a word share the chain).
    levels[k] picks test k's amplitude scale (_h_of; default all 0 =
    the value scale).  ONE CMux chain serves all K accumulators (the
    batch axis of every external product)."""
    n = params.n
    two_n = 2 * n
    C = params.rank + 1
    K = len(scales)
    L = params.limbs_ct
    levels = [0] * K if levels is None else list(levels)
    cts = jnp.broadcast_to(ct, (K,) + ct.shape) if ct.ndim == 3 else ct
    assert cts.shape[0] == K and len(levels) == K

    # per-test public LWE view + mod-switch
    a = _torus_f32(cts[:, : params.rank])                 # [K, rank, N]
    flipped = jnp.concatenate([a[..., :1], -a[..., :0:-1]], axis=-1)
    t_alpha = flipped.reshape(K, -1)                      # [K, rank*N]
    t_b0 = _torus_f32(cts[:, params.rank])[:, 0]          # [K]

    b_t = jnp.stack([_msw(t_b0[k : k + 1], s, two_n, o)[0]
                     for k, (s, o) in enumerate(zip(scales, offsets))])
    a_t = jnp.stack([_msw(t_alpha[k], s, two_n, 0)
                     for k, s in enumerate(scales)])      # [K, rank*N]

    # acc_k init: trivial X^(b_k) * T_k (per-level test polynomial)
    T = jnp.stack([_test_poly_limbs(params, lv) for lv in levels])
    body = jax.vmap(lambda t, b: _rot_dyn(t, b, n))(T, b_t)  # [K, L, N]
    acc = jnp.zeros((K, C, L, n), dtype=I32)
    acc = acc.at[:, params.rank].set(body)

    # CMux chain: one step per flattened secret coefficient.  The bsk
    # arrives prepared ([P, rank*N, 2, ...], small rings) or in
    # coefficient form ([rank*N, 2, ...], production -- the prepared
    # key is P-fold larger and HBM-resident only in this form; each
    # step's pair is forward-NTT'd in-body).  The coefficient bsk is
    # GATHERED per step (dynamic_index_in_dim) instead of fed as scan
    # xs: scan xs get copied into the loop's tiled layout, and the
    # 7.5 GiB production key pads 1.6x on its (Lg, N) minor dims --
    # a 12 GiB HLO temp that OOMs the chip.
    coeff_form = bsk_prep.ndim in (3, 7)
    if bsk_prep.ndim == 7:
        steps_n = bsk_prep.shape[0]
        pair_shape = bsk_prep.shape[1:]
        bsk_flat = bsk_prep.reshape(steps_n, -1, bsk_prep.shape[-1])
        bsk_steps = jnp.arange(steps_n, dtype=I32)
    elif bsk_prep.ndim == 3:
        # PRE-FLATTENED coefficient form [steps, 2*D*C*C2*Lg, N]
        # (bootstrap_key_fast emits it): reshaping a 7-D jit ARGUMENT forces a
        # full layout copy (7.5 GiB at production -- OOMs next to the
        # resident key); the flat form gathers with no copy.  Assumes
        # the default dnum_ct gadget.
        steps_n = bsk_prep.shape[0]
        D = params.dnum_ct
        Cc = params.rank + 1
        Lg = bsk_prep.shape[1] // (2 * D * Cc * Cc)
        assert bsk_prep.shape[1] == 2 * D * Cc * Cc * Lg
        pair_shape = (2, D, Cc, Cc, Lg, bsk_prep.shape[-1])
        bsk_flat = bsk_prep
        bsk_steps = jnp.arange(steps_n, dtype=I32)
    else:
        bsk_steps = jnp.moveaxis(bsk_prep, 1, 0)

    def step(acc, xs):
        key_pm, amt = xs  # [(P,) 2, D, C, C2, Lg, N] or index, [K]
        if coeff_form:
            key_pm = jax.lax.dynamic_index_in_dim(
                bsk_flat, key_pm, 0, keepdims=False).reshape(pair_shape)
            key_pm = ggsw.prepare(ctx, key_pm)  # [P, 2, D, C, C2, Lg, N]
        # the +/- CMuxes of ONE secret coefficient commute (the
        # indicators are disjoint: at most one GGSW is nonzero), so both
        # run against the SAME acc as one keyed batched product --
        # halves the launch count per chain step
        rots = []
        for sgn in (-1, 1):
            amt_pm = jnp.mod(I32(sgn) * amt, I32(two_n))
            rots.append(jax.vmap(lambda x, a: _rot_dyn(x, a, n),
                                 in_axes=(0, 0))(acc, amt_pm))
        d = limb_ops.normalize(jnp.stack(rots) - acc[None])  # [2,K,C,L,N]
        upd = ggsw.external_product_keyed(params, ctx, d, key_pm,
                                          out_limbs=L)
        return limb_ops.normalize(acc + upd[0] + upd[1]), None

    acc, _ = jax.lax.scan(step, acc, (bsk_steps, a_t.T))
    return acc


# --------------------------------------------------------------------------
# the decomposition pipeline
# --------------------------------------------------------------------------

# digit rows of the LIFTED GGSW gadget (bits_to_prepared): a truncated
# 2-digit base-2^17 gadget -- the same truncation the READOPT read path
# runs (read_ep_digits = 2), priced by noise.var_digit_trunc.  Row d
# comes from its OWN sign test at the gadget scale (test polynomial
# pre-scaled to h = 2^-(17(d+1)+1)): a ciphertext is NEVER divided.
# (The round-5 first cut shifted the bit ciphertext right instead --
# UNSOUND: the phase's mod-1 wrap integer does not divide, measured
# 2^-10.7 row error, the exact mid-loop torus-division landmine the
# trace docstring warns about.)
_LIFT_ROWS = 2


def bytes_to_bits(params: Params, ctx: NTTContext, byte_cts, bsk_prep, atk,
                  p: int, chunk: int = 4, with_rows: bool = False):
    """Wb RAM byte ciphertexts ([Wb, C, L, N], SIGNED p-bit values at
    slot 0, ram.encrypt_ram convention) -> int32[Wb, p, C, L, N]:
    bit k of the UNSIGNED byte value x mod 2^p, encoded bit * 2^-k_pt
    (clean: all other slots traced to zero).  The sign tests extract
    the bits of u = x + 2^(p-1), which match the unsigned byte's for
    k < p-1; the MSB comes out flipped and is flipped back by an exact
    trivial subtraction.

    with_rows=True additionally returns [Wb, p, _LIFT_ROWS, C, L, N]:
    per bit the GADGET-scale digit rows (row d = bit * 2^-17(d+1)) for
    the GGSW lift -- produced by the SAME chains at pre-scaled test
    polynomials.  The VALUE bit is the d=0 row scaled UP by the exact
    integer 2^(17-k_pt) (multiplication is sound; division is not).

    chunk bits extract per phase (see module docstring step 4); every
    phase is ONE batched blind rotation (K = Wb * chunk * rows
    accumulators share the chain's key NTT/streaming/launches; the
    per-step VMP work scales with K) + one batched trace."""
    assert p <= params.k_pt, "value must fit the plaintext precision"
    n = params.n
    Wb = byte_cts.shape[0]
    C, L = params.rank + 1, params.limbs_ct
    R = _LIFT_ROWS if with_rows else 1
    # unsigned shift: u = x + 2^(p-1)  (exact trivial add at slot 0;
    # 2^(p-1) * 2^(17-k_pt) at the limb-0 scale)
    off = jnp.zeros((C, L, n), dtype=I32)
    off = off.at[params.rank, 0, 0].set(1 << (17 - params.k_pt + p - 1))
    u_cts = limb_ops.normalize(byte_cts + off[None])

    bits, rows = [], []
    step = 1
    for lo in range(0, p, chunk):
        ks = list(range(lo, min(lo + chunk, p)))
        kc = len(ks)
        # tests: per byte, per chunk bit, per gadget level 1..R (test
        # (i*kc + j)*R + (lv-1)); the mod-switch depends only on the
        # bit, the test polynomial only on the level
        scales, offsets, levels = [], [], []
        for _ in range(Wb):
            for k in ks:
                for lv in range(1, R + 1):
                    scales.append(1 << (params.k_pt - 1 - k))
                    # half-gap offset: step * 2^-(k+2) of the SCALED
                    # phase, in slots
                    offsets.append(
                        int(round(step * 2.0 ** (-(k + 2)) * 2 * n)))
                    levels.append(lv)
        cts = jnp.repeat(u_cts, kc * R, axis=0)
        acc = sign_bootstrap(params, ctx, cts, bsk_prep, scales, offsets,
                             levels)
        tr = keyswitch.trace(params, ctx, acc, atk)  # [Wb*kc*R, C, L, N]
        tr = tr.reshape((Wb, kc, R) + tr.shape[1:])
        h_stack = jnp.stack([_h_slot0(params, lv)
                             for lv in range(1, R + 1)])  # [R, C, L, N]
        rk = limb_ops.normalize(h_stack[None, None] - tr)
        # value bit = d=0 row * 2^(17 - k_pt): exact integer up-scale
        bk = limb_ops.normalize(rk[:, :, 0] * (1 << (17 - params.k_pt)))
        if lo + chunk < p:
            # subtract the extracted contribution (exact integer scale):
            # u <- u - sum_k b_k(u) * 2^k, granularity -> 2^(lo+chunk)
            contrib = sum(bk[:, i] * (1 << k) for i, k in enumerate(ks))
            u_cts = limb_ops.normalize(u_cts - contrib)
            step <<= chunk
        if p - 1 in ks:
            # final phase: bit_{p-1}(u) = 1 - bit_{p-1}(byte) -- flip
            # back exactly so outputs are the UNSIGNED byte's bits
            i = ks.index(p - 1)
            one = jnp.zeros((C, L, n), dtype=I32).at[
                params.rank, 0, 0].set(1 << (17 - params.k_pt))
            bk = bk.at[:, i].set(
                limb_ops.normalize(one[None] - bk[:, i]))
            ones_r = jnp.zeros((R, C, L, n), dtype=I32)
            for lv in range(1, R + 1):
                ones_r = ones_r.at[lv - 1, params.rank, lv - 1, 0].set(1)
            rk = rk.at[:, i].set(
                limb_ops.normalize(ones_r[None] - rk[:, i]))
        bits.append(bk)
        rows.append(rk)
    bits = jnp.concatenate(bits, axis=1)  # [Wb, p, C, L, N]
    if with_rows:
        return bits, jnp.concatenate(rows, axis=1)
    return bits


def byte_to_bits(params: Params, ctx: NTTContext, byte_ct, bsk_prep, atk,
                 p: int, chunk: int = 4):
    """Single-byte form of bytes_to_bits: [C, L, N] -> [p, C, L, N]."""
    return bytes_to_bits(params, ctx, byte_ct[None], bsk_prep, atk, p,
                         chunk=chunk)[0]


def bits_to_word(params: Params, bit_cts, bits: int):
    """Clean bit GLWEs [p, C, L, N] -> FheUint word form (bit k at
    coefficient k * gap): a rotation sum, exact."""
    from . import fheuint

    g = fheuint.gap(params, bits)
    p = bit_cts.shape[0]
    word = bit_cts[0]
    for k in range(1, p):
        word = word + poly.rotate(bit_cts[k], k * g)
    return limb_ops.normalize(word)


def bits_to_prepared(params: Params, ctx: NTTContext, bit_rows,
                     keys: keys_mod.EvaluationKeysPrepared):
    """Gadget-scale digit rows [p, _LIFT_ROWS, C, L, N] (from
    bytes_to_bits(with_rows=True): row d = GLWE(b * 2^-17(d+1)) with a
    fresh bootstrap mask) -> FheUintPrepared GGSW stack
    [P, p, D=_LIFT_ROWS, C, C2, Lg, N]: the circuit-bootstrap scheme
    switch.  Every a-row c is b-row (x) tsk[c] =
    GLWE(-s_c * b * 2^-17(d+1)) -- the same tensor-key construction as
    core/keys.ggsw_automorphism (keys.rs analog).  The result is a
    TRUNCATED 2-digit gadget (the read-EP truncation pattern,
    params.read_ep_digits = 2 in READOPT); external products slice the
    operand to the key's digit count automatically."""
    Lg = params.limbs_ggsw
    rank = params.rank
    D = bit_rows.shape[1]
    digit_rows = []
    for d in range(D):
        # pad to the GGSW row precision (appends zero LOW limbs: value-
        # preserving, no division anywhere)
        row_b = limb_ops.resize_limbs(bit_rows[:, d], Lg)  # [p, C, Lg, N]
        rows_a = [
            ggsw.external_product(params, ctx, row_b, keys.tsk[:, c],
                                  out_limbs=Lg)
            for c in range(rank)
        ]
        digit_rows.append(jnp.stack(rows_a + [row_b], axis=1))
    # [p, D, C(row), C2(GLWE component), Lg, N] -- the ggsw.py layout
    stacked = jnp.stack(digit_rows, axis=1)
    return ggsw.prepare(ctx, stacked)


def load_word(params: Params, ctx: NTTContext, fetched_bytes, bsk_prep,
              keys: keys_mod.EvaluationKeysPrepared, bits: int):
    """The VM LOAD: a fetched RAM word (ram read output, [W, C, L, N]
    byte values) -> (word_form, prepared) FheUint -- the dataflow
    vm/cycle.py could not previously express.  bits = 8 * W at the
    production geometry; the toy ring uses smaller."""
    W = fetched_bytes.shape[0]
    p = bits // W
    bit_cts, rows = bytes_to_bits(params, ctx, fetched_bytes, bsk_prep,
                                  keys.atk_glwe, p, with_rows=True)
    bit_cts = bit_cts.reshape((bits,) + fetched_bytes.shape[1:])
    rows = rows.reshape((bits,) + rows.shape[2:])  # [bits, D, C, L, N]
    word = bits_to_word(params, bit_cts, bits)
    prepared = bits_to_prepared(params, ctx, rows, keys)
    return word, prepared
