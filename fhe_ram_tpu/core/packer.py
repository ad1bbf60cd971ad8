"""Log-depth batched GLWE packing (TPU re-architecture of GLWEPacker).

The reference packer streams N inserts through a sequential
automorphism-combine pipeline (poulpy GLWEPacker, consumed at
src/ram.rs:406-448) -- inherently serial.  Here packing M ciphertexts is
a balanced binary tree with log2(M) *batched* merge levels; every level
is one batched automorphism-keyswitch over all surviving pairs
(SURVEY.md §7 hard part 2).

Merge rule (merging into level l, stride t = 2^l, galois g = N/2^l + 1):

    C = (A + X^t B) + sigma_g(A - X^t B)        [unnormalized]

sigma_g fixes coefficients at multiples of 2^(l+1) and negates odd
multiples of 2^l, so C inherits A's values at even multiples of 2^l and
B's at odd ones, times 2 per level.  The 1/M normalization is done ONCE
up-front by an exact limb shift of the inputs: mid-loop divisions are
unsound (see core/keyswitch.trace docstring), whereas with pre-scaling
every mid-loop mod-1 wrap is an integer polynomial that the remaining
division-free merges keep integer, i.e. 0 mod 1.

Correctness note (why no cleanup levels): in every use in this pipeline
the packed result is later passed through a rotation + full normalized
trace, which only reads coefficients j < M.  Inductively, a level-l node
r only needs correct coefficients at positions 2^l * j with
r + 2^l * j < M, so leaves only need a correct coefficient 0 -- which raw
external-product outputs already provide.  The reference instead streams
all N slots (inserting None beyond M, ram.rs:425-444), spending ~2x the
keyswitches; we verify equivalence at the decrypted level in
tests/test_packer.py.

Scale note: each merge halves, so slot-0 values land unscaled at
coefficient j (matching the reference's normalized packer).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext
from ..ops import limb as limb_ops
from ..ops import poly
from . import keyswitch

I32 = jnp.int32

# max ct count per batched merge keyswitch.  Sized for the v1 composed
# path whose conv transients hit HBM; the v2 fold kernel keeps them in
# VMEM, so the cap only bounds the (small) gadget-digit staging buffers.
_KS_CHUNK = 4096

# optional bigger merge-kernel row block for LARGE batches (see
# _merge_level); 0 = keep the global _TBT everywhere
_TBT_BIG = int(os.environ.get("FHERAM_PACK_TBT_BIG", "0"))


def _merge_level(params: Params, ctx: NTTContext, A, B, t: int, g: int,
                 key_ntt, trunc: tuple = (None, None)):
    """One batched merge: normalize(A + X^t B + KS(sigma_g(A - X^t B))).

    On the pallas/MXU path the rotate, u/v combination, and automorphism
    all run inside the keyswitch kernel (ops/ntt_pallas.py
    fused_pack_merge_pallas); otherwise composed XLA glue +
    automorphism_ks.  trunc = (in_digits, key_limbs): optional read-path
    gadget truncation (params.Params.read_ks_digits)."""
    from ..ops import ntt as ntt_mod

    in_digits, key_limbs = trunc
    if ntt_mod.get_backend() == "pallas" and params.n == 4096:
        from ..ops import ntt_pallas

        if ntt_pallas._USE_MXU:
            pctx = ntt_pallas.get_pallas_context(params.n, ctx.primes)
            lead = A.shape[:-3]
            A2 = A.reshape((-1,) + A.shape[-3:])
            B2 = B.reshape(A2.shape)
            key_ntt = keyswitch.truncate_key(key_ntt, in_digits, key_limbs)
            P, D, rank, C2, Lk, n = key_ntt.shape
            k2 = jnp.transpose(key_ntt, (0, 2, 1, 3, 4, 5)).reshape(
                P, rank * D, C2 * Lk, n)
            # large merge batches (batched reads: thousands of pair
            # rows) can take a bigger row block per grid step;
            # FHERAM_PACK_TBT_BIG=<rows> opts in (probed round 4)
            tbt = _TBT_BIG if (_TBT_BIG and A2.shape[0] >= 1024) else None
            out = ntt_pallas.fused_pack_merge_pallas(pctx, A2, B2, t, g, k2,
                                                     tbt=tbt)
            return out.reshape(lead + out.shape[1:])

    xb = poly.rotate(B, t)
    u = A + xb
    v = A - xb
    return keyswitch.automorphism_ks(params, ctx, v, g, key_ntt,
                                     out_limbs=v.shape[-2], base_add=u,
                                     in_digits=in_digits,
                                     key_limbs=key_limbs)


# max leaf count handled by the single-launch pack-tree kernel: the
# input block + M/2-pair state must fit VMEM next to the key/spectra
# blocks (M=64 measured 16.15 MB vs the 16 MB scoped limit).
#
# MEASURED NEUTRAL-TO-WORSE at the 2^18 read (4.24 vs 3.74 ms/read):
# the per-level merge kernels batch ALL subrams' pairs per grid step
# (4-row VMPs even at the deep levels), while the one-launch tree
# processes one batch column per step and forfeits that cross-batch
# blocking below R=4 pairs.  Kept behind FHERAM_PACK_TREE=1 (bit-exact,
# tests/test_fused_chain.py) -- the launch overhead it removes is
# smaller than the batching it costs on this hardware.
_TREE_MAX = 32
_USE_TREE = os.environ.get("FHERAM_PACK_TREE") == "1"

# The one-launch tree kernel takes no gadget-truncation arguments, so
# FHERAM_PACK_TREE=1 only covers full-gadget packs; truncated packs
# (READOPT read path) run the per-level merge kernels regardless of the
# flag.  Warn once so the flag's partial coverage is visible instead of
# silent (the per-level path is bit-exact -- this is a perf surprise,
# not a correctness one).
_warned_tree_trunc = False


def _warn_tree_trunc_fallback():
    global _warned_tree_trunc
    if not _warned_tree_trunc:
        _warned_tree_trunc = True
        import warnings

        warnings.warn(
            "FHERAM_PACK_TREE=1: gadget-truncated packs (read path under "
            "PARAMS_*_READOPT) fall back to per-level merge kernels; the "
            "one-launch tree kernel only runs full-gadget packs "
            "(write/rpw path).", stacklevel=3)


def _pack_tree_fused(params: Params, ctx: NTTContext, cts, auto_keys_ntt):
    """All remaining levels in ONE kernel (ops/ntt_pallas
    fused_pack_tree_pallas).  cts: [M, ..., C, L, N], M <= _TREE_MAX."""
    from ..ops import ntt_pallas

    M = cts.shape[0]
    n = params.n
    levels = M.bit_length() - 1
    lead = cts.shape[1:-3]
    c2 = cts.shape[-3]
    flat = cts.reshape((M, -1) + cts.shape[-3:])
    ks = []
    for si in range(levels):
        g = (n >> (levels - 1 - si)) + 1
        key = auto_keys_ntt[g]  # [P, D, rank, C2, Lk, N]
        P, D, rank, C2, Lk, n_ = key.shape
        ks.append(jnp.transpose(key, (0, 2, 1, 3, 4, 5)).reshape(
            P, rank * D, C2 * Lk, n))
    pctx = ntt_pallas.get_pallas_context(n, ctx.primes)
    out = ntt_pallas.fused_pack_tree_pallas(pctx, flat, jnp.stack(ks))
    return out.reshape(lead + cts.shape[-3:])


def pack_tree(params: Params, ctx: NTTContext, cts, auto_keys_ntt: dict,
              dilate: int = 1, prescale: bool = True,
              trunc: tuple = (None, None)):
    """The dilated pack tree: packs cts[M, ..., C, L, N] so that leaf j's
    slot-0 value lands at coefficient j * dilate.

    This is the sub-tree of a (dilate*M)-leaf global pack restricted to
    the leaves congruent to a fixed residue mod `dilate` -- level ll here
    is global level ll + log2(dilate), so merges use stride
    t = dilate * 2^ll and galois g = N/(dilate*2^ll) + 1.  dilate=1,
    prescale=True reproduces pack()'s math.

    Used by the row-sharded pack (parallel/mesh.py): shard k holds the
    global leaves congruent to k mod n_shards, runs pack_tree(dilate=
    n_shards), then the gathered per-shard roots finish with
    pack_tree(dilate=1, prescale=False) over the remaining log2(n_shards)
    global levels.  prescale=True scales by the FULL global leaf count
    (M * dilate) so the cross-shard tail merges stay division-free."""
    M = cts.shape[0]
    n = params.n
    assert M & (M - 1) == 0, "pad input count to a power of two"
    assert dilate & (dilate - 1) == 0
    levels = M.bit_length() - 1
    log_d = dilate.bit_length() - 1
    assert levels + log_d <= params.log_n
    if prescale:
        shift = levels + log_d
        while shift > 0:
            s = min(shift, params.base2k - 1)
            cts = limb_ops.shift_right(cts, s)
            shift -= s
        # no normalize needed: see pack() (post-shift limbs <= 2^17)
    for ll in range(levels - 1, -1, -1):
        l = ll + log_d
        cts = _merge_level_chunked(params, ctx, cts[: 1 << ll],
                                   cts[1 << ll : 2 << ll], 1 << l,
                                   (n >> l) + 1, auto_keys_ntt[(n >> l) + 1],
                                   trunc=trunc)
    return cts[0]


def _merge_level_chunked(params: Params, ctx: NTTContext, A, B, t: int,
                         g: int, key_ntt, trunc: tuple = (None, None)):
    """_merge_level with the composed path's transients bounded: at huge
    batches the COMPOSED (non-fused) keyswitch would blow HBM on its
    staging tensors, so slice into sequential lax.map chunks; the fused
    merge kernel only streams its in/out blocks and takes any batch."""
    from ..ops.ntt_pallas import fused_path_active

    nb = int(np.prod(A.shape[:-3]))
    if nb <= _KS_CHUNK or fused_path_active(params.n):
        return _merge_level(params, ctx, A, B, t, g, key_ntt, trunc=trunc)
    step = max(1, _KS_CHUNK // max(1, nb // A.shape[0]))
    step = 1 << (step.bit_length() - 1)  # A.shape[0] is a power of 2
    step = min(step, A.shape[0])
    sliced_a = A.reshape(A.shape[0] // step, step, *A.shape[1:])
    sliced_b = B.reshape(sliced_a.shape)
    out = jax.lax.map(
        lambda s: _merge_level(params, ctx, s[0], s[1], t, g, key_ntt,
                               trunc=trunc),
        (sliced_a, sliced_b))
    return out.reshape(A.shape)


def pack_prefix(params: Params, ctx: NTTContext, cts, auto_keys_ntt: dict,
                stop_nodes: int, trunc: tuple = (None, None)):
    """The SHALLOW levels of pack(): merge cts[M, ...] down to
    stop_nodes surviving nodes and return them [stop_nodes, ..., C, L,
    N] -- prescaled by the FULL 1/M up-front, so the caller finishes
    with pack_tree(dilate=1, prescale=False) (possibly folding other
    batch members into the row axis first: the hybrid-depth batched-read
    schedule, ram._read_batch_slice)."""
    M = cts.shape[0]
    n = params.n
    assert M & (M - 1) == 0 and stop_nodes & (stop_nodes - 1) == 0
    assert 1 <= stop_nodes <= M
    levels = M.bit_length() - 1
    stop_log = stop_nodes.bit_length() - 1
    cts = limb_ops.shift_right(cts, levels)  # full prescale (see pack)
    for l in range(levels - 1, stop_log - 1, -1):
        t = 1 << l
        g = (n >> l) + 1
        cts = _merge_level_chunked(params, ctx, cts[:t], cts[t : 2 * t],
                                   t, g, auto_keys_ntt[g], trunc=trunc)
    return cts


def pack(params: Params, ctx: NTTContext, cts, auto_keys_ntt: dict,
         trunc: tuple = (None, None)):
    """Pack cts[M, ..., C, L, N] (slot-0 values v_m) into one ct whose
    coefficient m equals v_m for all m < M.  M must be a power of two
    (pad with zero ciphertexts otherwise -- an all-zero ct is an exact
    encryption of 0).  trunc = (in_digits, key_limbs): optional
    read-path gadget truncation of the merge keyswitches."""
    M = cts.shape[0]
    n = params.n
    assert M & (M - 1) == 0, "pad input count to a power of two"
    levels = M.bit_length() - 1
    if levels == 0:
        return cts[0]
    # pre-scale by 1/M once (exact limb shift; see module docstring).
    # No normalize: shift_right of normalized limbs is bounded by 2^17
    # (2^16 >> s plus a carry < 2^17), so the first merge level's
    # u/v = A +- X^t B digits stay <= 2^18 < the kernel's 2^18.58
    # digit bound (and the composed path's 2^21); deeper levels consume
    # kernel-normalized outputs.  Saves two HBM passes per pack.
    cts = limb_ops.shift_right(cts, levels)

    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and n == 4096:
        from ..ops import ntt_pallas

        if ntt_pallas._USE_MXU and _USE_TREE and trunc != (None, None):
            _warn_tree_trunc_fallback()
        if (ntt_pallas._USE_MXU and _USE_TREE
                and trunc == (None, None)):  # tree kernel: full gadget only
            # per-level merges until <= _TREE_MAX leaves remain (2^24's
            # first levels), then the whole remaining tree in ONE launch
            while cts.shape[0] > _TREE_MAX:
                l = cts.shape[0].bit_length() - 2
                cts = _merge_level(params, ctx, cts[: 1 << l],
                                   cts[1 << l : 2 << l], 1 << l,
                                   (n >> l) + 1, auto_keys_ntt[(n >> l) + 1])
            return _pack_tree_fused(params, ctx, cts, auto_keys_ntt)

    for l in range(levels - 1, -1, -1):
        t = 1 << l
        g = (n >> l) + 1
        cts = _merge_level_chunked(params, ctx, cts[:t], cts[t : 2 * t],
                                   t, g, auto_keys_ntt[g], trunc=trunc)
    return cts[0]
