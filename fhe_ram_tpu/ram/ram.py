"""The FHE-RAM engine: encrypted read / read_prepare_write / write.

TPU-first design vs the reference (src/ram.rs):
  * all WORDSIZE subrams are batched into one leading axis (the reference
    loops them sequentially, ram.rs:187-190);
  * per-row CMux external products are batched over the row axis;
  * packing is the log-depth batched tree (core/packer.py);
  * the write path's per-slot extraction loop (ram.rs:612-630, N
    sequential double-traces) is re-architected as a log-depth binary
    split tree of batched trace steps (core/keyswitch.extract_slots);
  * state is functional: (data, tree) arrays in / out, jit-compiled once
    per geometry.

State layout:
  data: int32[W, R, C, L, N]      (W subrams, R = ceil(max_addr/N) rows)
  tree: tuple of int32[W, R_i, C, L, N]  (persistent packing levels,
        reference ram.rs:306-332)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from ..ops.ntt import NTTContext, get_ntt_context
from ..ops import limb as limb_ops
from ..core import glwe, ggsw, keyswitch, packer, rng
from ..core import keys as keys_mod
from . import address as address_mod

I32 = jnp.int32


# --------------------------------------------------------------------------
# client-side: RAM encryption / decryption helpers
# --------------------------------------------------------------------------

def encrypt_ram(params: Params, ctx: NTTContext, s_ntt, data_bytes,
                source: rng.Source):
    """Encrypt the RAM content (reference Ram::encrypt_sk,
    src/ram.rs:129-167): byte j of word i lands in subram j, encoded as a
    signed i8 at precision k_pt, N values per GLWE row."""
    W = params.word_size
    R = params.num_rows
    n = params.n
    data_bytes = np.asarray(data_bytes, dtype=np.uint8)
    assert data_bytes.size == params.max_addr * W
    words = data_bytes.reshape(params.max_addr, W)
    signed = words.astype(np.int8).astype(np.int32)  # i8 cast (ram.rs:365)
    padded = np.zeros((R * n, W), dtype=np.int32)
    padded[: params.max_addr] = signed
    vals = padded.T.reshape(W, R, n)  # [W, R, N]
    pt = glwe.encode_vec(params, jnp.asarray(vals))  # [W, R, L, N]
    return glwe.encrypt(params, ctx, s_ntt, pt, source)  # [W, R, C, L, N]


def make_tree(params: Params):
    """Zero-initialized persistent packing tree."""
    C = params.rank + 1
    return tuple(
        jnp.zeros((params.word_size, r, C, params.limbs_ct, params.n), dtype=I32)
        for r in params.tree_shape()
    )


def encrypt_write_word(params: Params, ctx: NTTContext, s_ntt, word_bytes,
                       source: rng.Source):
    """Encrypt a word to write: per byte one GLWE of [w, 0, ..., 0]
    (reference: encrypt_glwe in examples/fhe-ram.rs:179-210)."""
    W = params.word_size
    vals = np.zeros((W, params.n), dtype=np.int32)
    vals[:, 0] = np.asarray(word_bytes, dtype=np.uint8).astype(np.int8)
    pt = glwe.encode_vec(params, jnp.asarray(vals))
    return glwe.encrypt(params, ctx, s_ntt, pt, source)  # [W, C, L, N]


# --------------------------------------------------------------------------
# server-side: jitted read / rpw / write implementations
# --------------------------------------------------------------------------

def _pack_rows(params: Params, ctx: NTTContext, cur, atk,
               trunc: tuple = (None, None)):
    """Pack each N-row chunk's slot-0s into one row: [W, R, C, L, N] ->
    [W, ceil(R/N), C, L, N]."""
    W, R = cur.shape[0], cur.shape[1]
    n = params.n
    chunks = -(-R // n)
    outs = []
    for c in range(chunks):
        rows = cur[:, c * n : (c + 1) * n]
        Rc = rows.shape[1]
        M = 1 << (Rc - 1).bit_length() if Rc > 1 else 1
        if M != Rc:
            pad = jnp.zeros((W, M - Rc) + rows.shape[2:], dtype=cur.dtype)
            rows = jnp.concatenate([rows, pad], axis=1)
        cts = jnp.moveaxis(rows, 1, 0)  # [M, W, C, L, N]
        outs.append(packer.pack(params, ctx, cts, atk, trunc=trunc))
    return jnp.stack(outs, axis=1)


# max ct rows per external-product slice: caps the transient NTT/conv
# intermediates (~B * 8 limb-polys * 3 primes * 16KB each) so very large
# geometries (2^24: 16384 rows) fit single-chip HBM; the slices are
# sequential in the schedule and XLA reuses their buffers.
# Scope note (round-4 re-probe): this bound governs only the COMPOSED
# backend (CPU tests / butterfly) -- _chunked_product bypasses it
# whenever the fused kernels serve the ring (fused_path_active), so it
# has no effect on TPU production timings.
_PRODUCT_CHUNK_ROWS = 1024


def _fused_kernel_path(params: Params) -> bool:
    from ..ops.ntt_pallas import fused_path_active

    return fused_path_active(params.n)


def _chunked_product(params: Params, ctx: NTTContext, cur, coord,
                     trunc: tuple = (None, None)):
    W, R = cur.shape[0], cur.shape[1]
    if W * R <= _PRODUCT_CHUNK_ROWS or _fused_kernel_path(params):
        return address_mod.coordinate_product(params, ctx, cur, coord,
                                              trunc=trunc)
    # lax.map (not an unrolled python loop): XLA's scheduler interleaves
    # independent unrolled slices and keeps all their temps live; the
    # sequential loop reuses one slice's buffers.
    step = max(1, _PRODUCT_CHUNK_ROWS // W)
    if R % step != 0:
        # non-divisible geometry: unrolled slices (rare; memory-looser)
        outs = [address_mod.coordinate_product(
                    params, ctx, cur[:, r0 : r0 + step], coord, trunc=trunc)
                for r0 in range(0, R, step)]
        return jnp.concatenate(outs, axis=1)
    sliced = cur.reshape(cur.shape[0], R // step, step, *cur.shape[2:])
    sliced = jnp.moveaxis(sliced, 1, 0)  # [nslices, W, step, C, L, N]
    out = jax.lax.map(
        lambda s: address_mod.coordinate_product(params, ctx, s, coord,
                                                 trunc=trunc), sliced)
    return jnp.moveaxis(out, 0, 1).reshape(
        cur.shape[0], R, *out.shape[3:])


def read_impl(params: Params, ctx: NTTContext, data, coords, atk):
    """Encrypted read (reference SubRam::read, src/ram.rs:382-459), all
    subrams batched.  coords: tuple of prepared coordinates.

    Read results are ephemeral, so the whole pipeline runs with the
    params' READ-path gadget truncation (params.Params.read_ks_digits
    ff.; the write path never truncates)."""
    ept, kst = params.read_ep_trunc, params.read_ks_trunc
    n2 = len(coords)
    cur = data
    for i in range(n2 - 1):
        cur = _chunked_product(params, ctx, cur, coords[i], trunc=ept)
        cur = _pack_rows(params, ctx, cur, atk, trunc=kst)
    cur = address_mod.coordinate_product(params, ctx, cur[:, 0],
                                         coords[n2 - 1], trunc=ept)
    return keyswitch.trace(params, ctx, cur, atk, trunc=kst)  # [W, C, L, N]


# addresses per batched-read slice: the level-0 intermediate is
# [B, W, R, C, L, N] (~100 MB per address at 2^18), so one slice of 64
# is near the single-chip HBM sweet spot (measured: B=256 unsliced
# OOMs; B=64 runs at 104 reads/s); larger batches run slices
# sequentially under lax.map at the per-slice rate.  Env-overridable
# for re-probing (round-4 hygiene: 64 was tuned pre-READOPT).
_BATCH_CHUNK = int(os.environ.get("FHERAM_BATCH_CHUNK", "64"))

# Batched-read pack scheduling: the batch-FOLDED pack (all B*W trees in
# one merge-kernel sequence) degrades per-row with batch width (round-4
# pack_scale_probe: 1.24 ms/read-equiv at nb=4 -> 1.83 at nb=256; the
# merge KERNEL itself is flat, the loss is glue/scheduling at GB-scale
# operands), while the level-0 batched kernel amortizes well.  The
# SLICED schedule packs per-address under lax.map (nb=W rows per merge
# like a sequential read) and keeps the batched level-0 -- the hybrid
# beats both the folded batch and the sequential scan.
_BATCH_PACK_SLICED = os.environ.get("FHERAM_BATCH_PACK_SLICED", "1") == "1"

# Hybrid-DEPTH refinement (round 5): per-address slicing runs each
# address's deep merge levels at tiny row counts (the last level is one
# W-row VMP call per address -- under the fused kernel's 4-row
# blocking when W < 4, and launch-bound regardless), exactly where the
# folded batch amortizes best.  With FHERAM_BATCH_PACK_DEEP = d > 0 the
# sliced pack stops at d surviving nodes per address (packer.
# pack_prefix under lax.map) and the remaining log2(d) levels run ONCE
# with the batch folded into the row axis (B*W*pairs-row merges).
# 0 disables (pure per-address slicing, the round-4 default).
_BATCH_PACK_DEEP = int(os.environ.get("FHERAM_BATCH_PACK_DEEP", "0"))


def read_batch_impl(params: Params, ctx: NTTContext, data, coords_b, atk,
                    data_ntt=None):
    """Batched encrypted read at B addresses (BASELINE config 3; the
    reference has no batched path).  coords_b: tuple of stacked prepared
    coordinates, leading axis B.  B > _BATCH_CHUNK is processed in
    HBM-bounded slices (sequential lax.map, see _chunked_product note).

    Amortizes address-independent work instead of vmapping read_impl
    (round-1 finding: plain vmap REGRESSES -- transient blowup):
      * the level-0 forward NTT of the RAM's gadget digits runs ONCE
        per batch slice (shared spectral input to the fold kernel) --
        or ZERO times when the caller passes the data_ntt spectral
        cache (FheRam.spectral_cache; read-heavy workloads);
      * upper-level CMux chains run with per-address keys in one
        batch-gridded kernel launch instead of B separate dispatches;
      * pack and trace run with the batch folded into the row axis
        (B*W rows per kernel call instead of W)."""
    B = coords_b[0].shape[0]
    k = _BATCH_CHUNK
    if B > k:
        nfull = B // k
        parts = []
        sl = tuple(c[: nfull * k].reshape((nfull, k) + c.shape[1:])
                   for c in coords_b)
        outs = jax.lax.map(
            lambda cs: _read_batch_slice(params, ctx, data, cs, atk,
                                         data_ntt), sl)
        parts.append(outs.reshape((nfull * k,) + outs.shape[2:]))
        if B % k:
            parts.append(_read_batch_slice(
                params, ctx, data,
                tuple(c[nfull * k :] for c in coords_b), atk, data_ntt))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return _read_batch_slice(params, ctx, data, coords_b, atk, data_ntt)


def _read_batch_slice(params: Params, ctx: NTTContext, data, coords_b, atk,
                      data_ntt=None):
    ept, kst = params.read_ep_trunc, params.read_ks_trunc
    n2 = len(coords_b)
    B = coords_b[0].shape[0]
    W = data.shape[0]
    # [B, W, R, C, L, N]
    cur = address_mod.coordinate_product_batched(params, ctx, data,
                                                 coords_b[0], data_ntt,
                                                 trunc=ept)
    for i in range(1, n2):
        if (_BATCH_PACK_SLICED and B > 1 and _BATCH_PACK_DEEP > 0
                and cur.shape[2] <= params.n
                and _BATCH_PACK_DEEP < (1 << (cur.shape[2] - 1).bit_length())):
            # hybrid depth (see _BATCH_PACK_DEEP): shallow levels
            # per-address, deep levels folded across the batch
            stop = _BATCH_PACK_DEEP

            def _prefix(a):
                W_, Rc = a.shape[0], a.shape[1]
                M = 1 << (Rc - 1).bit_length() if Rc > 1 else 1
                if M != Rc:
                    pad = jnp.zeros((W_, M - Rc) + a.shape[2:], a.dtype)
                    a = jnp.concatenate([a, pad], axis=1)
                cts = jnp.moveaxis(a, 1, 0)  # [M, W, C, L, N]
                return packer.pack_prefix(params, ctx, cts, atk, stop,
                                          trunc=kst)  # [stop, W, C, L, N]

            pref = jax.lax.map(_prefix, cur)  # [B, stop, W, C, L, N]
            cts = jnp.moveaxis(pref, 1, 0).reshape(
                (stop, B * W) + pref.shape[3:])
            root = packer.pack_tree(params, ctx, cts, atk, dilate=1,
                                    prescale=False, trunc=kst)
            cur = root.reshape((B, W, 1) + root.shape[1:])
        elif _BATCH_PACK_SLICED and B > 1:
            # per-address pack under lax.map (see _BATCH_PACK_SLICED)
            cur = jax.lax.map(
                lambda a: _pack_rows(params, ctx, a, atk, trunc=kst), cur)
        else:
            flat = cur.reshape((B * W,) + cur.shape[2:])
            flat = _pack_rows(params, ctx, flat, atk, trunc=kst)
            cur = flat.reshape((B, W) + flat.shape[1:])
        if i == n2 - 1:
            cur = cur[:, :, 0]  # [B, W, C, L, N]
        cur = address_mod.coordinate_product_perbatch(params, ctx, cur,
                                                      coords_b[i], trunc=ept)
    out = keyswitch.trace(params, ctx,
                          cur.reshape((B * W,) + cur.shape[2:]), atk,
                          trunc=kst)
    return out.reshape((B, W) + out.shape[1:])


def rpw_impl(params: Params, ctx: NTTContext, data, coords, atk):
    """read_prepare_write (reference src/ram.rs:461-542): identical output
    to read, and persists the rotated levels the write needs.

    Exact-data-carry restructure (round 4): the reference (and rounds
    1-3 here) persists the ROTATED base level and the write walks it
    back with the inverse coordinate -- every RAM row passes TWO
    external products per cycle.  But the final inverse product
    distributes over the delta add:

        inv0 (x) (X^-a0 data + t_d)  =  data + inv0 (x) t_d

    so the base level never needs to persist (nor be touched): the
    state keeps the ORIGINAL data rows exactly, and write adds the
    inverse-rotated delta rows (write_impl).  Plaintext-identical;
    strictly less noise on carried rows (the two rotation EPs vanish
    from the per-cycle accumulation, core/noise.write_cycle_added_var);
    at 2^24 the persisted tree shrinks by the 1.5 GB base level.

    Gadget truncation: the products/packs here feed the write ONLY
    through the delta (see above), so they may run the params'
    RPW-path truncation (params.Params.rpw_ks_digits ff., priced by
    core/noise.write_cycle_added_var; None by default); the final
    trace (read output, ephemeral) uses the READ truncation."""
    ept, kst = params.rpw_ep_trunc, params.rpw_ks_trunc
    n2 = len(coords)
    levels = []
    cur = data
    for i in range(n2):
        cur = _chunked_product(params, ctx, cur, coords[i], trunc=ept)
        levels.append(cur)
        if i < n2 - 1:
            cur = _pack_rows(params, ctx, cur, atk, trunc=kst)
    out = keyswitch.trace(params, ctx, levels[-1][:, 0], atk,
                          trunc=params.read_ks_trunc)
    # persist only the levels the write reads: the packed upper levels
    # (the root carries the read slot), and for the single-level
    # geometry the rotated base IS the root
    tree = tuple(levels[1:]) if n2 > 1 else (levels[0],)
    return out, data, tree


def rmw_batch_impl(params: Params, ctx: NTTContext, data, coords_prep_b,
                   coords_coeff_b, w_b, keys: keys_mod.EvaluationKeysPrepared,
                   data_ntt=None):
    """Batched read-modify-write at B DISTINCT encrypted addresses in
    ONE jit (round 4; no reference counterpart -- enabled by the
    exact-data-carry write: rpw leaves the data untouched, so B deltas
    simply ADD:  data' = data + sum_b inv0_b (x) t_d_b).

    Semantics: all B reads see the PRE-write state (vectorized-store
    semantics).  Addresses must be DISTINCT -- a duplicated address
    would sum two (w - old) deltas; this cannot be checked under
    encryption, so it is the caller's contract (same as any parallel
    store).

    coords_prep_b:  tuple over coordinates of stacked PREPARED coords
        [B, P, dig, ...] (mesh.stack_addresses);
    coords_coeff_b: the same stacking of the COEFFICIENT-domain coords
        (the inverse GGSWs are derived in here);
    w_b: int32[B, W, C, L, N] encrypted write words.

    Returns (outs, new_data): outs int32[B, W, C, L, N] -- the values
    AT the addresses before the write (the rpw read-out, from the same
    full-gadget root trace that feeds the delta, so it is slightly
    LESS noisy than a truncated batched read).

    Generic in geometry (round 5): any n2 and any row count -- the
    forward walk packs per address level by level (multi-chunk packs
    like _pack_rows), and the delta walk loops the mid levels like
    write_impl (one extraction per pack chunk per level)."""
    n2 = len(coords_prep_b)
    B = coords_prep_b[0].shape[0]
    W, R = data.shape[0], data.shape[1]
    atk = keys.atk_glwe
    n = params.n
    # rows entering the level-i product: the RAM, then each tree level
    rows_levels = [R] + params.tree_shape()

    # rpw forward walk, batched: full gadget (the tree feeds the write)
    cur = address_mod.coordinate_product_batched(params, ctx, data,
                                                 coords_prep_b[0], data_ntt)
    for i in range(1, n2):
        cur = jax.lax.map(
            lambda a: _pack_rows(params, ctx, a, atk), cur)  # [B,W,chunks,..]
        if i == n2 - 1:
            cur = cur[:, :, 0]  # [B, W, C, L, N]
        cur = address_mod.coordinate_product_perbatch(params, ctx, cur,
                                                      coords_prep_b[i])
    root = cur if n2 > 1 else cur[:, :, 0]

    # one FULL trace serves both the read-out and the delta
    t = keyswitch.trace(params, ctx,
                        root.reshape((B * W,) + root.shape[2:]), atk)
    t = t.reshape((B, W) + t.shape[1:])
    outs = t
    deltas = limb_ops.normalize(w_b - t)[:, :, None]  # [B, W, 1, C, L, N]

    # walk each delta down to base-row granularity (per-address inverse
    # coordinates; the GGSW automorphisms are cheap -- lax.map over B),
    # mirroring write_impl's mid loop: per level, per pack chunk, one
    # inverse CMux + one bounded split-tree extraction
    for i in range(n2 - 2, -1, -1):
        inv_b = jax.lax.map(
            lambda c: _invert_coordinate(params, ctx, c, keys),
            coords_coeff_b[i + 1])
        chunks = deltas.shape[2]
        rows_i = rows_levels[i]
        parts = []
        for j in range(chunks):
            d_lo = address_mod.coordinate_product_perbatch(
                params, ctx, deltas[:, :, j], inv_b)
            Rc = min(n, rows_i - j * n)
            # extract_slots puts the slot axis at -4 -> [B, W, Rc, ...]
            parts.append(keyswitch.extract_slots(params, ctx, d_lo, Rc,
                                                 atk, bounded_support=True))
        deltas = jnp.concatenate(parts, axis=2)

    inv0_b = jax.lax.map(
        lambda c: _invert_coordinate(params, ctx, c, keys),
        coords_coeff_b[0])
    upd = address_mod.coordinate_product_perbatch(params, ctx, deltas,
                                                  inv0_b)
    new_data = limb_ops.normalize(data + jnp.sum(upd, axis=0))
    return outs, new_data


def _invert_coordinate(params: Params, ctx: NTTContext, coord, keys):
    """GGSW(X^e) digits -> prepared GGSW(X^-e) digits (write path;
    reference prepare_inv, src/coordinate_prepared.rs:119-142)."""
    dig = coord.shape[0]
    inv = [keys_mod.ggsw_automorphism_inv(params, ctx, coord[i], keys)
           for i in range(dig)]
    return ggsw.prepare(ctx, jnp.stack(inv, axis=0))


def write_impl(params: Params, ctx: NTTContext, data, tree, w, addr_coords,
               keys: keys_mod.EvaluationKeysPrepared):
    """Encrypted write (reference Ram::write, src/ram.rs:226-294).

    addr_coords: tuple of COEFFICIENT-domain coordinates (the inverse
    GGSWs are derived homomorphically in here).  data is the ORIGINAL
    (un-rotated) RAM -- rpw_impl carries it exactly -- and tree the
    persisted packed levels; returns new data.  The tree contents are
    consumed (stale afterwards, matching the reference state machine).

    Exact-data-carry (see rpw_impl): the walk propagates ONLY the delta
    down the tree -- root delta -> per-slot extracted deltas ->
    inverse-rotated base delta rows -- and the final step is
    data + inv0 (x) deltas instead of the reference's
    inv0 (x) (rotated base + deltas) (src/ram.rs:634-649).  Identical
    plaintexts; carried rows never pass an external product."""
    atk = keys.atk_glwe
    n = params.n
    n2 = len(addr_coords)

    # first step (src/ram.rs:544-577): the reference computes
    # root <- root - TRACE(root) + w.  We carry the DELTA
    # (new root - old root): the mid steps then propagate extracted
    # deltas instead of the reference's zero-slot-and-replace
    # (ct_hi - T(ct_hi) + T(ct_lo)).  Same plaintexts -- slot m changes
    # by (w - old) only at the written slot -- but it halves the trace
    # batch and leaves untouched rows' noise untouched.
    # the root trace's noise reaches the RAM only via the delta: it may
    # run the RPW keyswitch truncation (priced with the rpw tree noise)
    root = tree[-1][:, 0]  # [W, C, L, N]
    t = keyswitch.trace(params, ctx, root, atk, trunc=params.rpw_ks_trunc)
    deltas = limb_ops.normalize(w - t)[:, None]  # [W, R_last(=1), C, L, N]

    # mid steps (src/ram.rs:579-632), batched over slots: walk the
    # delta down to base-level row granularity
    for i in range(n2 - 2, -1, -1):
        inv = _invert_coordinate(params, ctx, addr_coords[i + 1], keys)
        chunks = deltas.shape[1]
        rows_i = data.shape[1] if i == 0 else tree[i - 1].shape[1]
        delta_next = []
        for j in range(chunks):
            d_lo = address_mod.coordinate_product(params, ctx, deltas[:, j], inv)
            Rc = min(n, rows_i - j * n)
            # extracted deltas: t_d[:, m] = trace(X^-m d_lo), via the
            # binary split tree (keyswitch.extract_slots).
            # bounded_support: d_lo's plaintext is exactly [delta at the
            # written row index < Rc] (the delta enters as [d, 0...] and
            # the inverse coordinate rotates by the row index), so the
            # per-leaf tail traces are skippable (75% of the write's
            # keyswitches at the 2^18 geometry; see extract_slots)
            t_d = keyswitch.extract_slots(params, ctx, d_lo, Rc, atk,
                                          bounded_support=True)
            delta_next.append(t_d)
        deltas = jnp.concatenate(delta_next, axis=1)

    # last step (src/ram.rs:634-649 restructured): inverse-rotate the
    # delta rows and add them to the EXACT carried data
    inv0 = _invert_coordinate(params, ctx, addr_coords[0], keys)
    upd = _chunked_product(params, ctx, deltas, inv0)
    return limb_ops.normalize(data + upd)


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

@dataclass
class RamState:
    """Carried RAM state: the encrypted data and, between
    read_prepare_write and write, the persisted rotated tree plus the
    protocol flag (reference: SubRam.state, src/ram.rs:302).

    The flag travels WITH the (data, tree) pair, so a caller cannot
    accidentally hand a stale tree to write alongside a fresh data
    array: write only accepts the state object read_prepare_write
    returned, and the donated buffers of superseded states are
    invalidated by XLA."""

    data: jnp.ndarray
    tree: tuple
    pending: bool


jax.tree_util.register_dataclass(
    RamState, data_fields=["data", "tree"], meta_fields=["pending"])


class FheRam:
    """Server-side FHE-RAM (reference Ram, src/ram.rs:25-29).

    Holds static params + prepared keys and jit-compiles the three
    operations once per geometry.  State is an explicit RamState."""

    def __init__(self, params: Params, keys_prepared: keys_mod.EvaluationKeysPrepared):
        self.params = params
        self.ctx = get_ntt_context(params.n, params.primes)
        self.keys = keys_prepared

        p, c = params, self.ctx
        self._read = jax.jit(partial(read_impl, p, c))
        # donate the RAM state buffers: rpw/write replace them, and at
        # large geometries (2^24: 1.6 GB) the copy would double HBM use
        self._rpw = jax.jit(partial(rpw_impl, p, c), donate_argnums=(0,))
        self._write = jax.jit(partial(write_impl, p, c), donate_argnums=(0, 1))
        # batched reads: shared-NTT + batch-gridded kernels (NOT vmap:
        # round 1 measured vmap(4) slower than 4 sequential reads)
        self._read_batch = jax.jit(partial(read_batch_impl, p, c))
        self._rmw_batch = jax.jit(
            lambda d, cp, cc, w, k: rmw_batch_impl(p, c, d, cp, cc, w, k),
            donate_argnums=(0,))
        self._read_batch_cached = jax.jit(
            lambda d, cb, atk, dn: read_batch_impl(p, c, d, cb, atk, dn))
        self._spectral_cache = jax.jit(
            partial(address_mod.spectral_cache, p, c))

    def init_state(self, data) -> RamState:
        """Wrap freshly encrypted RAM data (ram.encrypt_ram output)."""
        return RamState(data=data, tree=(), pending=False)

    def spectral_cache(self, state: RamState):
        """Forward transforms of the RAM's gadget-digit rows, reusable
        across read/read_batch calls on THIS state (the level-0 fwd NTT
        is address-independent).  Recompute after every write -- a stale
        cache reads the pre-write RAM.  No reference counterpart (the
        reference re-DFTs the rows inside every read, ram.rs:424-434);
        this is the data-side analog of its Prepared key forms."""
        assert not state.pending, "pending write: call write() first"
        return self._spectral_cache(state.data)

    def read(self, state: RamState, addr_prep: address_mod.AddressPrepared,
             cache=None):
        assert not state.pending, "pending write: call write() first"
        if cache is not None:
            coords_b = tuple(c[None] for c in addr_prep.coordinates)
            return self._read_batch_cached(state.data, coords_b,
                                           self.keys.atk_glwe, cache)[0]
        return self._read(state.data, addr_prep.coordinates, self.keys.atk_glwe)

    def read_batch(self, state: RamState, addrs_prep, cache=None):
        """Batched reads at many addresses: coords stacked on axis 0."""
        assert not state.pending, "pending write: call write() first"
        if cache is not None:
            return self._read_batch_cached(state.data, addrs_prep,
                                           self.keys.atk_glwe, cache)
        return self._read_batch(state.data, addrs_prep, self.keys.atk_glwe)

    def rmw_batch(self, state: RamState, addrs_prep, addrs_coeff, w_b):
        """Batched read-modify-write at B DISTINCT encrypted addresses
        (rmw_batch_impl): ONE call reads all B pre-write values and
        writes all B words.  addrs_prep/addrs_coeff: stacked prepared /
        coefficient-domain coordinate tuples (mesh.stack_addresses
        layout); w_b: int32[B, W, C, L, N].  Returns (outs, new_state).
        Distinct addresses are the caller's contract (parallel-store
        semantics; duplicates would sum deltas)."""
        assert not state.pending, "pending write: call write() first"
        outs, new_data = self._rmw_batch(state.data, addrs_prep,
                                         addrs_coeff, w_b, self.keys)
        return outs, RamState(data=new_data, tree=(), pending=False)

    def read_prepare_write(self, state: RamState,
                           addr_prep: address_mod.AddressPrepared):
        assert not state.pending, "pending write: call write() first"
        out, new_data, new_tree = self._rpw(
            state.data, addr_prep.coordinates, self.keys.atk_glwe)
        return out, RamState(data=new_data, tree=new_tree, pending=True)

    def write(self, state: RamState, w, addr: address_mod.Address):
        assert state.pending, "write requires read_prepare_write first"
        new_data = self._write(state.data, state.tree, w, addr.coordinates,
                               self.keys)
        return RamState(data=new_data, tree=(), pending=False)
