"""Multi-chip execution: device meshes + the FUSED read pipeline under
shard_map (row-sharded RAM, dp-sharded address batches).

The reference is strictly single-threaded (SURVEY.md §2: no rayon/MPI/
NCCL); scaling is new, TPU-first functionality:

  * axis "dp": independent encrypted reads (the batch of addresses) --
    embarrassingly parallel, addresses sharded, RAM + keys replicated.
  * axis "rows": the RAM's GLWE-row axis (the long axis for MAX_ADDR
    up to 2^24+, SURVEY.md §5 long-context analog).  CMux external
    products are row-local; the packing tree crosses shards.

Everything runs the PRODUCTION kernels per shard via jax.shard_map
(each device executes the fused Pallas pipeline on its local block;
round-3 review: the earlier GSPMD vmap(read_impl) formulation scaled
the slow composed path).  The one cross-shard exchange is explicit:

  Row sharding is STRIDED -- shard k holds the global RAM rows
  congruent to k (mod n_shards) (`row_shard_perm` permutes the row axis
  at placement so XLA's contiguous shards hold those rows).  The
  log-depth pack tree (core/packer.py) merges leaves at stride 2^l on
  level l, largest stride first, so with strided sharding the first
  log2(R/n_shards) merge levels pair leaves WITHIN a shard: each shard
  runs them locally with the dilated tree (packer.pack_tree(dilate=
  n_shards)), then ONE all_gather of the n_shards per-shard roots (a
  single GLWE each) rides ICI and the remaining log2(n_shards) merges
  run replicated.  Contiguous sharding would make EVERY merge level a
  cross-shard exchange.

The downstream levels (upper-coordinate CMux + final trace) operate on
a single packed row -- replicated work over the rows axis, negligible
next to level 0.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import Params
from ..ops.ntt import get_ntt_context
from ..core import packer, keyswitch
from ..ram import ram as ram_mod
from ..ram import address as address_mod

I32 = jnp.int32


def make_mesh(n_devices: int | None = None, rows: int = 1, devices=None) -> Mesh:
    """Mesh with axes (dp, rows).  rows divides n_devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    assert n % rows == 0
    arr = np.array(devs[:n]).reshape(n // rows, rows)
    return Mesh(arr, ("dp", "rows"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


# --------------------------------------------------------------------------
# placement
# --------------------------------------------------------------------------

def row_shard_perm(num_rows: int, n_shards: int) -> np.ndarray:
    """Row permutation realizing the strided shard layout: permuted
    position k*R_loc + j holds global row j*n_shards + k, so contiguous
    device shards hold the rows congruent to k (mod n_shards)."""
    assert num_rows % n_shards == 0
    return np.arange(num_rows).reshape(num_rows // n_shards, n_shards).T.reshape(-1)


def shard_data_rows(mesh: Mesh, data):
    """Place RAM data [W, R, C, L, N] with the row axis STRIDED over the
    'rows' mesh axis (see module docstring / row_shard_perm)."""
    r = mesh.shape["rows"]
    R = data.shape[1]
    if r > 1:
        data = jnp.take(data, jnp.asarray(row_shard_perm(R, r)), axis=1)
    return jax.device_put(data, NamedSharding(mesh, P(None, "rows")))


def shard_addr_batch(mesh: Mesh, coords_stacked):
    """Shard a stacked address batch (tuple of [B, ...] arrays) over the
    'dp' axis."""
    sh = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(c, sh) for c in coords_stacked)


def stack_addresses(addr_preps) -> tuple:
    """Stack prepared addresses into a batch: tuple over coordinates of
    [B, P, dig, D, C, C2, Lg, N]."""
    n2 = len(addr_preps[0].coordinates)
    return tuple(
        jnp.stack([a.coordinates[i] for a in addr_preps], axis=0) for i in range(n2)
    )


# --------------------------------------------------------------------------
# sharded pack: local dilated tree + one all_gather + replicated tail
# --------------------------------------------------------------------------

def _pack_rows_sharded(params: Params, ctx, cur, atk, axis_name: str,
                       n_shards: int, trunc: tuple = (None, None)):
    """Sharded counterpart of ram._pack_rows for R_global <= N (one
    chunk): cur [W, R_loc, C, L, N] per shard (strided global rows) ->
    [W, 1, C, L, N], identical (and replicated) on every rows shard."""
    W, R_loc = cur.shape[0], cur.shape[1]
    M = 1 << (R_loc - 1).bit_length() if R_loc > 1 else 1
    if M != R_loc:
        pad = jnp.zeros((W, M - R_loc) + cur.shape[2:], dtype=cur.dtype)
        cur = jnp.concatenate([cur, pad], axis=1)
    cts = jnp.moveaxis(cur, 1, 0)  # [M, W, C, L, N]
    root = packer.pack_tree(params, ctx, cts, atk, dilate=n_shards,
                            prescale=True, trunc=trunc)  # [W, C, L, N]
    if n_shards > 1:
        # pack-root exchange: XLA all_gather, the Pallas ring
        # (FHERAM_RING_AG=1), or the merge-interleaved exchange
        # (FHERAM_RING_AG=2; parallel/collective.py)
        from . import collective

        if collective.RING_AG_MODE == "2":
            return _merge_exchange_tail(params, ctx, root, atk, axis_name,
                                        n_shards, trunc)[:, None]
        nodes = collective.all_gather(root, axis_name, n_shards)
        root = packer.pack_tree(params, ctx, nodes, atk, dilate=1,
                                prescale=False, trunc=trunc)
    return root[:, None]  # [W, 1, C, L, N]


def _merge_exchange_tail(params: Params, ctx, root, atk, axis_name: str,
                         n_shards: int, trunc: tuple = (None, None)):
    """The pack tail with communication consumed in arrival order
    (FHERAM_RING_AG=2): recursive doubling over the rows axis.

    Rationale (parallel/collective.py module docstring): the ring
    all-gather serializes n-1 hops and THEN runs the whole replicated
    tail; here each of the log2(n) rounds exchanges ONE GLWE with the
    XOR-stride partner and merges it immediately -- every received
    chunk is consumed the moment it lands, and total ICI traffic drops
    from n-1 to log2(n) chunk hops per shard.

    Correctness: shard k's local dilated root is tail-tree node k
    (slots === k mod n_shards).  Tail level ll of pack_tree(dilate=1)
    merges nodes (j, j + 2^ll) -> j with stride t = 2^ll and galois
    (N >> ll) + 1, largest ll first; before that round every shard
    holds node (k mod 2^(ll+1)) of the current level, and partner
    k XOR 2^ll holds the node differing exactly in bit ll -- the pair.
    Bit ll of k picks the operand orientation (A = low node, B = high).
    Runs the SAME _merge_level calls on the same operands as the
    gathered tail, so the result is bit-exact and replicated
    (tests/test_collective.py)."""
    from . import collective

    levels = n_shards.bit_length() - 1
    my = jax.lax.axis_index(axis_name)
    cur = root
    n = params.n
    for r, ll in enumerate(range(levels - 1, -1, -1)):
        s = 1 << ll
        other = collective.exchange(cur, axis_name, s, n_shards,
                                    collective_id=r)
        hi_bit = ((my >> ll) & 1).astype(jnp.bool_)
        A = jnp.where(hi_bit, other, cur)
        B = jnp.where(hi_bit, cur, other)
        g = (n >> ll) + 1
        cur = packer._merge_level(params, ctx, A, B, s, g, atk[g],
                                  trunc=trunc)
    return cur


# --------------------------------------------------------------------------
# shard_map bodies: the production fused pipeline on local blocks
# --------------------------------------------------------------------------

def _check_shardable(params: Params):
    assert params.num_rows <= params.n, (
        "row-sharded read supports one pack chunk (num_rows <= N); "
        "2^24 at N=4096 is exactly the boundary")
    assert params.n2 == 2, "sharded read expects the 2-level geometry"


def _sharded_read_body(params: Params, ctx, n_shards: int, data, coords, atk):
    """Single read on row-sharded RAM: per-shard fused level-0 products
    over the local rows, sharded pack, replicated tail."""
    ept, kst = params.read_ep_trunc, params.read_ks_trunc
    cur = ram_mod._chunked_product(params, ctx, data, coords[0], trunc=ept)
    cur = _pack_rows_sharded(params, ctx, cur, atk, "rows", n_shards,
                             trunc=kst)
    cur = address_mod.coordinate_product(params, ctx, cur[:, 0], coords[1],
                                         trunc=ept)
    return keyswitch.trace(params, ctx, cur, atk, trunc=kst)


def _sharded_batch_slice(params: Params, ctx, n_shards: int, data, coords_b,
                         atk, data_ntt=None):
    """One HBM-sized slice of the sharded batched read: the fused
    batch-gridded kernels (ram._read_batch_slice structure) with the
    pack replaced by the sharded pack."""
    from ..ops.ntt_pallas import fused_path_active

    ept, kst = params.read_ep_trunc, params.read_ks_trunc
    B = coords_b[0].shape[0]
    W = data.shape[0]
    # [B, W, R_loc, C, L, N]: shared spectral level-0 per shard
    if fused_path_active(params.n):
        cur = address_mod.coordinate_product_batched(params, ctx, data,
                                                     coords_b[0], data_ntt,
                                                     trunc=ept)
    else:
        # composed fallback: bound the per-address transients with the
        # row-sliced product (ram._chunked_product), like read_impl does
        cur = jax.lax.map(
            lambda c: ram_mod._chunked_product(params, ctx, data, c,
                                               trunc=ept), coords_b[0])
    flat = cur.reshape((B * W,) + cur.shape[2:])
    flat = _pack_rows_sharded(params, ctx, flat, atk, "rows", n_shards,
                              trunc=kst)
    cur = flat.reshape((B, W) + flat.shape[1:])[:, :, 0]  # [B, W, C, L, N]
    cur = address_mod.coordinate_product_perbatch(params, ctx, cur,
                                                  coords_b[1], trunc=ept)
    out = keyswitch.trace(params, ctx,
                          cur.reshape((B * W,) + cur.shape[2:]), atk,
                          trunc=kst)
    return out.reshape((B, W) + out.shape[1:])


def _sharded_batch_body(params: Params, ctx, n_shards: int, data, coords_b,
                        atk, data_ntt=None):
    """Local batched read: B_loc addresses against the local row shard,
    sliced like ram.read_batch_impl when B_loc exceeds the HBM chunk."""
    B = coords_b[0].shape[0]
    k = ram_mod._BATCH_CHUNK
    if B > k:
        # mirror ram.read_batch_impl: full slices under lax.map, the
        # non-multiple remainder as one extra slice (an unsliced
        # B > k local batch would hit the HBM blowup the chunk bounds)
        nfull = B // k
        parts = []
        sl = tuple(c[: nfull * k].reshape((nfull, k) + c.shape[1:])
                   for c in coords_b)
        outs = jax.lax.map(
            lambda cs: _sharded_batch_slice(params, ctx, n_shards, data, cs,
                                            atk, data_ntt), sl)
        parts.append(outs.reshape((nfull * k,) + outs.shape[2:]))
        if B % k:
            parts.append(_sharded_batch_slice(
                params, ctx, n_shards, data,
                tuple(c[nfull * k :] for c in coords_b), atk, data_ntt))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return _sharded_batch_slice(params, ctx, n_shards, data, coords_b, atk,
                                data_ntt)


# --------------------------------------------------------------------------
# sharded write path: the delta walk at shard-local row granularity
# --------------------------------------------------------------------------
#
# The write walk is shard-friendly under the same strided layout as the
# read (reference engine being matched: src/ram.rs:461-649): the root
# trace and the delta's inverse-coordinate CMux operate on ONE GLWE
# (replicated work), the split-tree slot extraction branches on bit l
# of the slot index at level l -- so after log2(n_shards) replicated
# levels each shard selects the node of ITS residue class and runs the
# deep levels (where all the work is) on 1/n_shards of the tree
# (core/keyswitch.extract_slots dilate/residue) -- and the final
# inverse base products + delta adds are row-local by construction.
# No collective at all: the write's one "gather" (the pack) happened in
# the rpw forward walk.


def _sharded_rpw_fwd(params: Params, ctx, n_shards: int, data, coords, atk):
    """The rpw forward walk on row-sharded RAM: returns the packed tree
    root [W, C, L, N] (replicated), full gadget (it feeds the write).
    Products/packs run the params' RPW truncation like ram.rpw_impl."""
    ept, kst = params.rpw_ep_trunc, params.rpw_ks_trunc
    cur = ram_mod._chunked_product(params, ctx, data, coords[0], trunc=ept)
    packed = _pack_rows_sharded(params, ctx, cur, atk, "rows", n_shards,
                                trunc=kst)
    return address_mod.coordinate_product(params, ctx, packed[:, 0],
                                          coords[1], trunc=ept)


def _sharded_delta_walk(params: Params, ctx, n_shards: int, data, delta,
                        coords_coeff, keys):
    """Walk a root delta [W, 1, C, L, N] down to this shard's local rows
    and add: replicated inverse CMux + sharded split-tree extraction +
    row-local inverse base products (ram.write_impl restructured for
    the strided shard layout)."""
    from ..ops import limb as limb_ops

    atk = keys.atk_glwe
    R = params.num_rows
    assert R % n_shards == 0
    inv1 = ram_mod._invert_coordinate(params, ctx, coords_coeff[1], keys)
    d_lo = address_mod.coordinate_product(params, ctx, delta[:, 0], inv1)
    my = jax.lax.axis_index("rows") if n_shards > 1 else 0
    t_d = keyswitch.extract_slots(params, ctx, d_lo, R, atk,
                                  bounded_support=True,
                                  dilate=n_shards, residue=my)
    inv0 = ram_mod._invert_coordinate(params, ctx, coords_coeff[0], keys)
    upd = ram_mod._chunked_product(params, ctx, t_d, inv0)
    return limb_ops.normalize(data + upd)


def _sharded_rmw_body(params: Params, ctx, n_shards: int, data, coords_prep,
                      coords_coeff, w, keys):
    """One full RMW cycle on row-sharded RAM: rpw forward walk + ONE
    full-gadget root trace serving both the read-out and the delta
    (ram.rmw_batch_impl structure), then the sharded delta walk.
    Returns (read_out [W, C, L, N] replicated, new local data shard)."""
    from ..ops import limb as limb_ops

    atk = keys.atk_glwe
    root = _sharded_rpw_fwd(params, ctx, n_shards, data, coords_prep, atk)
    t = keyswitch.trace(params, ctx, root, atk)
    delta = limb_ops.normalize(w - t)[:, None]  # [W, 1, C, L, N]
    new_data = _sharded_delta_walk(params, ctx, n_shards, data, delta,
                                   coords_coeff, keys)
    return t, new_data


# --------------------------------------------------------------------------
# public jitted entry points
# --------------------------------------------------------------------------

def batched_read_fn(params: Params, mesh: Mesh, with_cache: bool = False):
    """Jitted sharded batched read running the FUSED kernels per shard:
    addresses sharded over dp, RAM rows (strided) over rows, output
    sharded over dp.

    Call as fn(data, coords_b, atk) -- or fn(data, coords_b, atk, cache)
    when with_cache (cache from sharded_spectral_cache_fn on the SAME
    placed data).  data must be placed by shard_data_rows (strided row
    permutation)."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]

    if with_cache:
        body = lambda d, cb, atk, dn: _sharded_batch_body(
            params, ctx, r, d, cb, atk, dn)
        in_specs = (P(None, "rows"), P("dp"), P(), P(None, "rows"))
    else:
        body = lambda d, cb, atk: _sharded_batch_body(
            params, ctx, r, d, cb, atk, None)
        in_specs = (P(None, "rows"), P("dp"), P())
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=P("dp"), check_vma=False)
    return jax.jit(fn)


def sharded_read_fn(params: Params, mesh: Mesh):
    """Jitted single read over row-sharded RAM (the 2^24-scale config:
    strided rows over chips, fused kernels per shard, one all_gather of
    per-shard pack roots).  The dp axis (if > 1) computes replicas."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]
    fn = jax.shard_map(
        lambda d, c, atk: _sharded_read_body(params, ctx, r, d, c, atk),
        mesh=mesh,
        in_specs=(P(None, "rows"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_rmw_fn(params: Params, mesh: Mesh):
    """Jitted read-modify-write over row-sharded RAM (the 2^24-scale
    write: strided rows over chips, fused kernels per shard, the delta
    walk sharded at the split-tree levels -- see _sharded_rmw_body).

    Call as fn(data, coords_prep, coords_coeff, w, keys) ->
    (read_out, new_data): data placed by shard_data_rows;
    coords_prep/coords_coeff an AddressPrepared's / Address's
    coordinate tuples (replicated); w int32[W, C, L, N]; keys the full
    EvaluationKeysPrepared (the inverse coordinates need the tensor
    key).  read_out is the pre-write value (replicated); new_data keeps
    the input's strided row sharding.  The dp axis (if > 1) computes
    replicas."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]
    assert params.num_rows % r == 0
    fn = jax.shard_map(
        lambda d, cp, cc, w, k: _sharded_rmw_body(params, ctx, r, d, cp,
                                                  cc, w, k),
        mesh=mesh,
        in_specs=(P(None, "rows"), P(), P(), P(), P()),
        out_specs=(P(), P(None, "rows")),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def _sharded_rmw_batch_body(params: Params, ctx, n_shards: int, dp: int,
                            data, coords_prep_b, coords_coeff_b, w_b, keys):
    """B_loc RMWs against the local row shard (ram.rmw_batch_impl
    restructured for the dp x rows mesh): full-gadget batched forward
    walk with the sharded pack, one trace serving read-outs and deltas,
    per-address sharded split-tree extraction (dilate/residue), local
    inverse base products, then ONE psum over dp folds every replica's
    delta sum into the (dp-replicated) row shards.  All B = dp * B_loc
    reads see the pre-write state; distinct addresses are the caller's
    contract (parallel-store semantics)."""
    from ..ops import limb as limb_ops

    atk = keys.atk_glwe
    B = coords_prep_b[0].shape[0]
    W, R_loc = data.shape[0], data.shape[1]
    R = R_loc * n_shards

    cur = address_mod.coordinate_product_batched(params, ctx, data,
                                                 coords_prep_b[0])
    flat = cur.reshape((B * W,) + cur.shape[2:])
    flat = _pack_rows_sharded(params, ctx, flat, atk, "rows", n_shards)
    cur = flat.reshape((B, W) + flat.shape[1:])[:, :, 0]
    root = address_mod.coordinate_product_perbatch(params, ctx, cur,
                                                   coords_prep_b[1])
    t = keyswitch.trace(params, ctx,
                        root.reshape((B * W,) + root.shape[2:]), atk)
    t = t.reshape((B, W) + t.shape[1:])
    outs = t
    deltas = limb_ops.normalize(w_b - t)

    inv1_b = jax.lax.map(
        lambda c: ram_mod._invert_coordinate(params, ctx, c, keys),
        coords_coeff_b[1])
    d_lo = address_mod.coordinate_product_perbatch(params, ctx, deltas,
                                                   inv1_b)
    my = jax.lax.axis_index("rows") if n_shards > 1 else 0
    t_d = keyswitch.extract_slots(params, ctx, d_lo, R, atk,
                                  bounded_support=True,
                                  dilate=n_shards, residue=my)
    inv0_b = jax.lax.map(
        lambda c: ram_mod._invert_coordinate(params, ctx, c, keys),
        coords_coeff_b[0])
    upd = address_mod.coordinate_product_perbatch(params, ctx, t_d, inv0_b)
    upd = jnp.sum(upd, axis=0)  # local batch's delta rows
    if dp > 1:
        upd = jax.lax.psum(upd, "dp")
    return outs, limb_ops.normalize(data + upd)


def batched_rmw_fn(params: Params, mesh: Mesh):
    """Jitted BATCHED read-modify-write over the full dp x rows mesh:
    B distinct addresses sharded over dp, RAM rows (strided) over rows
    -- the write-side completion of batched_read_fn.  One psum over dp
    is the only batch-side collective (the deltas ADD, exact-data-carry
    write); the rows-side pack exchange is the same as every sharded
    walk.

    Call as fn(data, coords_prep_b, coords_coeff_b, w_b, keys) ->
    (outs [B, W, C, L, N] sharded over dp, new_data row-sharded):
    data placed by shard_data_rows; coords stacked by stack_addresses
    and placed by shard_addr_batch; w_b int32[B, W, C, L, N] sharded
    over dp like the coords."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]
    dp = mesh.shape["dp"]
    assert params.num_rows % r == 0
    fn = jax.shard_map(
        lambda d, cp, cc, w, k: _sharded_rmw_batch_body(
            params, ctx, r, dp, d, cp, cc, w, k),
        mesh=mesh,
        in_specs=(P(None, "rows"), P("dp"), P("dp"), P("dp"), P()),
        out_specs=(P("dp"), P(None, "rows")),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def sharded_rpw_fn(params: Params, mesh: Mesh):
    """Jitted read_prepare_write over row-sharded RAM: returns
    (read_out, tree_root) -- the data shard is carried EXACTLY
    (exact-data-carry write, ram.rpw_impl), so it is not returned; pass
    the same placed data plus the root to sharded_write_fn.  The root
    is the packed+selected tree top [W, 1, C, L, N] (replicated), full
    gadget; read_out runs the READ truncation like ram.rpw_impl."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]
    assert params.num_rows % r == 0

    def body(data, coords, atk):
        root = _sharded_rpw_fwd(params, ctx, r, data, coords, atk)
        out = keyswitch.trace(params, ctx, root, atk,
                              trunc=params.read_ks_trunc)
        return out, root[:, None]

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(None, "rows"), P(), P()),
                       out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_write_fn(params: Params, mesh: Mesh):
    """Jitted write over row-sharded RAM, consuming sharded_rpw_fn's
    root: fn(data, root, w, coords_coeff, keys) -> new_data (strided
    row sharding preserved).  Matches ram.write_impl: root trace at the
    RPW truncation, delta walk down to the local rows."""
    ctx = get_ntt_context(params.n, params.primes)
    _check_shardable(params)
    r = mesh.shape["rows"]
    assert params.num_rows % r == 0

    def body(data, root, w, coords_coeff, keys):
        from ..ops import limb as limb_ops

        t = keyswitch.trace(params, ctx, root[:, 0], keys.atk_glwe,
                            trunc=params.rpw_ks_trunc)
        delta = limb_ops.normalize(w - t)[:, None]
        return _sharded_delta_walk(params, ctx, r, data, delta,
                                   coords_coeff, keys)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(None, "rows"), P(), P(), P(), P()),
                       out_specs=P(None, "rows"), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def sharded_spectral_cache_fn(params: Params, mesh: Mesh):
    """Jitted per-shard spectral cache (address-independent fwd NTT of
    the local rows' gadget digits) on data placed by shard_data_rows.
    Output sharded [P, W*R, T, N] with the flat W*R axis matching each
    shard's local data block."""
    ctx = get_ntt_context(params.n, params.primes)
    fn = jax.shard_map(
        lambda d: address_mod.spectral_cache(params, ctx, d),
        mesh=mesh,
        in_specs=(P(None, "rows"),),
        out_specs=P(None, "rows"),
        check_vma=False,
    )
    return jax.jit(fn)
