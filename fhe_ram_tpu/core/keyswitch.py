"""GGLWE key-switching keys, GLWE automorphisms, and the normalized trace.

Automorphism-keyswitch pipeline (generic in rank):
  1. apply sigma_g to every component of the ct (pure index permutation),
  2. key-switch the a-part back to the original secret using the
     automorphism key: a GGLWE whose digit-row d has phase
     sigma_g(s_i) * 2^-(17(d+1)).

Output:  a_out = -sum_d digit_d(a') (*) k_a^(d)
         b_out =  b' - sum_d digit_d(a') (*) k_b^(d)

Normalized trace: T(ct) = [c_0, 0, ..., 0] via log_n sequential halving
steps ct <- (ct + sigma_{g_k}(ct))/2, g_k = N/2^k + 1 (params.trace_gal_els).

Reference counterparts: poulpy-core GLWEAutomorphismKey / GLWETrace
(consumed at src/keys.rs:134-181, src/ram.rs:457,540,572,616-621).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..params import Params
from ..ops.ntt import NTTContext, ntt_fwd, ntt_inv
from ..ops.modular import mul_mod, reduce_once
from ..ops.crt import crt_fold
from ..ops import limb as limb_ops
from ..ops import poly
from . import glwe, rng

I32 = jnp.int32


def _akey_impl(params: Params, ctx: NTTContext, g: int, dnum: int, limbs: int,
               sk, s_ntt, ka, ke):
    rank = params.rank
    n = params.n
    sk_g = poly.automorphism(sk, g)  # [rank, N]
    zeros = jnp.zeros((dnum, rank, limbs, n), dtype=I32)
    rows = glwe._encrypt_impl(params, ctx, s_ntt, zeros, ka, ke)
    for d in range(dnum):
        for i in range(rank):
            rows = rows.at[d, i, rank, d, :].add(sk_g[i])
    return limb_ops.normalize(rows)


@lru_cache(maxsize=None)
def _akey_jit(params: Params, g: int, dnum: int, limbs: int):
    import jax
    from ..ops.ntt import get_ntt_context

    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(
        lambda sk, s_ntt, ka, ke: _akey_impl(params, ctx, g, dnum, limbs, sk, s_ntt, ka, ke)
    )


def automorphism_key_encrypt(params: Params, ctx: NTTContext, sk, s_ntt, g: int,
                             source: rng.Source, dnum: int, limbs: int):
    """Automorphism key for galois element g: int32[D, rank, C2, Lk, N].

    Row (d, i) has phase sigma_g(s_i) * 2^-(17(d+1))."""
    return _akey_jit(params, g, dnum, limbs)(sk, s_ntt, source.split(), source.split())


def key_prepare(ctx: NTTContext, key):
    """NTT-prepare a GGLWE key: [..., Lk, N] -> [P, ..., Lk, N]."""
    return ntt_fwd(ctx, key)


def truncate_key(key_ntt, in_digits: int | None, key_limbs: int | None):
    """Slice a prepared GGLWE key [P, D, rank, C2, Lk, N] to its top
    in_digits gadget rows and top key_limbs limbs.  Valid because limb
    slicing commutes with the per-limb NTT: the top limbs of a prepared
    key ARE the prepared form of the truncated key (see
    params.Params.read_ks_digits)."""
    if in_digits is not None:
        key_ntt = key_ntt[:, :in_digits]
    if key_limbs is not None:
        key_ntt = key_ntt[..., :key_limbs, :]
    return key_ntt


def keyswitch(params: Params, ctx: NTTContext, ct, key_ntt,
              out_limbs: int | None = None, base_add=None,
              in_digits: int | None = None, key_limbs: int | None = None):
    """Key-switch ct (under the key's source secret) to the key's target
    secret.  ct: int32[..., C, L, N] normalized; key_ntt:
    int32[P, D, rank, C2, Lk, N] with D == L.

    base_add: optional int32[..., C2, Lout, N] added to the result
    before the final normalize (fused into the kernel epilogue on the
    pallas path) -- callers that compute `x + KS(...)` (trace steps,
    packer merges) pass x here and skip their own add+normalize.

    in_digits / key_limbs: optional gadget truncation (read-path noise
    trade, see params.Params.read_ks_digits): decompose only the top
    in_digits input limbs against the top key_limbs key limbs."""
    key_ntt = truncate_key(key_ntt, in_digits, key_limbs)
    P, D, rank, C2, Lk, n = key_ntt.shape
    L = ct.shape[-2]
    assert D <= L and ct.shape[-3] == rank + 1
    Lout = out_limbs if out_limbs is not None else L

    a = ct[..., :rank, :D, :]  # [..., rank, D, N] (top-D digits)
    b = ct[..., rank, :, :]   # [..., L, N]

    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and n == 4096:
        # v2 kernel: VMP + iNTT + CRT fold + (base - ks) + normalize
        from ..ops.ntt_pallas import get_pallas_context, fused_external_fold_pallas

        pctx = get_pallas_context(n, ctx.primes)
        lead_shape = ct.shape[:-3]
        x = a.reshape((-1, rank * D, n))
        keys = jnp.transpose(key_ntt, (0, 2, 1, 3, 4, 5)).reshape(
            P, 1, rank * D, C2 * Lk, n)
        b_emb = limb_ops.resize_limbs(b, Lout)[..., None, :, :]
        pad = jnp.zeros(lead_shape + (C2 - 1, Lout, n), dtype=I32)
        base = jnp.concatenate([pad, b_emb], axis=-3)
        if base_add is not None:
            base = base + base_add
        base = base.reshape((-1, C2, Lout, n))
        out = fused_external_fold_pallas(pctx, x, keys, Lout, C2,
                                         base=base, sign=-1)
        return out.reshape(lead_shape + (C2, Lout, n))

    dig_ntt = ntt_fwd(ctx, a)  # [P, ..., rank, D, N]
    lead = dig_ntt.ndim - 4
    p, ip = ctx.consts(lead + 4)
    acc = jnp.zeros((P,) + ct.shape[:-3] + (C2, Lk, n), dtype=I32)
    for i in range(rank):
        for d in range(D):
            dig = dig_ntt[..., i, d, :][..., None, None, :]  # [P, ..., 1, 1, N]
            k = key_ntt[:, d, i].reshape((P,) + (1,) * lead + (C2, Lk, n))
            acc = acc + mul_mod(dig, k, p, ip)
    acc = reduce_once(acc, p, ip)
    # see ggsw.external_product: materialize in the NTT layout
    acc = jax.lax.optimization_barrier(acc.reshape((P,) + (-1,) + (n,)))
    conv = ntt_inv(ctx, acc).reshape((P,) + ct.shape[:-3] + (C2, Lk, n))
    ks = crt_fold(ctx.primes, conv, 17, Lout, p, ip)  # [..., C2, Lout, N]

    out_a = -ks[..., :rank, :, :]
    out_b = limb_ops.resize_limbs(b, Lout) - ks[..., rank, :, :]
    out = jnp.concatenate([out_a, out_b[..., None, :, :]], axis=-3)
    if base_add is not None:
        out = out + base_add
    return limb_ops.normalize(out)


def automorphism_ks(params: Params, ctx: NTTContext, ct, g: int, key_ntt,
                    out_limbs: int | None = None, base_add=None,
                    in_digits: int | None = None,
                    key_limbs: int | None = None):
    """sigma_g applied homomorphically: permute + key-switch."""
    ct_g = poly.automorphism(ct, g)
    return keyswitch(params, ctx, ct_g, key_ntt, out_limbs, base_add=base_add,
                     in_digits=in_digits, key_limbs=key_limbs)


def trace(params: Params, ctx: NTTContext, ct, auto_keys_ntt: dict,
          keep_log: int = 0, trunc: tuple = (None, None)):
    """Normalized partial trace: keeps the 2^keep_log coefficients at
    multiples of N/2^keep_log, zeroes the rest.  keep_log=0 is the full
    trace ([c_0, 0, ..., 0], reference trace_inplace(0, log_n),
    src/ram.rs:457); keep_log matches the reference's `start` argument
    (partial uses at src/arithmetic.rs:228, src/store.rs:66).

    Construction: pre-scale ONCE by 1/N (exact limb shift), then apply
    the unnormalized steps x <- x + sigma_g(x) over the subgroup tower.

    Why not halve each step: homomorphic torus halving is 2-valued -- the
    mask product a*s hides an integer whose parity leaks a +-1/2 offset.
    Offsets injected mid-loop survive the remaining *partial* trace as
    fractional garbage.  With the division done up-front, every mid-loop
    mod-1 wrap is an integer polynomial, and the remaining
    multiplication-free steps map integer polynomials to integer
    polynomials -- identically 0 mod 1.  Cost: the pre-shift amplifies
    per-step keyswitch noise by up to N (2^-36 -> ~2^-25 at default
    parameters), still far below the 2^-(k_pt+1) read bound."""
    steps = params.log_n - keep_log
    if steps == 0:
        return ct
    shift = steps
    while shift > 0:
        s = min(shift, params.base2k - 1)
        ct = limb_ops.shift_right(ct, s)
        shift -= s
    ct = limb_ops.normalize(ct)
    return trace_steps(params, ctx, ct, auto_keys_ntt,
                       params.trace_gal_els[:steps], trunc=trunc)


def trace_steps(params: Params, ctx: NTTContext, ct, auto_keys_ntt: dict,
                gals, trunc: tuple = (None, None)):
    """The division-free trace iteration ct <- normalize(ct +
    KS(sigma_g(ct))) for each g in gals, WITHOUT the up-front 1/2^steps
    pre-scale (callers pre-scale once; see trace()).

    On the pallas/MXU path the whole chain runs in ONE kernel launch:
    sequential grid over the steps, ct limbs resident in VMEM scratch,
    automorphisms applied in-kernel (ops/ntt_pallas.fused_trace_pallas).

    trunc = (in_digits, key_limbs): optional read-path gadget
    truncation per step (params.Params.read_ks_digits)."""
    if not gals:
        return ct
    in_digits, key_limbs = trunc
    from ..ops import ntt as ntt_mod

    if ntt_mod.get_backend() == "pallas" and params.n == 4096:
        from ..ops import ntt_pallas

        if ntt_pallas._USE_MXU:
            pctx = ntt_pallas.get_pallas_context(params.n, ctx.primes)
            lead = ct.shape[:-3]
            ct2 = ct.reshape((-1,) + ct.shape[-3:])
            k0 = truncate_key(auto_keys_ntt[gals[0]], in_digits, key_limbs)
            P, D, rank, C2, Lk, n = k0.shape
            keys = jnp.stack(
                [jnp.transpose(
                    truncate_key(auto_keys_ntt[g], in_digits, key_limbs),
                    (0, 2, 1, 3, 4, 5))
                 .reshape(P, rank * D, C2 * Lk, n) for g in gals], axis=0)
            out = ntt_pallas.fused_trace_pallas(pctx, ct2, keys, tuple(gals))
            return out.reshape(lead + out.shape[1:])

    for g in gals:
        ct = automorphism_ks(params, ctx, ct, g, auto_keys_ntt[g],
                             out_limbs=ct.shape[-2], base_add=ct,
                             in_digits=in_digits, key_limbs=key_limbs)
    return ct


def extract_slots(params: Params, ctx: NTTContext, ct, count: int,
                  auto_keys_ntt: dict, bounded_support: bool = False,
                  dilate: int = 1, residue=None):
    """All-slot extraction: out[..., m, :, :, :] = trace(X^-m ct) for
    m in [0, count), i.e. per slot an encryption of [slot_m(ct), 0...].

    Binary split tree instead of a rotate-stack + batched full trace:
    since sigma_{g_l} commutes with X^{-2^j} for every j > l
    (g_l * 2^j = 2^j mod 2N), trace(X^-m ct) = prod_l (1 + sigma_{g_l})
    X^{-m_l 2^l} (ct/N), so level l of the tree branches on bit l of m
    and the remaining log_n - log2(count) steps run once per leaf.
    Each split level keyswitches only its PARENT nodes (both children
    derive from the one sigma_KS output -- see the loop comment), so
    the split cost is ~count keyswitches total; with the tail, ~count +
    count*(log_n - log2(count)) vs the rotate-stack's count*log_n (3x
    less at count=64, log_n=12); the reference instead walks slots
    sequentially with per-slot double traces (src/ram.rs:612-630).

    bounded_support=True: the caller GUARANTEES ct's plaintext is
    exactly zero outside slots [0, count) (the write path's deltas:
    only row indices < Rc carry data, src/ram.rs:612-630 semantics).
    Then, when count * 2^ceil(log2 count) <= N, the per-leaf tail steps
    are PLAINTEXT-EXACTLY unnecessary: after the s split levels the
    leaf for m is the partial trace keeping slots at stride N/2^s >=
    count, whose kept slots beyond 0 read ct[m + (N/2^s) k] -- exact
    plaintext zeros.  The pre-scale shrinks to 1/2^s accordingly (each
    level doubles the kept coefficients).  This removes the
    count*(log_n - s) tail keyswitches -- 75% of the work at count=64,
    log_n=12 -- AND shrinks the coherent noise amplification from
    (4^log_n)/3 to (4^s)/3 (core/noise.py trace model).

    Without the flag every leaf passes through exactly log_n
    keyswitches after the single 1/N pre-scale (full-trace semantics,
    correct for arbitrary ct).

    dilate / residue (the row-sharded write, parallel/mesh.py): return
    ONLY the slots m with m === residue (mod dilate), ordered by
    m // dilate -- out[..., j, :, :, :] = trace(X^-(j*dilate+residue) ct).
    Split level l branches on bit l of m (LSB first), so after the
    first log2(dilate) levels node k holds exactly the residue-k
    subtree: with the STRIDED row sharding (mesh.row_shard_perm, shard
    k = global rows === k mod n_shards) each shard selects ITS node
    (residue = lax.axis_index, a traced scalar) and runs the remaining
    levels + tail on 1/dilate of the tree -- the deep levels, where all
    the work is.  The cheap first log2(dilate) levels run replicated.
    count must be a multiple of dilate; s/tail/pre-scale are the GLOBAL
    quantities (unchanged by sharding)."""
    n = params.n
    s = max(count - 1, 0).bit_length()  # ceil(log2(count))
    assert (1 << s) <= n
    assert dilate >= 1 and dilate & (dilate - 1) == 0 and dilate <= (1 << s)
    log_d = dilate.bit_length() - 1
    if dilate > 1:
        assert residue is not None and count % dilate == 0
    tail = params.log_n - s
    if bounded_support and count << s <= n:
        tail = 0
    shift = s + tail
    x = ct
    while shift > 0:
        step = min(shift, params.base2k - 1)
        x = limb_ops.shift_right(x, step)
        shift -= step
    nodes = limb_ops.normalize(x)[..., None, :, :, :]
    gals = params.trace_gal_els

    from ..ops import ntt as ntt_mod

    use_split_kernel = False
    if ntt_mod.get_backend() == "pallas" and params.n == 4096:
        from ..ops import ntt_pallas

        use_split_kernel = ntt_pallas._USE_MXU

    def _select(nodes):
        # this shard's subtree: node index == low log_d bits of m
        return jax.lax.dynamic_index_in_dim(nodes, residue,
                                            axis=nodes.ndim - 4,
                                            keepdims=True)

    if use_split_kernel and dilate == 1 and s >= 1:
        from ..ops import ntt_pallas

        if (ntt_pallas._USE_SPLIT_TREE
                and (1 << s) <= ntt_pallas._SPLIT_TREE_MAX):
            # ALL s levels in ONE launch (state doubles in VMEM per grid
            # step; ntt_pallas.fused_split_tree_pallas), then the tail
            pctx = ntt_pallas.get_pallas_context(params.n, ctx.primes)
            ks = []
            for l in range(s):
                key = auto_keys_ntt[gals[l]]
                P, D, rank, C2, Lk, n_ = key.shape
                ks.append(jnp.transpose(key, (0, 2, 1, 3, 4, 5)).reshape(
                    P, rank * D, C2 * Lk, n_))
            lead = nodes.shape[:-4]
            flat = nodes[..., 0, :, :, :].reshape((-1,) + nodes.shape[-3:])
            out_nodes = ntt_pallas.fused_split_tree_pallas(
                pctx, flat, tuple(gals[:s]), jnp.stack(ks))
            leaves = out_nodes.reshape(lead + out_nodes.shape[1:])
            out = trace_steps(params, ctx, leaves, auto_keys_ntt,
                              gals[s : s + tail])
            return out[..., :count, :, :, :]

    for l in range(s):
        if dilate > 1 and l == log_d:
            nodes = _select(nodes)
        # ONE keyswitch feeds BOTH children (round-4 halving): with
        # A = sigma_KS(x) (the homomorphic sigma_g under the trace key),
        #   child0 = x + A                     (the 1 + sigma_g branch)
        #   child1 = X^-t x + sigma_KS(X^-t x) = X^-t (x - A)
        # because sigma_g(X^-t) = -X^-t for t = 2^l, g = N/2^l + 1, and
        # the keyswitch commutes exactly with monomial rotations (digit
        # decomposition is coefficient-wise; convolution commutes).
        # Same plaintexts; child1's KS noise is a rotation of child0's
        # (same magnitude, per-slot variance unchanged -- the model in
        # core/noise.py is untouched).  Previously both halves were
        # keyswitched: 2x the kernel work of this form.
        g = gals[l]
        if use_split_kernel:
            # both children from ONE launch, all glue in-VMEM
            # (ntt_pallas.fused_split_pallas)
            from ..ops import ntt_pallas

            pctx = ntt_pallas.get_pallas_context(params.n, ctx.primes)
            key = auto_keys_ntt[g]
            P, D, rank, C2, Lk, n = key.shape
            k2 = jnp.transpose(key, (0, 2, 1, 3, 4, 5)).reshape(
                P, rank * D, C2 * Lk, n)
            lead = nodes.shape[:-3]
            flat = nodes.reshape((-1,) + nodes.shape[-3:])
            c0, c1 = ntt_pallas.fused_split_pallas(pctx, flat, 1 << l, g, k2)
            child0 = c0.reshape(lead + c0.shape[1:])
            child1 = c1.reshape(lead + c1.shape[1:])
        else:
            # composed form: child0 = fused/composed trace step (sigma_g
            # in-kernel on the pallas path -- an XLA-level sigma_g is a
            # minor-dim gather, the TPU serialization cliff); child1 =
            # X^-t(2x - child0) via adds + slice+concat rotation.
            child0 = trace_steps(params, ctx, nodes, auto_keys_ntt, (g,))
            child1 = limb_ops.normalize(
                poly.rotate(2 * nodes - child0, -(1 << l)))
        nodes = jnp.concatenate([child0, child1], axis=-4)
    if dilate > 1 and log_d == s:
        nodes = _select(nodes)
    out = trace_steps(params, ctx, nodes, auto_keys_ntt,
                      gals[s : s + tail])
    return out[..., : count // dilate, :, :, :]
