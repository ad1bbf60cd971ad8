"""GLWE packer tests (small ring).

Covers the log-depth batched tree packer (core/packer.py) including:
  * decrypt-level slot mapping (coefficient m == slot-0 of cts[m]),
  * the full M == N mapping,
  * equivalence against an independently-coded STREAMING oracle that
    mirrors the reference's sequential insertion loop — bit-reversed
    insertion order with binary-counter merges and zero-ct cleanup for
    the None inserts (reference: src/ram.rs:425-448, lib.rs:23-26).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_TEST_SMALL as PAR, reverse_bits_msb
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops, poly
from fhe_ram_tpu.core import glwe, keyswitch, packer, keys, rng

CTX = get_ntt_context(PAR.n, PAR.primes)


def setup(seed=2):
    src = rng.Source(seed)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(CTX, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    return src, sk, s_ntt, ekp


def decode_all(ph):
    t = limb_ops.torus_float(np.asarray(ph))
    m = 1 << PAR.k_pt
    d = np.rint(t * m).astype(np.int64)
    return ((d + m // 2) % m) - m // 2


def enc(src, s_ntt, vals):
    return glwe.encrypt(PAR, CTX, s_ntt, glwe.encode_vec(PAR, jnp.asarray(vals)), src)


def test_pack():
    """Pack M ciphertexts' slot-0 values; after a full trace of any
    rotated result, coefficient m must surface (read-path contract)."""
    src, sk, s_ntt, ekp = setup()
    M = 4
    slot_vals = [1, -2, 3, 0]
    pts = np.zeros((M, PAR.n), dtype=np.int64)
    for m, v in enumerate(slot_vals):
        pts[m, 0] = v
        pts[m, 1:] = (np.arange(PAR.n - 1) % 3) - 1  # garbage in other slots
    cts = enc(src, s_ntt, pts)
    fn = jax.jit(partial(packer.pack, PAR, CTX))
    packed = fn(cts, auto_keys_ntt=ekp.atk_glwe)
    ph = glwe.phase(PAR, CTX, s_ntt, packed)
    got = decode_all(ph)
    # coefficients 0..M-1 must hold the slot values (coefficients >= M may
    # hold garbage by design; the pipeline always traces after selection)
    assert list(got[:M]) == slot_vals, got[:8]

    # extraction: rotate by -m then trace -> slot m at coeff 0
    for m, v in enumerate(slot_vals):
        r = poly.rotate(packed, -m)
        res = keyswitch.trace(PAR, CTX, r, ekp.atk_glwe)
        val, noise = glwe.decode_coeff0(
            PAR, np.asarray(glwe.phase(PAR, CTX, s_ntt, res)), v)
        assert int(val) == v
        assert noise < -(PAR.k_pt + 1), noise


def test_pack_full_ring():
    """M == N: every coefficient of the packed result is pinned, so the
    complete coefficient mapping (m -> cts[m] slot 0) is checked."""
    src, sk, s_ntt, ekp = setup(seed=7)
    M = PAR.n
    rnd = np.random.default_rng(3)
    slot_vals = rnd.integers(-(1 << (PAR.k_pt - 1)), 1 << (PAR.k_pt - 1), size=M)
    pts = np.zeros((M, PAR.n), dtype=np.int64)
    pts[:, 0] = slot_vals
    cts = enc(src, s_ntt, pts)
    packed = jax.jit(partial(packer.pack, PAR, CTX))(
        cts, auto_keys_ntt=ekp.atk_glwe)
    got = decode_all(glwe.phase(PAR, CTX, s_ntt, packed))
    assert np.array_equal(got, slot_vals), (got[:8], slot_vals[:8])


def _streaming_pack_oracle(cts, n_insert, atk):
    """The reference packer's algorithm, coded independently: stream N
    inserts in bit-reversed index order (src/ram.rs:425-426) through a
    binary-counter accumulator.  Insert j's low counter bit is item
    index bit log_n-1, so the counter's level-l merge pairs items
    N/2^(l+1) apart (the EARLIEST merges carry the LARGEST stride --
    the opposite nesting of the batched tree in core/packer.pack):

        C = (A + X^{N/2^(l+1)} B) + sigma_{2^(l+1)+1}(A - X^{N/2^(l+1)} B)

    with A the earlier (lower-index) node.  Zero ciphertexts stand in
    for slots beyond n_insert (the reference's `None` cleanup inserts,
    src/ram.rs:435-444).  Inputs are pre-scaled by 1/N once, as in
    core/packer.pack."""
    n = PAR.n
    log_n = PAR.log_n
    zero = jnp.zeros_like(cts[0])
    cts = limb_ops.normalize(limb_ops.shift_right(cts, log_n))
    slots = [None] * (log_n + 1)  # binary counter: one pending node per level
    for j in range(n):
        jrev = reverse_bits_msb(j, log_n)
        node = cts[jrev] if jrev < n_insert else zero
        l = 0
        while slots[l] is not None:
            a = slots[l]
            slots[l] = None
            t = n >> (l + 1)
            g = (2 << l) + 1
            xb = poly.rotate(node, t)
            u = a + xb
            v = a - xb
            w = keyswitch.automorphism_ks(PAR, CTX, v, g, atk[g],
                                          out_limbs=v.shape[-2])
            node = limb_ops.normalize(u + w)
            l += 1
        slots[l] = node
    assert slots[log_n] is not None
    return slots[log_n]


def test_pack_matches_streaming_reference_order():
    """The tree packer and the reference-order streaming oracle must
    agree at the decrypted level on all occupied coefficients; the
    streaming result (with cleanup inserts) is zero elsewhere."""
    src, sk, s_ntt, ekp = setup(seed=11)
    M = 8
    rnd = np.random.default_rng(5)
    slot_vals = rnd.integers(-(1 << (PAR.k_pt - 1)), 1 << (PAR.k_pt - 1), size=M)
    pts = np.zeros((M, PAR.n), dtype=np.int64)
    pts[:, 0] = slot_vals
    pts[:, 1:] = rnd.integers(-2, 3, size=(M, PAR.n - 1))  # garbage slots
    cts = enc(src, s_ntt, pts)

    tree = packer.pack(PAR, CTX, cts, ekp.atk_glwe)
    stream = _streaming_pack_oracle(cts, M, ekp.atk_glwe)

    got_tree = decode_all(glwe.phase(PAR, CTX, s_ntt, tree))
    got_stream = decode_all(glwe.phase(PAR, CTX, s_ntt, stream))
    assert np.array_equal(got_tree[:M], slot_vals)
    assert np.array_equal(got_stream[:M], slot_vals)
    # streaming cleanup zeroes everything beyond the inserted count
    assert not np.any(got_stream[M:]), got_stream[M : M + 8]


def test_pack_tree_dilated_matches_pack():
    """The distributed pack decomposition (packer.pack_tree): r local
    dilated trees over the strided leaf classes + the log2(r) tail over
    the gathered roots must be BIT-exact with the monolithic pack()
    (this is what parallel/mesh._pack_rows_sharded runs per shard)."""
    src, sk, s_ntt, ekp = setup(seed=9)
    M = 8
    pts = np.zeros((M, PAR.n), dtype=np.int64)
    pts[:, 0] = [3, -1, 0, 2, -3, 1, 2, -2]
    cts = enc(src, s_ntt, pts)
    want = np.asarray(jax.jit(partial(packer.pack, PAR, CTX))(
        cts, auto_keys_ntt=ekp.atk_glwe))

    for r in (2, 4):
        # shard k holds leaves congruent to k mod r (strided layout)
        roots = [
            packer.pack_tree(PAR, CTX, cts[k::r], ekp.atk_glwe, dilate=r,
                             prescale=True)
            for k in range(r)
        ]
        got = np.asarray(packer.pack_tree(
            PAR, CTX, jnp.stack(roots), ekp.atk_glwe, dilate=1,
            prescale=False))
        assert np.array_equal(got, want), f"r={r}"
