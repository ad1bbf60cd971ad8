"""Per-phase attribution of the BATCHED read with random operands (no
keygen): scan-slope timings (k chained applications inside one jitted
lax.scan; per-call walls over the axon tunnel carry 20-90 ms RPC noise)
of the exact phases of ram._read_batch_slice:

  1. level-0 batched coordinate product (shared spectral data, optional
     cache) vs its single-read counterpart,
  2. batch-folded pack (B*W x R rows) vs the single pack (W x R),
  3. per-batch level-1 product + folded trace,
  4. end-to-end _read_batch_slice / read_batch_impl.

Usage: FHERAM_NTT=pallas python scripts/batch_phase_probe.py \
           [--b 64] [--k 4] [--config 2_18r] [--cached]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_2_18_WIDE, PARAMS_2_18_READOPT)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import keyswitch
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod

CONFIGS = {"2_18": PARAMS_README_2_18, "2_18w": PARAMS_2_18_WIDE,
           "2_18r": PARAMS_2_18_READOPT}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--config", default="2_18r")
    ap.add_argument("--cached", action="store_true",
                    help="feed level-0 the spectral data cache")
    args = ap.parse_args()
    B, k = args.b, args.k
    par = CONFIGS[args.config]
    tr_ep, tr_ks = par.read_ep_trunc, par.read_ks_trunc

    print("device:", jax.devices()[0], f"config={args.config} B={B} "
          f"cached={args.cached}", flush=True)

    rnd = np.random.default_rng(0)
    n, C = par.n, par.rank + 1
    P, W, R, L = par.num_primes, par.word_size, par.num_rows, par.limbs_ct
    Lg = par.limbs_ggsw
    b2d = par.base2d()
    dig0, dig1 = (len(r.bases) for r in b2d.rows)

    data = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, R, C, L, n)), jnp.int32)
    coords0 = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18,
                     size=(B, P, dig0, L, C, C, Lg, n)), jnp.int32)
    coords1 = jnp.asarray(
        rnd.integers(-(1 << 18), 1 << 18,
                     size=(B, P, dig1, L, C, C, Lg, n)), jnp.int32)
    atk = {
        g: jnp.asarray(
            rnd.integers(-(1 << 18), 1 << 18,
                         size=(P, L, par.rank, C, par.limbs_evk_trace, n)),
            jnp.int32)
        for g in par.trace_gal_els + tuple(
            (n >> l) + 1 for l in range(R.bit_length() - 1))
    }

    ctx = get_ntt_context(par.n, par.primes)
    from fhe_ram_tpu.ops.ntt_pallas import get_pallas_context

    get_pallas_context(par.n, tuple(par.primes))

    cache = None
    if args.cached:
        cache = jax.jit(
            lambda d: address_mod.spectral_cache(par, ctx, d))(data)
        jax.block_until_ready(cache)

    def measure(name, make_fn, x0, per_read=1, ops=()):
        """ops: extra operand arrays passed as JIT ARGUMENTS (closed-over
        device arrays become HLO constants and can blow the remote
        compile service's request-size limit -- HTTP 413)."""
        def chain(kk):
            def wrapped(x, *opnds):
                def body(c, _):
                    y = make_fn(c, *opnds)
                    return y, jnp.sum(jax.tree.leaves(y)[0][(0,) * 2])

                out, sums = jax.lax.scan(body, x, None, length=kk)
                return jnp.sum(sums)

            return jax.jit(wrapped)

        def _t(f, x):
            t0 = time.perf_counter()
            np.asarray(f(x, *ops))
            return time.perf_counter() - t0

        try:
            f1, fk = chain(1), chain(k)
            t0 = time.time()
            np.asarray(f1(x0, *ops)); np.asarray(fk(x0, *ops))
            print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
            t1 = min(_t(f1, x0) for _ in range(3))
            tk = min(_t(fk, x0) for _ in range(3))
            ms = (tk - t1) / (k - 1) * 1000.0
            print(f"{name}: {ms:.2f} ms ({ms/per_read:.3f} ms/read)",
                  flush=True)
            return ms
        except Exception as e:
            print(f"{name}: SKIP ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
            return float("nan")

    # ---- 1. level-0 batched, counter-driven roll: with the cache the
    # kernel never reads the data carry, so same-input iterations hoist
    # out of the scan; rolling the address batch per iteration index
    # keeps every iteration distinct.
    def l0_chain(kk):
        def f(d, c0, cc):
            def body(acc, i):
                cs = jnp.roll(c0, i, axis=0)
                y = address_mod.coordinate_product_batched(
                    par, ctx, d, cs, cc, trunc=tr_ep)
                return acc + jnp.sum(y[0, 0, :, 0, 0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(kk))
            return acc
        return jax.jit(f)

    try:
        l1f, lkf = l0_chain(1), l0_chain(k)
        lops = (data, coords0, cache)
        t0 = time.time()
        np.asarray(l1f(*lops)); np.asarray(lkf(*lops))
        print(f"level0 batched compile {time.time()-t0:.0f}s", flush=True)

        def _tl(f):
            t0 = time.perf_counter()
            np.asarray(f(*lops))
            return time.perf_counter() - t0

        t_l0b = (min(_tl(lkf) for _ in range(3))
                 - min(_tl(l1f) for _ in range(3))) / (k - 1) * 1000.0
        print(f"level0 batched (B={B}): {t_l0b:.2f} ms "
              f"({t_l0b/B:.3f} ms/read)", flush=True)
    except Exception as e:
        print(f"level0 batched: SKIP ({e})", flush=True)
        t_l0b = float("nan")

    def l0_single(x):
        return address_mod.coordinate_product(par, ctx, x, coords0[0],
                                              trunc=tr_ep)

    t_l0s = measure("level0 single", l0_single, data)

    # ---- 2. pack, batch-folded vs single
    lvl0_b = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B * W, R, C, L, n)),
        jnp.int32)

    def pack_b(x):
        return ram_mod._pack_rows(par, ctx, x, atk, trunc=tr_ks)[
            :, 0][:, None].repeat(R, 1)

    t_pk_b = measure(f"pack batched ({B*W} x {R} rows)", pack_b, lvl0_b,
                     per_read=B)

    def pack_s(x):
        return ram_mod._pack_rows(par, ctx, x, atk, trunc=tr_ks)[
            :, 0][:, None].repeat(R, 1)

    t_pk_s = measure(f"pack single ({W} x {R} rows)", pack_s, lvl0_b[:W])

    # ---- 3. level-1 perbatch + folded trace
    packed_b = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(B, W, C, L, n)), jnp.int32)

    def l1_tr(x):
        y = address_mod.coordinate_product_perbatch(par, ctx, x, coords1,
                                                    trunc=tr_ep)
        y = keyswitch.trace(par, ctx, y.reshape((B * W, C, L, n)), atk,
                            trunc=tr_ks)
        return y.reshape(B, W, C, L, n)

    t_l1 = measure("level1 perbatch + trace", l1_tr, packed_b, per_read=B)

    print(f"phase sum: {(t_l0b + t_pk_b + t_l1)/B:.3f} ms/read "
          f"(l0 {t_l0b/B:.3f} pack {t_pk_b/B:.3f} l1+tr {t_l1/B:.3f})",
          flush=True)

    # ---- 4. end-to-end batched slice (operands as jit args, see measure)
    # e2e with a COUNTER-driven roll: with the cache the read never
    # consumes the data carry, so same-input iterations hoist out of
    # the scan (see batch_bench.py); rolling the address batch by the
    # iteration index makes every iteration distinct.
    def e2e_chain(kk):
        def f(d, c0, c1, a, cc):
            def body(acc, i):
                cs = jax.tree.map(lambda x: jnp.roll(x, i, axis=0),
                                  (c0, c1))
                y = ram_mod.read_batch_impl(par, ctx, d, cs, a, cc)
                return acc + jnp.sum(y[0, 0, :, 0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(kk))
            return acc
        return jax.jit(f)

    try:
        e1, ek = e2e_chain(1), e2e_chain(k)
        eops = (data, coords0, coords1, atk, cache)
        t0 = time.time()
        np.asarray(e1(*eops)); np.asarray(ek(*eops))
        print(f"e2e compile {time.time()-t0:.0f}s", flush=True)

        def _te(f):
            t0 = time.perf_counter()
            np.asarray(f(*eops))
            return time.perf_counter() - t0

        t_e2e = (min(_te(ek) for _ in range(3))
                 - min(_te(e1) for _ in range(3))) / (k - 1) * 1000.0
        print(f"e2e read_batch_impl (B={B}): {t_e2e:.2f} ms "
              f"({t_e2e/B:.3f} ms/read)", flush=True)
    except Exception as e:
        print(f"e2e: SKIP ({type(e).__name__}: {str(e)[:200]})", flush=True)
        t_e2e = float("nan")
    print(f"e2e {t_e2e/B:.3f} ms/read vs phase sum "
          f"{(t_l0b + t_pk_b + t_l1)/B:.3f}", flush=True)


if __name__ == "__main__":
    main()
