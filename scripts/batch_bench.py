"""Batched encrypted reads (BASELINE.json config 3): B independent
addresses vmapped over shared RAM + keys on one chip; reports reads/s.

Also times the 2^24 row-scaled config (config 4) single read when
--config 2_24 is given."""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_2_24, PARAMS_CODE_2_14, PARAMS_2_18_WIDE,
    PARAMS_2_24_WIDE, PARAMS_2_18_READOPT, PARAMS_2_24_READOPT)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2_18")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cached", action="store_true",
                    help="use the spectral data cache (read-heavy mode)")
    args = ap.parse_args()
    par = {"2_18": PARAMS_README_2_18, "2_24": PARAMS_2_24,
           "2_14": PARAMS_CODE_2_14, "2_18w": PARAMS_2_18_WIDE,
           "2_24w": PARAMS_2_24_WIDE, "2_18r": PARAMS_2_18_READOPT,
           "2_24r": PARAMS_2_24_READOPT}[args.config]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    import contextlib
    # the pallas NTT backend cannot lower on CPU, and client-side
    # transforms must share the server's spectrum order -> run client
    # ops on the TPU when it is selected
    def client_ctx():
        if os.environ.get("FHERAM_NTT") != "pallas":
            return jax.default_device(cpu)
        return contextlib.nullcontext()

    with client_ctx():
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        t0 = time.time()
        ekp = keys.prepare(par, keys.keygen(par, sk, src))
        print(f"keygen {time.time()-t0:.0f}s", flush=True)
        rnd = np.random.default_rng(5)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        t0 = time.time()
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        print(f"ram encrypt {time.time()-t0:.0f}s shape={ram_ct.shape}", flush=True)
        idxs = [int(rnd.integers(0, par.max_addr)) for _ in range(args.batch)]
        aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
               for i in idxs]
        coords = tuple(
            jnp.stack([a.coordinates[i] for a in aps], axis=0)
            for i in range(len(aps[0].coordinates)))

    ram_dev = jax.device_put(ram_ct, tpu)
    atk_dev = jax.device_put(ekp.atk_glwe, tpu)
    coords_dev = jax.device_put(coords, tpu)

    cache_dev = None
    if args.cached:
        cache_dev = jax.jit(
            lambda d: address_mod.spectral_cache(par, ctx, d))(ram_dev)
        jax.block_until_ready(cache_dev)

    fn = jax.jit(lambda d, c, a: ram_mod.read_batch_impl(
        par, ctx, d, c, a, cache_dev))
    # timing fetches ONE scalar (the full [B, W, C, L, N] output is
    # ~25 MB -- fetching it over the axon tunnel would dominate)
    fn_scalar = jax.jit(
        lambda d, c, a: jnp.sum(
            ram_mod.read_batch_impl(par, ctx, d, c, a, cache_dev)
            [:, :, :, 0, 0]))

    t0 = time.time()
    out = np.asarray(fn(ram_dev, coords_dev, atk_dev))
    print(f"compile+first: {time.time()-t0:.0f}s out={out.shape}", flush=True)
    t0 = time.time()
    np.asarray(fn_scalar(ram_dev, coords_dev, atk_dev))
    print(f"scalar compile+first: {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn_scalar(ram_dev, coords_dev, atk_dev))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"batch={args.batch} (wall): {t*1000:.0f} ms total, "
          f"{t/args.batch*1000:.2f} ms/read, {args.batch/t:.1f} reads/s", flush=True)

    # scan-slope: k chained batched calls inside ONE jit -- the per-call
    # wall above carries 20-90 ms of axon-tunnel RPC overhead, which at
    # B=64 (~200 ms of work) inflates the per-read figure 10-40%.
    # cache passed as an ARGUMENT: a closed-over device array becomes an
    # HLO constant and blows the remote compile service's request-size
    # limit (HTTP 413) when combined with the coords/keys
    # Hoisting: with the spectral cache the batched read NEVER reads the
    # data argument (level-0 consumes the cache), so a carry-threaded
    # body is loop-INVARIANT and XLA legally hoists it out of the scan
    # (measured: k=4 walls == k=1 walls at B=512).  Each iteration must
    # consume DIFFERENT inputs: roll the address batch by the iteration
    # index (the roll itself is a major-dim copy, ~0.01 ms/read noise).
    def k_calls(kk):
        def f(d, c, a, cache):
            def body(carry, i):
                cs = jax.tree.map(lambda x: jnp.roll(x, i, axis=0), c)
                y = ram_mod.read_batch_impl(par, ctx, d, cs, a, cache)
                return carry + jnp.sum(y[0, 0, :, 0, 0]), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(kk))
            return acc
        return jax.jit(f)

    try:
        kk = 4
        s1, sk_ = k_calls(1), k_calls(kk)
        np.asarray(s1(ram_dev, coords_dev, atk_dev, cache_dev))
        np.asarray(sk_(ram_dev, coords_dev, atk_dev, cache_dev))
        def _w(f):
            t0 = time.perf_counter()
            np.asarray(f(ram_dev, coords_dev, atk_dev, cache_dev))
            return time.perf_counter() - t0
        w1 = [_w(s1) for _ in range(3)]
        wk = [_w(sk_) for _ in range(3)]
        print(f"raw walls: k=1 {['%.0f' % (v*1000) for v in w1]} ms, "
              f"k={kk} {['%.0f' % (v*1000) for v in wk]} ms", flush=True)
        t1, tkk = min(w1), min(wk)
        ts_ = (tkk - t1) / (kk - 1)
        print(f"batch={args.batch} (slope): {ts_*1000:.0f} ms/call, "
              f"{ts_/args.batch*1000:.3f} ms/read, "
              f"{args.batch/ts_:.1f} reads/s", flush=True)
    except Exception as e:
        print(f"slope measurement skipped: {e}", flush=True)

    # correctness spot-check (decode shares the server backend/device)
    with client_ctx():
        for b in (0, args.batch - 1):
            i = 0
            want = glwe.cast_u8_signed(int(data[idxs[b] * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(out[b, i]))
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (b, val, want)
        print("batch reads CORRECT", flush=True)


if __name__ == "__main__":
    main()
