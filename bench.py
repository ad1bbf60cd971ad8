"""Benchmark driver: encrypted read latency at the reference's headline
configuration (MAX_ADDR=2^18, WORDSIZE=4, LOG_N=12 -- README.md:29-36),
on one TPU chip, vs the 450 ms i9-12900K single-thread baseline.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}
vs_baseline > 1.0 means faster than the reference baseline.

Extra timings (rpw/write cycle) are included as additional keys.
Client-side ops (keygen/encrypt) run on local CPU; server ops on TPU.
"""

import json
import os
import sys
import time

# fused-Pallas NTT path by default (FHERAM_NTT=butterfly to compare)
os.environ.setdefault("FHERAM_NTT", "pallas")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

BASELINE_READ_MS = 450.0
BASELINE_WRITE_MS = 1200.0


def main():
    # Headline config: 2^18 x 4xu8 with the TPU-first wide-digit address
    # decomposition (decomp_n=(12,): ONE GGSW per coordinate -- a legal
    # configuration of the reference's decomp_n constructor parameter,
    # src/ram.rs:72-87, with strictly less noise; see params.py) plus
    # READ-path gadget truncation (a priced noise trade on the
    # ephemeral read outputs; the in-bench decrypt gate below checks
    # the real noise every run) and, by default, the turbo 3-limb
    # address GGSWs (see the default branch).
    # FHERAM_BENCH_DECOMP=ref re-runs the reference's [3,3,3,3] digits;
    # =wide the untruncated wide-digit config; =readopt the 4-limb
    # read-optimized preset.
    _decomp = os.environ.get("FHERAM_BENCH_DECOMP")
    if _decomp == "ref":
        from fhe_ram_tpu.params import PARAMS_README_2_18 as par
    elif _decomp == "wide":
        from fhe_ram_tpu.params import PARAMS_2_18_WIDE as par
    elif _decomp == "readopt":
        from fhe_ram_tpu.params import PARAMS_2_18_READOPT as par
    else:
        # DEFAULT (round 4): the turbo x readopt cross -- 3-limb address
        # GGSWs shrink the write path's inverse products 25% on top of
        # the read truncation.  Round 3 kept it opt-in because the
        # write REGRESSED (fused-kernel blocking); the round-4
        # exact-data-carry write removed that, and the cross now beats
        # READOPT on BOTH headline metrics (read 2.45 vs ~2.6, RMW 6.32
        # vs ~6.9).  Refresh budget 5.8e7 RMW cycles -- above the
        # reference's published >= ~40M (README.md:36); READOPT (1.33e8)
        # stays available via FHERAM_BENCH_DECOMP=readopt.
        from fhe_ram_tpu.params import PARAMS_2_18_TURBO_READOPT as par
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod
    from fhe_ram_tpu.ram import ram as ram_mod

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    import contextlib

    def client_ctx():
        # the pallas NTT backend cannot lower on CPU, and client-side
        # transforms must share the server's spectrum order -> run client
        # ops on the TPU when it is selected
        if os.environ.get("FHERAM_NTT") != "pallas":
            return jax.default_device(cpu)
        return contextlib.nullcontext()

    with client_ctx():
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        ekp = keys.prepare(par, keys.keygen(par, sk, src))
        rnd = np.random.default_rng(5)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        idx = int(rnd.integers(0, par.max_addr))
        addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
        ap = address_mod.prepare(ctx, addr)
        new_word = rnd.integers(0, 256, size=par.word_size).astype(np.uint8)
        w_ct = ram_mod.encrypt_write_word(par, ctx, s_ntt, new_word, src)
        # k DISTINCT addresses for the scan-slope: scanning one broadcast
        # address lets XLA hoist the (address-invariant) body out of the
        # loop and under-reports latency (caught in round 3 at the wide
        # config: 1.3 ms vs the honest 3.7)
        k = int(os.environ.get("BENCH_K", "8"))
        idxs = [int(rnd.integers(0, par.max_addr)) for _ in range(k)]
        aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt,
                                                            i, src))
               for i in idxs]
        coords_k = tuple(
            np.stack([np.asarray(a.coordinates[i]) for a in aps], axis=0)
            for i in range(len(aps[0].coordinates)))

    ram_dev = jax.device_put(ram_ct, tpu)
    keys_dev = jax.device_put(ekp, tpu)
    addr_dev = jax.device_put(ap, tpu)
    addr_coeff = jax.device_put(addr, tpu)
    w_dev = jax.device_put(w_ct, tpu)
    server = ram_mod.FheRam(par, keys_dev)

    # Latency methodology: k reads serialized inside one jitted scan with a
    # host fetch of a scalar at the end.  (block_until_ready over the remote
    # axon tunnel does not reliably wait, so naive per-call timing reads as
    # ~0.1ms async-enqueue time; the scan slope is robust.)
    from fhe_ram_tpu.ram.ram import read_impl
    import jax.numpy as jnp

    coords_k_dev = jax.device_put(coords_k, tpu)

    def k_reads_fn(k):
        def fn(data_in, coords_in, atk_in):
            def body(carry, cs):
                out = read_impl(par, ctx, data_in, cs, atk_in)
                return carry + jnp.sum(out[:, :, 0, 0]), None

            cs_k = jax.tree.map(lambda c: c[:k], coords_in)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), cs_k)
            return acc

        return jax.jit(fn)

    f1, fk = k_reads_fn(1), k_reads_fn(k)
    np.asarray(f1(ram_dev, coords_k_dev, keys_dev.atk_glwe))  # compile
    np.asarray(fk(ram_dev, coords_k_dev, keys_dev.atk_glwe))  # compile

    def best_of(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(ram_dev, coords_k_dev, keys_dev.atk_glwe))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tk = best_of(f1), best_of(fk)
    read_ms = (tk - t1) / (k - 1) * 1000.0

    # cached read: the spectral data cache (address-independent forward
    # NTT of the RAM's gadget digits, FheRam.spectral_cache) is a
    # legitimate per-state precomputation for read-heavy workloads --
    # reported as an EXTRA key; the headline stays the uncached read.
    cached_read_ms = None
    if os.environ.get("FHERAM_BENCH_CACHED", "1") == "1":
        try:
            from fhe_ram_tpu.ram.address import spectral_cache
            from fhe_ram_tpu.ram.ram import read_batch_impl
            cache_dev = jax.jit(
                lambda d: spectral_cache(par, ctx, d))(ram_dev)

            def k_cached_fn(k):
                def fn(data_in, coords_in, atk_in, cache_in):
                    def body(carry, cs):
                        out = read_batch_impl(
                            par, ctx, data_in,
                            jax.tree.map(lambda c: c[None], cs),
                            atk_in, cache_in)[0]
                        return carry + jnp.sum(out[:, :, 0, 0]), None

                    cs_k = jax.tree.map(lambda c: c[:k], coords_in)
                    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                          cs_k)
                    return acc

                return jax.jit(fn)

            g1, gk = k_cached_fn(1), k_cached_fn(k)

            def best_cached(fn, n=5):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    np.asarray(fn(ram_dev, coords_k_dev, keys_dev.atk_glwe,
                                  cache_dev))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            np.asarray(g1(ram_dev, coords_k_dev, keys_dev.atk_glwe,
                          cache_dev))
            np.asarray(gk(ram_dev, coords_k_dev, keys_dev.atk_glwe,
                          cache_dev))
            cached_read_ms = ((best_cached(gk) - best_cached(g1))
                              / (k - 1) * 1000.0)
        except Exception as e:  # pragma: no cover
            print(f"cached-read bench skipped: {e}", file=sys.stderr)

    # batched reads (BASELINE config 3): B addresses per call through the
    # batch-gridded kernels + spectral cache, slope-measured (k chained
    # calls in one jit; a per-call wall carries 20-90 ms tunnel RPC
    # overhead = 10-40% at this call size)
    batched_rps = None
    if os.environ.get("FHERAM_BENCH_BATCH", "1") == "1":
        try:
            from fhe_ram_tpu.ram.address import spectral_cache
            from fhe_ram_tpu.ram.ram import read_batch_impl

            B = int(os.environ.get("FHERAM_BENCH_B", "64"))
            with client_ctx():
                aps_b = [address_mod.prepare(ctx, address_mod.encrypt(
                    par, ctx, s_ntt, int(rnd.integers(0, par.max_addr)), src))
                    for _ in range(B)]
                coords_b = tuple(
                    np.stack([np.asarray(a.coordinates[i]) for a in aps_b], 0)
                    for i in range(len(aps_b[0].coordinates)))
            coords_b_dev = jax.device_put(coords_b, tpu)
            cache_b = jax.jit(lambda d: spectral_cache(par, ctx, d))(ram_dev)

            def k_batch(kk):
                # each iteration reads a ROLLED address batch: with the
                # cache the body never reads `d`, so same-input
                # iterations are loop-invariant and XLA hoists them
                # (see scripts/batch_bench.py)
                def fn(d, c, atk_in, cache_in):
                    def body(carry, i):
                        cs = jax.tree.map(
                            lambda x: jnp.roll(x, i, axis=0), c)
                        y = read_batch_impl(par, ctx, d, cs, atk_in,
                                            cache_in)
                        return carry + jnp.sum(y[0, 0, :, 0, 0]), None
                    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                          jnp.arange(kk))
                    return acc
                return jax.jit(fn)

            kb = 4
            b1, bk = k_batch(1), k_batch(kb)

            def best_b(fn, n=3):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    np.asarray(fn(ram_dev, coords_b_dev, keys_dev.atk_glwe,
                                  cache_b))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            np.asarray(b1(ram_dev, coords_b_dev, keys_dev.atk_glwe, cache_b))
            np.asarray(bk(ram_dev, coords_b_dev, keys_dev.atk_glwe, cache_b))
            slope_s = (best_b(bk) - best_b(b1)) / (kb - 1)
            batched_rps = B / slope_s
        except Exception as e:  # pragma: no cover
            print(f"batched bench skipped: {e}", file=sys.stderr)

    def best_cycle(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(ram_dev))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = server.read(server.init_state(ram_dev), addr_dev)
    jax.block_until_ready(out)

    # correctness gate: a fast wrong answer is worthless
    with client_ctx():
        out_cpu = out
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out_cpu[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, f"bench correctness failure: {val} != {want}"
            assert noise < -(par.k_pt + 1), f"noise bound violated: {noise}"

    # full read-modify-write cycle, chained scan-slope (k cycles in one
    # jit, each cycle's RAM feeding the next)
    rmw_ms = None
    try:
        from fhe_ram_tpu.ram.ram import rpw_impl, write_impl

        coords_p = addr_dev.coordinates
        coords_c = addr_coeff.coordinates

        def k_cycles(k):
            def fn(d0):
                def body(d, _):
                    o, d2, tree = rpw_impl(par, ctx, d, coords_p,
                                           keys_dev.atk_glwe)
                    d3 = write_impl(par, ctx, d2, tree, w_dev, coords_c,
                                    keys_dev)
                    return d3, jnp.sum(o[:, :, 0, 0])
                d_end, outs = jax.lax.scan(body, d0, None, length=k)
                return jnp.sum(outs) + d_end[0, 0, 0, 0, 0]
            return jax.jit(fn)

        # slope over 5 extra cycles: a single-cycle delta (~8 ms) is
        # below the tunnel-overhead noise floor (~+-2 ms)
        kc = 6
        c1, c2 = k_cycles(1), k_cycles(kc)
        np.asarray(c1(ram_dev)); np.asarray(c2(ram_dev))  # compile
        t1 = min(best_cycle(c1) for _ in range(1))
        t2 = min(best_cycle(c2) for _ in range(1))
        rmw_ms = (t2 - t1) / (kc - 1) * 1000.0
    except Exception as e:  # pragma: no cover
        print(f"rmw bench skipped: {e}", file=sys.stderr)

    result = {
        "metric": "encrypted_read_latency_2^18_4xu8_1chip",
        "value": round(read_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_READ_MS / read_ms, 2),
    }
    if rmw_ms is not None:
        result["rpw_plus_write_ms"] = round(rmw_ms, 3)
        result["write_vs_baseline"] = round(BASELINE_WRITE_MS / rmw_ms, 2)
    if cached_read_ms is not None:
        result["read_cached_ms"] = round(cached_read_ms, 3)
    if batched_rps is not None:
        result["batched_reads_per_s"] = round(batched_rps, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
