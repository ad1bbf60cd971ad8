"""Benchmark driver: encrypted read latency at the reference's headline
configuration (MAX_ADDR=2^18, WORDSIZE=4, LOG_N=12 -- README.md:29-36),
on one TPU chip, vs the 450 ms i9-12900K single-thread baseline.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...,
   "preset": <headline preset>, "presets": {<name>: <full row>, ...}}
vs_baseline > 1.0 means faster than the reference baseline.

Every preset row carries uncached read, cached read, rpw+write and
batched reads/s, all min-of-5 (round-5 headline hygiene: one preset's
RMW is never quoted beside another preset's read).  By default BOTH
production presets run (TURBO_READOPT = headline, READOPT = secondary);
FHERAM_BENCH_SECOND=0 skips the secondary, FHERAM_BENCH_DECOMP picks a
different headline.  Client-side ops (keygen/encrypt) run on local CPU
unless the pallas NTT backend is selected; server ops on TPU.
"""

import contextlib
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

# min-of-N policy (VERDICT r4 #5: "all min-of-5")
N_BEST = int(os.environ.get("FHERAM_BENCH_NBEST", "5"))


def client_ctx(cpu):
    # the pallas NTT backend cannot lower on CPU, and client-side
    # transforms must share the server's spectrum order -> run client
    # ops on the TPU when it is selected
    if os.environ.get("FHERAM_NTT") != "pallas":
        return jax.default_device(cpu)
    return contextlib.nullcontext()


def bench_preset(par, preset_name):
    """Full benchmark row for one parameter preset: uncached read,
    cached read, rpw+write cycle, batched reads/s -- all scan-slope
    (k ops inside one jitted lax.scan; per-call walls over the axon
    tunnel carry 20-90 ms RPC noise), all min-of-N_BEST, with the
    decrypt + noise gate on a real read."""
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod
    from fhe_ram_tpu.ram import ram as ram_mod
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    with client_ctx(cpu):
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        ekp = keys.prepare(par, keys.keygen(par, sk, src))
        rnd = np.random.default_rng(5)
        data = rnd.integers(0, 256,
                            size=par.max_addr * par.word_size).astype(np.uint8)
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

    from fhe_ram_tpu.ram.ram import read_impl

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

    def best_of(fn, args, n=N_BEST):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    args_r = (ram_dev, coords_k_dev, keys_dev.atk_glwe)
    t1, tk = best_of(f1, args_r), best_of(fk, args_r)
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
            args_c = (ram_dev, coords_k_dev, keys_dev.atk_glwe, cache_dev)
            np.asarray(g1(*args_c))
            np.asarray(gk(*args_c))
            cached_read_ms = ((best_of(gk, args_c) - best_of(g1, args_c))
                              / (k - 1) * 1000.0)
        except Exception as e:  # pragma: no cover
            print(f"[{preset_name}] cached-read bench skipped: {e}",
                  file=sys.stderr)

    # batched reads (BASELINE config 3): B addresses per call through the
    # batch-gridded kernels + spectral cache, slope-measured (k chained
    # calls in one jit)
    batched_rps = None
    if os.environ.get("FHERAM_BENCH_BATCH", "1") == "1":
        try:
            from fhe_ram_tpu.ram.address import spectral_cache
            from fhe_ram_tpu.ram.ram import read_batch_impl

            B = int(os.environ.get("FHERAM_BENCH_B", "64"))
            with client_ctx(cpu):
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
            args_b = (ram_dev, coords_b_dev, keys_dev.atk_glwe, cache_b)
            np.asarray(b1(*args_b))
            np.asarray(bk(*args_b))
            slope_s = (best_of(bk, args_b) - best_of(b1, args_b)) / (kb - 1)
            batched_rps = B / slope_s
        except Exception as e:  # pragma: no cover
            print(f"[{preset_name}] batched bench skipped: {e}",
                  file=sys.stderr)

    out = server.read(server.init_state(ram_dev), addr_dev)
    jax.block_until_ready(out)

    # correctness gate: a fast wrong answer is worthless
    with client_ctx(cpu):
        out_cpu = out
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]),
                                       par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out_cpu[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, \
                f"bench correctness failure: {val} != {want}"
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
        t1 = best_of(c1, (ram_dev,))
        t2 = best_of(c2, (ram_dev,))
        rmw_ms = (t2 - t1) / (kc - 1) * 1000.0
    except Exception as e:  # pragma: no cover
        print(f"[{preset_name}] rmw bench skipped: {e}", file=sys.stderr)

    row = {
        "read_ms": round(read_ms, 3),
        "read_vs_baseline": round(BASELINE_READ_MS / read_ms, 2),
    }
    if cached_read_ms is not None:
        row["read_cached_ms"] = round(cached_read_ms, 3)
    if rmw_ms is not None:
        row["rpw_plus_write_ms"] = round(rmw_ms, 3)
        row["write_vs_baseline"] = round(BASELINE_WRITE_MS / rmw_ms, 2)
    if batched_rps is not None:
        row["batched_reads_per_s"] = round(batched_rps, 1)
    print(f"[{preset_name}] {json.dumps(row)}", file=sys.stderr, flush=True)
    return row


def _preset(name):
    import fhe_ram_tpu.params as P
    return getattr(P, f"PARAMS_2_18_{name}") if name != "README" \
        else P.PARAMS_README_2_18


def main():
    # Headline config: 2^18 x 4xu8 with the TPU-first wide-digit address
    # decomposition (decomp_n=(12,): ONE GGSW per coordinate -- a legal
    # configuration of the reference's decomp_n constructor parameter,
    # src/ram.rs:72-87, with strictly less noise; see params.py) plus
    # READ-path gadget truncation (a priced noise trade on the
    # ephemeral read outputs; the in-bench decrypt gate checks the real
    # noise every run) and the turbo 3-limb address GGSWs (refresh
    # budget 5.8e7 RMW cycles, above the reference's ~40M bar;
    # README.md:36).  FHERAM_BENCH_DECOMP overrides: ref / wide /
    # readopt / turbo_readopt.
    sel = os.environ.get("FHERAM_BENCH_DECOMP", "turbo_readopt").upper()
    headline = "README" if sel == "REF" else sel
    rows = {headline: bench_preset(_preset(headline), headline)}

    # secondary preset: the full READOPT row beside the headline so both
    # production presets are published end-to-end each run
    second = os.environ.get("FHERAM_BENCH_SECOND", "READOPT").upper()
    if second not in ("0", "NONE", headline):
        try:
            rows[second] = bench_preset(_preset(second), second)
        except Exception as e:  # pragma: no cover
            print(f"secondary preset {second} skipped: {e}", file=sys.stderr)

    head = rows[headline]
    result = {
        "metric": "encrypted_read_latency_2^18_4xu8_1chip",
        "value": head["read_ms"],
        "unit": "ms",
        "vs_baseline": head["read_vs_baseline"],
        "preset": headline,
    }
    for k in ("rpw_plus_write_ms", "write_vs_baseline", "read_cached_ms",
              "batched_reads_per_s"):
        if k in head:
            result[k] = head[k]
    result["presets"] = rows
    print(json.dumps(result))


if __name__ == "__main__":
    main()
