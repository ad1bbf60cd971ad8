"""Scan-slope probe of the BATCHED read-modify-write
(ram.rmw_batch_impl) at 2^18: k chained calls (each call's RAM feeds
the next -- a real data dependence, so no hoisting concerns), B
distinct addresses per call.

Usage: FHERAM_NTT=pallas python scripts/rmw_batch_probe.py [--b 16] [--k 3]
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
    PARAMS_2_18_READOPT, PARAMS_2_18_TURBO_READOPT)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--config", default="2_18t")
    args = ap.parse_args()
    B, k = args.b, args.k
    par = {"2_18r": PARAMS_2_18_READOPT,
           "2_18t": PARAMS_2_18_TURBO_READOPT}[args.config]

    print("device:", jax.devices()[0], f"B={B} config={args.config}",
          flush=True)
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    t0 = time.time()
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    print(f"keygen {time.time()-t0:.0f}s", flush=True)
    rnd = np.random.default_rng(5)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(
        np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    # B distinct addresses + write words
    idxs = rnd.choice(par.max_addr, size=B, replace=False)
    addrs = [address_mod.encrypt(par, ctx, s_ntt, int(i), src) for i in idxs]
    aps = [address_mod.prepare(ctx, a) for a in addrs]
    cp = tuple(jnp.stack([a.coordinates[i] for a in aps], 0)
               for i in range(len(aps[0].coordinates)))
    cc = tuple(jnp.stack([a.coordinates[i] for a in addrs], 0)
               for i in range(len(addrs[0].coordinates)))
    new_words = rnd.integers(0, 256, size=(B, par.word_size)).astype(np.uint8)
    w_b = jnp.stack([ram_mod.encrypt_write_word(par, ctx, s_ntt, nw, src)
                     for nw in new_words], 0)
    print("setup done", flush=True)

    def chain(kk):
        def f(d, cp_, cc_, w_, ek):
            def body(carry, _):
                outs, d2 = ram_mod.rmw_batch_impl(par, ctx, carry, cp_, cc_,
                                                  w_, ek)
                return d2, jnp.sum(outs[0, 0, :, 0, 0])
            d_end, outs = jax.lax.scan(body, d, None, length=kk)
            return jnp.sum(outs) + d_end[0, 0, 0, 0, 0]
        return jax.jit(f)

    # correctness gate: one call, decode outs + landed words
    outs, d1 = jax.jit(lambda d, a, b_, w_, ek: ram_mod.rmw_batch_impl(
        par, ctx, d, a, b_, w_, ek))(ram_ct, cp, cc, w_b, ekp)
    outs = np.asarray(outs)
    for b in (0, B - 1):
        i = 0
        want = glwe.cast_u8_signed(
            int(data[int(idxs[b]) * par.word_size + i]), par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(outs[b, i]))
        val, _ = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want, (b, val, want)
    server = ram_mod.FheRam(par, ekp)
    ap0 = address_mod.prepare(ctx, address_mod.encrypt(
        par, ctx, s_ntt, int(idxs[0]), src))
    got = np.asarray(server.read(server.init_state(d1), ap0))
    want = glwe.cast_u8_signed(int(new_words[0][0]), par.k_pt)
    ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(got[0]))
    val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
    assert int(val) == want, (val, want)
    print(f"RMW BATCH CORRECT (write-back noise {noise:.1f})", flush=True)

    c1, ck = chain(1), chain(k)
    t0 = time.time()
    np.asarray(c1(ram_ct, cp, cc, w_b, ekp))
    np.asarray(ck(ram_ct, cp, cc, w_b, ekp))
    print(f"chain compiles {time.time()-t0:.0f}s", flush=True)

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(ram_ct, cp, cc, w_b, ekp))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(ck) - t(c1)) / (k - 1) * 1000.0
    print(f"rmw_batch B={B}: {ms:.1f} ms/call, {ms/B:.3f} ms per RMW, "
          f"{B/ms*1000:.1f} RMW/s", flush=True)


if __name__ == "__main__":
    main()
