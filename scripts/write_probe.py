"""Scan-slope probe for the full read-modify-write cycle: k chained
(rpw -> write) cycles inside one jit (each cycle's output RAM feeds the
next), one scalar fetch."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_2_18_WIDE, PARAMS_2_18_READOPT)

par = {"2_18w": PARAMS_2_18_WIDE, "2_18r": PARAMS_2_18_READOPT}.get(
    os.environ.get("FHERAM_CONFIG", ""), PARAMS_README_2_18)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def main():
    import contextlib

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    ctx_mgr = (jax.default_device(cpu)
               if os.environ.get("FHERAM_NTT") != "pallas"
               else contextlib.nullcontext())
    with ctx_mgr:
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
        w_ct = ram_mod.encrypt_write_word(
            par, ctx, s_ntt, rnd.integers(0, 256, size=par.word_size).astype(np.uint8), src)

    ram_dev = jax.device_put(ram_ct, tpu)
    keys_dev = jax.device_put(ekp, tpu)
    coords_p = jax.device_put(ap.coordinates, tpu)
    coords_c = jax.device_put(addr.coordinates, tpu)
    w_dev = jax.device_put(w_ct, tpu)

    def cycle(data_in):
        out, d2, tree = ram_mod.rpw_impl(par, ctx, data_in, coords_p,
                                         keys_dev.atk_glwe)
        d3 = ram_mod.write_impl(par, ctx, d2, tree, w_dev, coords_c, keys_dev)
        return d3, out

    def k_cycles(k):
        def fn(d0):
            def body(d, _):
                d2, out = cycle(d)
                return d2, jnp.sum(out[:, :, 0, 0])
            d_end, outs = jax.lax.scan(body, d0, None, length=k)
            return jnp.sum(outs) + d_end[0, 0, 0, 0, 0]
        return jax.jit(fn)

    for k in (1, 4):
        fn = k_cycles(k)
        t0 = time.time()
        r = np.asarray(fn(ram_dev))
        print(f"k={k} compile+run {time.time()-t0:.0f}s r={r}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(ram_dev))
            ts.append(time.perf_counter() - t0)
        print(f"k={k}: {min(ts)*1000:.0f} ms", flush=True)
        if k == 1:
            t1 = min(ts)
        else:
            print(f"per RMW cycle: {(min(ts)-t1)/(k-1)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
