"""Full-size smoke + timing on the real TPU chip.

Client-side ops (keygen, encrypts, decrypts) run eagerly on local CPU;
server-side read/rpw/write run jitted on the TPU (axon).
Usage: python scripts/smoke_tpu.py [--config 2_18|2_14] [--writes]
"""

import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_CODE_2_14, PARAMS_2_18_WIDE, PARAMS_2_14_WIDE)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2_18")
    ap.add_argument("--writes", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    par = {"2_18": PARAMS_README_2_18, "2_14": PARAMS_CODE_2_14,
           "2_18w": PARAMS_2_18_WIDE, "2_14w": PARAMS_2_14_WIDE}[args.config]
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print("tpu device:", tpu, flush=True)

    def client_ctx():
        # pallas backend cannot lower on CPU -> client ops on TPU then
        if os.environ.get("FHERAM_NTT") == "pallas":
            return contextlib.nullcontext()
        return jax.default_device(cpu)

    with client_ctx():
        t0 = time.time()
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        print(f"secret: {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        ek = keys.keygen(par, sk, src)
        ekp = keys.prepare(par, ek)
        print(f"keygen+prepare: {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        rnd = np.random.default_rng(5)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        print(f"ram encrypt: {time.time()-t0:.1f}s shape={ram_ct.shape}", flush=True)

        idx = int(rnd.integers(0, par.max_addr))
        addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
        ap_prep = address_mod.prepare(ctx, addr)

    # move server-side state to TPU
    t0 = time.time()
    ram_dev = jax.device_put(ram_ct, tpu)
    keys_dev = jax.device_put(ekp, tpu)
    addr_dev = jax.device_put(ap_prep, tpu)
    addr_coeff_dev = jax.device_put(addr, tpu)
    jax.block_until_ready(ram_dev)
    print(f"transfer: {time.time()-t0:.1f}s", flush=True)

    server = ram_mod.FheRam(par, keys_dev)
    st = server.init_state(ram_dev)

    t0 = time.time()
    out = server.read(st, addr_dev)
    jax.block_until_ready(out)
    print(f"read compile+first: {time.time()-t0:.1f}s", flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = server.read(st, addr_dev)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    print(f"read times: {[f'{t*1000:.1f}ms' for t in times]}", flush=True)

    with client_ctx():
        out_cpu = (out if os.environ.get("FHERAM_NTT") == "pallas"
                   else jax.device_put(out, cpu))
        ok = True
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out_cpu[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            print(f"subram {i}: got {int(val)} want {want} noise {float(noise):.1f}")
            ok &= int(val) == want and noise < -(par.k_pt + 1)
        print("READ CORRECT" if ok else "READ WRONG", flush=True)

    if args.writes:
        t0 = time.time()
        out, st = server.read_prepare_write(st, addr_dev)
        jax.block_until_ready(st.data)
        print(f"rpw compile+first: {time.time()-t0:.1f}s", flush=True)

        with client_ctx():
            new_word = rnd.integers(0, 256, size=par.word_size).astype(np.uint8)
            w_ct = ram_mod.encrypt_write_word(par, ctx, s_ntt, new_word, src)
        w_dev = jax.device_put(w_ct, tpu)
        t0 = time.time()
        st = server.write(st, w_dev, addr_coeff_dev)
        jax.block_until_ready(st.data)
        print(f"write compile+first: {time.time()-t0:.1f}s", flush=True)

        # timed rpw + write (one full cycle each)
        t0 = time.time()
        out, st = server.read_prepare_write(st, addr_dev)
        jax.block_until_ready(st.data)
        t_rpw = time.time() - t0
        t0 = time.time()
        st = server.write(st, w_dev, addr_coeff_dev)
        jax.block_until_ready(st.data)
        t_w = time.time() - t0
        print(f"rpw: {t_rpw*1000:.1f}ms write: {t_w*1000:.1f}ms", flush=True)

        out2 = server.read(st, addr_dev)
        with client_ctx():
            out2_cpu = (out2 if os.environ.get("FHERAM_NTT") == "pallas"
                        else jax.device_put(out2, cpu))
            ok = True
            for i in range(par.word_size):
                want = glwe.cast_u8_signed(int(new_word[i]), par.k_pt)
                ph = glwe.phase(par, ctx, s_ntt, out2_cpu[i])
                val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
                print(f"after write subram {i}: got {int(val)} want {want} noise {float(noise):.1f}")
                ok &= int(val) == want
            print("WRITE CORRECT" if ok else "WRITE WRONG", flush=True)


if __name__ == "__main__":
    main()
