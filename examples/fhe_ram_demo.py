"""End-to-end FHE-RAM demo: keygen -> encrypt RAM -> encrypted read ->
read_prepare_write -> write -> read-back, with wall timers, value
asserts, and measured noise — the counterpart of the reference's
example driver (reference: examples/fhe-ram.rs:49-176).

Runs anywhere:

    # CPU, small ring (seconds):
    JAX_PLATFORMS=cpu python examples/fhe_ram_demo.py

    # one TPU chip at the reference's headline 2^18 x 4xu8 geometry
    # (first compiles take minutes through the remote service):
    FHERAM_NTT=pallas python examples/fhe_ram_demo.py --config 2_18

NOTE on timings: wall timers here mirror the reference example's
Instant::now() and INCLUDE dispatch overhead; the honest per-op
latencies use the scan-slope method (bench.py, scripts/*_probe.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small",
                    choices=["small", "2_14", "2_18", "2_18r"])
    args = ap.parse_args()

    if args.config == "small" and os.environ.get("FHERAM_NTT") != "pallas":
        # small ring runs happily on CPU
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from fhe_ram_tpu.params import (
        PARAMS_TEST_SMALL, PARAMS_CODE_2_14, PARAMS_2_18_TURBO_READOPT,
        PARAMS_2_18_READOPT)
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod
    from fhe_ram_tpu.ram import ram as ram_mod

    par = {"small": PARAMS_TEST_SMALL, "2_14": PARAMS_CODE_2_14,
           "2_18": PARAMS_2_18_TURBO_READOPT,
           "2_18r": PARAMS_2_18_READOPT}[args.config]
    print(f"config: {args.config}  (max_addr=2^{par.max_addr.bit_length()-1}, "
          f"word={par.word_size} bytes, N={par.n})")
    print("devices:", jax.devices())

    # --- client side: keys + data (reference examples/fhe-ram.rs:49-79)
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    t0 = time.time()
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    print(f"keygen: {time.time()-t0:.1f}s")

    rnd = np.random.default_rng(7)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(
        np.uint8)
    t0 = time.time()
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    print(f"encrypt RAM ({par.max_addr * par.word_size} bytes): "
          f"{time.time()-t0:.1f}s")

    idx = int(rnd.integers(0, par.max_addr))
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    ap_ = address_mod.prepare(ctx, addr)

    def decode_word(out, want_bytes, tag):
        worst = 0.0
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(want_bytes[i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, np.asarray(out)[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (tag, i, int(val), want)
            worst = min(worst, noise) if worst else noise
        print(f"{tag}: CORRECT (worst noise 2^{worst:.1f})")

    # --- server side (reference :98-176)
    server = ram_mod.FheRam(par, ekp)
    state = server.init_state(ram_ct)

    t0 = time.time()
    out = np.asarray(server.read(state, ap_))
    print(f"read (wall, incl. compile): {time.time()-t0:.1f}s")
    decode_word(out, data[idx * par.word_size : (idx + 1) * par.word_size],
                "read")

    t0 = time.time()
    out2, state = server.read_prepare_write(state, ap_)
    out2 = np.asarray(out2)
    print(f"read_prepare_write (wall, incl. compile): {time.time()-t0:.1f}s")
    decode_word(out2, data[idx * par.word_size : (idx + 1) * par.word_size],
                "read_prepare_write")

    new_word = rnd.integers(0, 256, size=par.word_size).astype(np.uint8)
    w_ct = ram_mod.encrypt_write_word(par, ctx, s_ntt, new_word, src)
    t0 = time.time()
    state = server.write(state, w_ct, addr)
    jax.block_until_ready(state.data)
    print(f"write (wall, incl. compile): {time.time()-t0:.1f}s")

    out3 = np.asarray(server.read(state, ap_))
    decode_word(out3, new_word, "read-back after write")

    other = (idx + 1) % par.max_addr
    ap2 = address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt,
                                                       other, src))
    out4 = np.asarray(server.read(state, ap2))
    decode_word(out4, data[other * par.word_size : (other + 1) * par.word_size],
                "untouched neighbor")
    print("DEMO OK")


if __name__ == "__main__":
    main()
