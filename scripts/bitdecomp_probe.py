"""Production-ring homomorphic bit decomposition (the VM LOAD path,
vm/bitdecomp.py) on the real TPU: byte -> 8 bits at N=4096 / k_pt=9,
bsk in coefficient form (Lg=3 blind-rotation gadget; the prepared key
would be ~15-19 GiB), per-step in-chain NTT, chunk=4 phases.

Decode gate first (all 8 bits of several bytes must decode with noise
under the bound), then scan-slope latency of byte_to_bits.

Usage: FHERAM_NTT=pallas python scripts/bitdecomp_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_2_18_TURBO_READOPT as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import bitdecomp

P_BITS = 8
CHUNK = 4
BSK_LIMBS = 5  # blind-rotation gadget: Lg=5 (Lg=3 priced OUT at k_pt=9
               # once the value bit is the up-scaled gadget row;
               # core/noise.bitdecomp_bit_noise_log2)


def lift_gate(ctx, src, s_ntt, ekp, bsk):
    """FHERAM_BITPROBE=lift: the FULL production load_word -- word-form
    decode + the tensor-key GGSW lift driving a real external product."""
    import jax.numpy as jnp

    from fhe_ram_tpu.core import ggsw
    from fhe_ram_tpu.vm import bitdecomp, fheuint

    bytes_signed = [11, -100, 55, 0]
    vals = np.zeros((4, par.n), dtype=np.int64)
    vals[:, 0] = bytes_signed
    fetched = glwe.encrypt(par, ctx, s_ntt,
                           glwe.encode_vec(par, jnp.asarray(vals)), src)
    fn = jax.jit(lambda f, b, k: bitdecomp.load_word(par, ctx, f, b, k,
                                                     bits=32))
    t0 = time.time()
    word, prepared = jax.block_until_ready(fn(fetched, bsk, ekp))
    print(f"load_word wall {time.time()-t0:.0f}s (incl. compile)",
          flush=True)
    us = [x & 0xFF for x in bytes_signed]
    want = sum(u << (8 * i) for i, u in enumerate(us))
    got = fheuint.decrypt_word(par, ctx, s_ntt, word, 32)
    assert got == want, (hex(got), hex(want))
    print(f"word decode OK: {hex(got)}", flush=True)
    m = 3
    mv = np.zeros(par.n, dtype=np.int64)
    mv[0] = m
    ct_m = glwe.encrypt(par, ctx, s_ntt,
                        glwe.encode_vec(par, jnp.asarray(mv)), src)
    sel = jax.jit(lambda c, p: ggsw.external_product(par, ctx, c, p))
    for j in (0, 7, 13, 31):
        b = (want >> j) & 1
        out = sel(ct_m, prepared[:, j])
        ph = glwe.phase(par, ctx, s_ntt, out)
        val, noise = glwe.decode_coeff0(par, np.asarray(ph), b * m)
        assert int(val) == b * m, (j, val, b * m)
        print(f"lift bit {j}: select {val} == {b*m} noise {noise:.1f} OK",
              flush=True)
    print("LOAD GATE GREEN (word + GGSW lift at the production ring)",
          flush=True)


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    atk = ekp.atk_glwe

    t0 = time.time()
    bsk = bitdecomp.bootstrap_key_fast(par, ctx, sk, s_ntt, src,
                                       limbs=BSK_LIMBS)
    bsk = jax.block_until_ready(bsk)
    gib = bsk.size * 4 / 2**30
    print(f"bsk keygen {time.time()-t0:.0f}s, coefficient form "
          f"flat {bsk.shape} = {gib:.2f} GiB", flush=True)

    if os.environ.get("FHERAM_BITPROBE") == "lift":
        return lift_gate(ctx, src, s_ntt, ekp, bsk)

    def enc_byte(x):
        vals = np.zeros(par.n, dtype=np.int64)
        vals[0] = x
        return glwe.encrypt(par, ctx, s_ntt,
                            glwe.encode_vec(par, jnp.asarray(vals)), src)

    # decode gate.  bsk/atk are jit ARGUMENTS: closed-over device
    # arrays lower as HLO constants and a 4.5 GiB constant kills the
    # remote compiler (CLAUDE.md measurement landmines).
    fn = jax.jit(lambda ct, bsk_, atk_: bitdecomp.byte_to_bits(
        par, ctx, ct, bsk_, atk_, P_BITS, chunk=CHUNK))
    t0 = time.time()
    for x in (-128, -77, 0, 113):
        bits = np.asarray(jax.block_until_ready(fn(enc_byte(x), bsk, atk)))
        u = x & ((1 << P_BITS) - 1)
        got, noises = [], []
        for k in range(P_BITS):
            ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(bits[k]))
            val, noise = glwe.decode_coeff0(par, np.asarray(ph),
                                            (u >> k) & 1)
            got.append(int(val))
            noises.append(round(float(noise), 1))
        want = [(u >> k) & 1 for k in range(P_BITS)]
        status = "OK" if got == want else "FAIL"
        print(f"x={x:4d} bits={got} want={want} noise={noises} {status}",
              flush=True)
        assert got == want, x
    print(f"decode gate green ({time.time()-t0:.0f}s incl. compile)",
          flush=True)

    # scan-slope latency (k chained decompositions, each consuming the
    # previous output's bit 0 ct as a fresh "byte" -- data-dependent so
    # XLA cannot hoist)
    def k_fn(kk):
        def g(ct, bsk_, atk_):
            def body(c, _):
                bits = bitdecomp.byte_to_bits(par, ctx, c, bsk_, atk_,
                                              P_BITS, chunk=CHUNK)
                return bits[0], ()
            c, _ = jax.lax.scan(body, ct, None, length=kk)
            return c.ravel()[0]
        return jax.jit(g)

    ct0 = enc_byte(42)
    f1, f2 = k_fn(1), k_fn(3)
    t0 = time.time()
    np.asarray(f1(ct0, bsk, atk)); np.asarray(f2(ct0, bsk, atk))
    print(f"slope compiles {time.time()-t0:.0f}s", flush=True)

    def best(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f(ct0, bsk, atk))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (best(f2) - best(f1)) / 2 * 1000
    print(f"byte -> 8 bits: {ms:.1f} ms "
          f"(N=4096, {2*par.n} CMux steps, chunk={CHUNK}, "
          f"bsk Lg={BSK_LIMBS} in-chain NTT)", flush=True)

    # word-level: all 4 bytes share the chain (K = 16 accumulators)
    from fhe_ram_tpu.vm.bitdecomp import bytes_to_bits

    def k_word(kk):
        def g(cts, bsk_, atk_):
            def body(c, _):
                bits = bytes_to_bits(par, ctx, c, bsk_, atk_, P_BITS,
                                     chunk=CHUNK)
                return bits[:, 0], ()
            c, _ = jax.lax.scan(body, cts, None, length=kk)
            return c.ravel()[0]
        return jax.jit(g)

    word0 = jnp.stack([enc_byte(x) for x in (11, -100, 55, 0)])
    g1, g2 = k_word(1), k_word(2)
    t0 = time.time()
    np.asarray(g1(word0, bsk, atk)); np.asarray(g2(word0, bsk, atk))
    print(f"word compiles {time.time()-t0:.0f}s", flush=True)

    def bestw(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f(word0, bsk, atk))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    msw = (bestw(g2) - bestw(g1)) / 1 * 1000
    print(f"word (4 bytes) -> 32 bits: {msw:.1f} ms "
          f"(K=16 accumulators share each chain)", flush=True)


if __name__ == "__main__":
    main()
