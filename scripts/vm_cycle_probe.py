"""Scan-slope probe of the FULL encrypted instruction cycle
(vm/cycle.vm_cycle) at the production ring: N=4096, u32 words, 20-op
RV32I enum, 2^18 READOPT RAM -- k chained cycles (each cycle's RAM
feeds the next) inside one jit, one scalar fetch.

This is the headline VM number: ms per encrypted instruction
(ALU 20-op eval + select_rd + select_store + pointer->address +
RAM rpw/write at the pointer).

Usage: FHERAM_NTT=pallas python scripts/vm_cycle_probe.py [--k 3]
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

from fhe_ram_tpu.params import PARAMS_2_18_READOPT as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.vm import arithmetic, cycle, fheuint
from fhe_ram_tpu.ram import ram as ram_mod

B32 = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()
    k = args.k

    print("device:", jax.devices()[0], flush=True)
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

    a, b, imm = 0xB4C0FFEE, 0x2D17A3E5, 0x7A5
    rs1p = fheuint.encrypt_prepared(par, ctx, s_ntt, a, src, B32)
    rs2p = fheuint.encrypt_prepared(par, ctx, s_ntt, b, src, B32)
    immp = fheuint.encrypt_prepared(par, ctx, s_ntt, imm, src, B32)
    ops = arithmetic.RVI32_OPS
    op_id = ops.index("add")
    idp = fheuint.encrypt_prepared(par, ctx, s_ntt, op_id, src, B32)
    x_store, y_loaded = 0x12345678, 0x9ABCDEF0
    xw = fheuint.encrypt_word(par, ctx, s_ntt, x_store, src, B32)
    yw = fheuint.encrypt_word(par, ctx, s_ntt, y_loaded, src, B32)
    off, sop = 1, 1
    offp = fheuint.encrypt_prepared(par, ctx, s_ntt, off, src, B32)
    sopp = fheuint.encrypt_prepared(par, ctx, s_ntt, sop, src, B32)
    ptr = 123457
    ptrp = fheuint.encrypt_prepared(
        par, ctx, s_ntt, ptr, src, bits=(par.max_addr - 1).bit_length(),
        dnum=par.dnum_ggsw, limbs=par.limbs_evk_ggsw)
    print("setup done", flush=True)

    operands = (rs1p, rs2p, immp, idp, xw, yw, offp, sopp, ptrp)

    # one decode-checked cycle first (correctness gate).  Keys passed
    # as a jit ARGUMENT: closed-over key pytrees (~200 MB) lower as HLO
    # constants and stall/413 the remote compile service.
    t0 = time.time()
    fn1 = jax.jit(lambda ek, d, o: cycle.vm_cycle(
        par, ctx, ek, *o, d, ops=ops, bits=B32))
    rd, fetched, data1 = fn1(ekp, ram_ct, operands)
    rd = np.asarray(rd)
    print(f"single cycle compile+run {time.time()-t0:.0f}s", flush=True)
    got_rd = fheuint.decrypt_word(par, ctx, s_ntt, jnp.asarray(rd), B32)
    assert got_rd == (a + b) & 0xFFFFFFFF, hex(got_rd)
    merged = bytearray(y_loaded.to_bytes(4, "little"))
    merged[off] = x_store.to_bytes(4, "little")[0]
    ap_ = address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, ptr,
                                                       src))
    server = ram_mod.FheRam(par, ekp)
    out = np.asarray(server.read(server.init_state(data1), ap_))
    for i in range(par.word_size):
        want = glwe.cast_u8_signed(int(merged[i]), par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(out[i]))
        val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want, (i, val, want)
    print("CYCLE CORRECT (rd + store read-back)", flush=True)

    # scan-slope: k chained cycles; operands threaded through the
    # barrier with the carry so XLA cannot hoist the ALU/store/convert
    def chain(kk):
        def wrapped(ek, d0, operands):
            def body(carry, _):
                ob = jax.lax.optimization_barrier((carry,) + operands)
                rd_, fetched_, d2 = cycle.vm_cycle(
                    par, ctx, ek, *ob[1:], ob[0], ops=ops, bits=B32)
                return d2, jnp.sum(rd_[..., 0, 0]) + jnp.sum(
                    fetched_[..., 0, 0, 0])
            d_end, outs = jax.lax.scan(body, d0, None, length=kk)
            return jnp.sum(outs) + d_end[0, 0, 0, 0, 0]
        return jax.jit(wrapped)

    c1, ck = chain(1), chain(k)
    t0 = time.time()
    np.asarray(c1(ekp, ram_ct, operands)); np.asarray(ck(ekp, ram_ct, operands))
    print(f"chain compiles {time.time()-t0:.0f}s", flush=True)

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(ekp, ram_ct, operands))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(ck) - t(c1)) / (k - 1) * 1000.0
    print(f"vm instruction cycle: {ms:.1f} ms/instruction "
          f"(N=4096, u32, 20-op enum, 2^18 READOPT RAM)", flush=True)


if __name__ == "__main__":
    main()
