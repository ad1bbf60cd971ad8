"""Phantom-VM smoke at the production ring (N=4096, u32 words) on TPU:
a few ALU ops + select_rd + store-select + pointer->address conversion
driving a real encrypted read."""

import contextlib
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_CODE_2_14 as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import fheuint, circuits, arithmetic, store, conversion
from fhe_ram_tpu.ram import ram as ram_mod

BITS = 32


def main():
    cpu = jax.devices("cpu")[0]
    ctx_mgr = (jax.default_device(cpu)
               if os.environ.get("FHERAM_NTT") != "pallas"
               else contextlib.nullcontext())
    with ctx_mgr:
        ctx = get_ntt_context(par.n, par.primes)
        src = rng.Source(0)
        sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
        s_ntt = glwe.secret_prepare(ctx, sk)
        ekp = keys.prepare(par, keys.keygen(par, sk, src))

        a, b = 0xDEADBEEF, 0x12345678
        t0 = time.time()
        rs1 = fheuint.encrypt_prepared(par, ctx, s_ntt, a, src, BITS)
        rs2 = fheuint.encrypt_prepared(par, ctx, s_ntt, b, src, BITS)
        print(f"encrypt words: {time.time()-t0:.0f}s", flush=True)

        for op, want in [("add", (a + b) & 0xFFFFFFFF), ("xor", a ^ b),
                         ("sltu", int(a < b))]:
            t0 = time.time()
            out = arithmetic.eval_op(par, ctx, op, rs1, rs2, rs2,
                                     ekp.atk_glwe, BITS)
            got = fheuint.decrypt_word(par, ctx, s_ntt, out, BITS)
            print(f"{op}: {time.time()-t0:.0f}s got 0x{got:08X} "
                  f"{'OK' if got == want else f'WANT 0x{want:08X}'}", flush=True)
            assert got == want

        # store-select (one combo)
        xw = fheuint.encrypt_word(par, ctx, s_ntt, a, src, BITS)
        yw = fheuint.encrypt_word(par, ctx, s_ntt, b, src, BITS)
        offp = fheuint.encrypt_prepared(par, ctx, s_ntt, 1, src, BITS)
        opp = fheuint.encrypt_prepared(par, ctx, s_ntt, 1, src, BITS)  # SB
        t0 = time.time()
        sel = store.select_store(par, ctx, xw, yw, offp, opp, ekp.atk_glwe, BITS)
        got = fheuint.decrypt_word(par, ctx, s_ntt, sel, BITS)
        by = bytearray(b.to_bytes(4, "little"))
        by[1] = a & 0xFF
        want = int.from_bytes(bytes(by), "little")
        print(f"select_store(off=1,SB): {time.time()-t0:.0f}s got 0x{got:08X} "
              f"{'OK' if got == want else f'WANT 0x{want:08X}'}", flush=True)
        assert got == want

        # encrypted pointer -> RAM read
        rnd = np.random.default_rng(4)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        server = ram_mod.FheRam(par, ekp)
        idx = 12345
        up = fheuint.encrypt_prepared(par, ctx, s_ntt, idx, src,
                                      bits=(par.max_addr - 1).bit_length(),
                                      dnum=par.dnum_ggsw,
                                      limbs=par.limbs_evk_ggsw)
        t0 = time.time()
        _, ap = conversion.fheuint_to_address(par, ctx, up)
        out = server.read(ram_ct, ap)
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (i, val, want)
        print(f"pointer->address->read: {time.time()-t0:.0f}s CORRECT", flush=True)


if __name__ == "__main__":
    main()
