"""Phantom-VM smoke at the production ring (N=4096, u32 words) on TPU,
through the jitted server loops: the full eval_ops enum + select_rd,
store-select, and pointer->address conversion driving a real encrypted
read.  Reports compile time and post-compile per-op latency separately
(scan-slope style repeats; block_until_ready lies over the tunnel, so
we force a tiny host fetch per call)."""

import contextlib
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_CODE_2_14, PARAMS_2_14_WIDE

par = (PARAMS_2_14_WIDE if os.environ.get("FHERAM_CONFIG") == "2_14w"
       else PARAMS_CODE_2_14)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.vm import fheuint, circuits, arithmetic, store, conversion
from fhe_ram_tpu.ram import ram as ram_mod

BITS = 32


def fetch(x):
    """Force completion with a tiny host fetch (tunnel-safe)."""
    return np.asarray(jax.tree.leaves(x)[0])[..., 0, 0]


def timed(label, fn, *args, repeats=3):
    t0 = time.time()
    out = fn(*args)
    fetch(out)
    t_first = time.time() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        ts.append(time.time() - t0)
    print(f"{label}: first(+compile) {t_first:.1f}s, "
          f"post-compile {min(ts)*1000:.0f}ms", flush=True)
    return out


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

        a, b, imm = 0xDEADBEEF, 0x12345678, 0x7A5
        t0 = time.time()
        rs1 = fheuint.encrypt_prepared(par, ctx, s_ntt, a, src, BITS)
        rs2 = fheuint.encrypt_prepared(par, ctx, s_ntt, b, src, BITS)
        immp = fheuint.encrypt_prepared(par, ctx, s_ntt, imm, src, BITS)
        print(f"encrypt words: {time.time()-t0:.0f}s", flush=True)

        # full enum, one jitted graph
        ops = arithmetic.RVI32_OPS
        eval_fn = arithmetic.eval_ops_jit(par, ops, BITS)
        packed = timed("eval_ops(all 20, jit)", eval_fn, rs1, rs2, immp,
                       ekp.atk_glwe)

        sel_fn = arithmetic.select_rd_jit(par, len(ops), BITS)
        for op_id, op, want in [(10, "add", (a + b) & 0xFFFFFFFF),
                                (15, "xor", a ^ b),
                                (14, "sltu", int(a < b))]:
            idp = fheuint.encrypt_prepared(par, ctx, s_ntt, op_id, src, BITS)
            sel = timed(f"select_rd({op})", sel_fn, packed, idp, ekp.atk_glwe)
            got = fheuint.decrypt_word(par, ctx, s_ntt, sel, BITS)
            print(f"  {op}: got 0x{got:08X} "
                  f"{'OK' if got == want else f'WANT 0x{want:08X}'}", flush=True)
            assert got == want

        # store-select (one combo), jitted
        xw = fheuint.encrypt_word(par, ctx, s_ntt, a, src, BITS)
        yw = fheuint.encrypt_word(par, ctx, s_ntt, b, src, BITS)
        offp = fheuint.encrypt_prepared(par, ctx, s_ntt, 1, src, BITS)
        opp = fheuint.encrypt_prepared(par, ctx, s_ntt, 1, src, BITS)  # SB
        st_fn = store.select_store_jit(par, BITS)
        sel = timed("select_store(off=1,SB)", st_fn, xw, yw, offp, opp,
                    ekp.atk_glwe)
        got = fheuint.decrypt_word(par, ctx, s_ntt, sel, BITS)
        by = bytearray(b.to_bytes(4, "little"))
        by[1] = a & 0xFF
        want = int.from_bytes(bytes(by), "little")
        print(f"  got 0x{got:08X} "
              f"{'OK' if got == want else f'WANT 0x{want:08X}'}", flush=True)
        assert got == want

        # encrypted pointer -> RAM read, jitted conversion
        rnd = np.random.default_rng(4)
        data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
        ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
        server = ram_mod.FheRam(par, ekp)
        idx = 12345
        up = fheuint.encrypt_prepared(par, ctx, s_ntt, idx, src,
                                      bits=(par.max_addr - 1).bit_length(),
                                      dnum=par.dnum_ggsw,
                                      limbs=par.limbs_evk_ggsw)
        conv_fn = conversion.fheuint_to_address_jit(par)
        _, ap = timed("fheuint_to_address", conv_fn, up)
        t0 = time.time()
        out = server.read(server.init_state(ram_ct), ap)
        for i in range(par.word_size):
            want = glwe.cast_u8_signed(int(data[idx * par.word_size + i]), par.k_pt)
            ph = glwe.phase(par, ctx, s_ntt, out[i])
            val, noise = glwe.decode_coeff0(par, np.asarray(ph), want)
            assert int(val) == want, (i, val, want)
        print(f"pointer read: {time.time()-t0:.0f}s CORRECT", flush=True)


if __name__ == "__main__":
    main()
