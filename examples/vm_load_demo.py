"""Encrypted VM LOAD demo: the dataflow the reference cannot express.

Pipeline (every value ciphertext; the server learns nothing):

    encrypt RAM  ->  encrypted READ at an encrypted address
                 ->  homomorphic BIT DECOMPOSITION of the fetched
                     bytes (vm/bitdecomp.py: sign bootstrapping)
                 ->  the loaded word as bit-sliced FheUint + prepared
                     GGSW bits
                 ->  an ALU op (ADD) consuming the LOADED word

The reference's conversion.rs goes FheUint -> Address only; going from
RAM values back to FheUint bits is bootstrapping-class and is new in
this framework (vm/bitdecomp.py module docstring prices it).

Runs on CPU at a toy ring in ~2-4 minutes:

    JAX_PLATFORMS=cpu python examples/vm_load_demo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("FHERAM_NTT") != "pallas":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp

from fhe_ram_tpu.params import Params
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, rng
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod
from fhe_ram_tpu.vm import arithmetic, bitdecomp, fheuint

# toy ring: N=64, 4-bit bytes, 2-byte words -> 8-bit loaded values
PAR = Params(log_n=6, k_pt=4, decomp_n=(3, 3), word_size=2,
             max_addr=1 << 8)
P_BITS = 4
BITS = 8


def main():
    t0 = time.time()
    ctx = get_ntt_context(PAR.n, PAR.primes)
    src = rng.Source(7)
    sk = rng.ternary_secret(src.split(), PAR.rank, PAR.n, PAR.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(PAR, keys.keygen(PAR, sk, src))
    bsk = bitdecomp.bootstrap_key_fast(PAR, ctx, sk, s_ntt, src,
                                       limbs=3, chunk=64)
    print(f"[{time.time()-t0:5.1f}s] keys + bootstrapping key ready")

    # RAM whose word at idx holds the 4-bit-signed bytes of value 0x5A
    rnd = np.random.default_rng(3)
    data = rnd.integers(0, 16, size=PAR.max_addr * PAR.word_size).astype(
        np.uint8)
    idx = 42
    # bytes stored SIGNED at p=4 bits: value v stored as v - 16 if v >= 8
    data[idx * 2], data[idx * 2 + 1] = 0xA, 0x5   # word = 0x5A
    ram_ct = ram_mod.encrypt_ram(PAR, ctx, s_ntt, data, src)
    server = ram_mod.FheRam(PAR, ekp)
    print(f"[{time.time()-t0:5.1f}s] RAM encrypted "
          f"({PAR.max_addr} x {PAR.word_size} bytes)")

    # encrypted read at an encrypted address
    ap = address_mod.prepare(ctx, address_mod.encrypt(PAR, ctx, s_ntt,
                                                      idx, src))
    fetched = server.read(server.init_state(ram_ct), ap)
    print(f"[{time.time()-t0:5.1f}s] encrypted read done")

    # the LOAD: byte values -> FheUint word + prepared GGSW bits
    # (bytes_to_bits returns the UNSIGNED byte's bits, so the
    # assembled word is the unsigned value)
    word, prepared = bitdecomp.load_word(PAR, ctx, fetched, bsk, ekp,
                                         bits=BITS)
    got = fheuint.decrypt_word(PAR, ctx, s_ntt, word, BITS)
    print(f"[{time.time()-t0:5.1f}s] LOAD: decrypt_word = {hex(got)} "
          f"(expected 0x5a)")
    assert got == 0x5A

    # feed the LOADED word into the ALU: loaded + 0x21
    rhs = fheuint.encrypt_prepared(PAR, ctx, s_ntt, 0x21, src, BITS)
    words = arithmetic._dp_group(PAR, ctx, ("add",), prepared, rhs, rhs,
                                 BITS)
    s = fheuint.decrypt_word(PAR, ctx, s_ntt, words["add"], BITS)
    print(f"[{time.time()-t0:5.1f}s] ALU on the loaded word: "
          f"0x5a + 0x21 = {hex(s)}")
    assert s == 0x7B
    print("VM LOAD DEMO OK")


if __name__ == "__main__":
    main()
