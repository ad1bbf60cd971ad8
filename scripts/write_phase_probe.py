"""Scan-slope attribution of the write path's phases at 2^18
(rpw is ~a read; this probes write_impl's pieces).

Usage: FHERAM_NTT=pallas python scripts/write_phase_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import (
    PARAMS_README_2_18, PARAMS_2_18_WIDE, PARAMS_2_18_READOPT,
    PARAMS_2_18_TURBO_READOPT)

par = {"2_18w": PARAMS_2_18_WIDE, "2_18r": PARAMS_2_18_READOPT,
       "2_18tr": PARAMS_2_18_TURBO_READOPT}.get(
    os.environ.get("FHERAM_CONFIG", ""), PARAMS_README_2_18)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.ops import limb as limb_ops
from fhe_ram_tpu.core import glwe, keys, keyswitch, rng
from fhe_ram_tpu.ram import address as address_mod
from fhe_ram_tpu.ram import ram as ram_mod


def slope(name, fn, arg, k=8):
    """fn must map arg -> same-shaped arg (chained inside a scan)."""
    def k_fn(kk):
        def g(a):
            def body(a, _):
                return fn(a), ()
            a, _ = jax.lax.scan(body, a, None, length=kk)
            return jax.tree.leaves(a)[0].ravel()[0]
        return jax.jit(g)

    f1, fk = k_fn(1), k_fn(k)
    t0 = time.time()
    np.asarray(f1(arg)); np.asarray(fk(arg))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (best(fk) - best(f1)) / (k - 1) * 1000
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    rnd = np.random.default_rng(5)
    idx = int(rnd.integers(0, par.max_addr))
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    W, C, L, n = par.word_size, par.rank + 1, par.limbs_ct, par.n
    atk = ekp.atk_glwe

    ct1 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, C, L, n)), jnp.int32)

    # 1. inverse-coordinate derivation (both coords)
    def inv_coords(x):
        i1 = ram_mod._invert_coordinate(par, ctx, addr.coordinates[1], ekp)
        i0 = ram_mod._invert_coordinate(par, ctx, addr.coordinates[0], ekp)
        return x + i1[0, 0, 0, 0, 0, 0, 0] + i0[0, 0, 0, 0, 0, 0, 0]

    slope("invert both coordinates", inv_coords, jnp.zeros((), jnp.int32))

    inv1 = jax.jit(lambda: ram_mod._invert_coordinate(
        par, ctx, addr.coordinates[1], ekp))()
    inv1 = jax.block_until_ready(inv1)

    # 2. delta coordinate product (W rows x 4 digits)
    slope("delta coord product (W rows)",
          lambda x: address_mod.coordinate_product(par, ctx, x, inv1), ct1)

    # 3. split-tree slot extraction, Rc=64 (bounded_support like the
    # production write path; the plaintext-support precondition is a
    # semantic guarantee, irrelevant for timing random operands)
    def extract(x):
        t = keyswitch.extract_slots(par, ctx, x, 64, atk,
                                    bounded_support=True)
        return limb_ops.normalize(x + t[:, 0])

    slope("extract_slots Rc=64", extract, ct1)

    # 4. root trace (W rows)
    slope("trace W rows",
          lambda x: keyswitch.trace(par, ctx, x, atk), ct1)

    # 5. final base-level product (W x 64 rows x 4 digits)
    ct2 = jnp.asarray(
        rnd.integers(-(1 << 16), 1 << 16, size=(W, 64, C, L, n)), jnp.int32)
    slope("base-level product (W x 64 rows)",
          lambda x: ram_mod._chunked_product(par, ctx, x, inv1), ct2, k=4)


if __name__ == "__main__":
    main()
