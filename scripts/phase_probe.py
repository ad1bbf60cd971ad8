"""Per-phase attribution of the encrypted read at the 2^18 config on
the real TPU: times each phase (level-0 digit products, pack levels,
level-1 products, final trace) separately with the scan-slope method
(k repetitions inside one jitted lax.scan, one scalar fetch; naive
block_until_ready timing lies over the axon tunnel).

Usage: FHERAM_NTT=pallas python scripts/phase_probe.py [--k 8]
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
    PARAMS_README_2_18, PARAMS_2_18_WIDE, PARAMS_2_18_READOPT)
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, keys, keyswitch, rng
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--config", default="2_18")
    args = ap.parse_args()
    k = args.k
    global par
    par = {"2_18": PARAMS_README_2_18, "2_18w": PARAMS_2_18_WIDE,
           "2_18r": PARAMS_2_18_READOPT}[args.config]
    # read-path gadget truncation (identity (None, None) on non-READOPT
    # configs) -- matches what read_impl applies internally
    tr_ep, tr_ks = par.read_ep_trunc, par.read_ks_trunc

    tpu = jax.devices()[0]
    print("device:", tpu, flush=True)

    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    t0 = time.time()
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    print(f"keygen {time.time()-t0:.0f}s", flush=True)
    rnd = np.random.default_rng(5)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)
    idx = int(rnd.integers(0, par.max_addr))
    addr = address_mod.encrypt(par, ctx, s_ntt, idx, src)
    app = address_mod.prepare(ctx, addr)
    print("setup done", flush=True)

    ram_dev = jax.device_put(ram_ct, tpu)
    keys_dev = jax.device_put(ekp, tpu)
    coords = jax.device_put(app.coordinates, tpu)
    atk = keys_dev.atk_glwe

    def measure(name, make_fn, x0):
        """make_fn(x) -> y with y.shape == x.shape-compatible chaining;
        time k-chained applications."""

        def chain(kk):
            def wrapped(x):
                def body(c, _):
                    y = make_fn(c)
                    return y, jnp.sum(y[(0,) * (y.ndim - 1)])

                out, sums = jax.lax.scan(body, x, None, length=kk)
                return jnp.sum(sums)

            return jax.jit(wrapped)

        try:
            f1, fk = chain(1), chain(k)
            np.asarray(f1(x0)); np.asarray(fk(x0))  # compile
            t1 = min(_t(f1, x0) for _ in range(3))
            tk = min(_t(fk, x0) for _ in range(3))
            ms = (tk - t1) / (k - 1) * 1000.0
            print(f"{name}: {ms:.2f} ms", flush=True)
            return ms
        except Exception as e:  # compile OOMs etc: keep probing the rest
            print(f"{name}: SKIP ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
            return float("nan")

    def _t(f, x):
        t0 = time.perf_counter()
        np.asarray(f(x))
        return time.perf_counter() - t0

    # ---- phase 1: one level-0 digit product (full 256-row batch)
    cur0 = ram_dev  # [W, R, C, L, N]
    d0 = coords[0]

    from fhe_ram_tpu.core import ggsw as ggsw_mod

    def dig_prod(x):
        return ggsw_mod.external_product(par, ctx, x, d0[:, 0])

    measure("level0 one digit product (256 rows)", dig_prod, cur0)

    # ---- full level-0 coordinate product (4 digits)
    def coord_prod(x):
        return address_mod.coordinate_product(par, ctx, x, d0, trunc=tr_ep)

    t_l0 = measure("level0 coordinate product (4 digits)", coord_prod, cur0)

    # ---- pack 64 -> 1
    lvl0 = jax.jit(lambda x: address_mod.coordinate_product(par, ctx, x, d0, trunc=tr_ep))(ram_dev)

    def pack_fn(x):
        return ram_mod._pack_rows(par, ctx, x, atk, trunc=tr_ks)[:, 0][:, None].repeat(64, 1)

    # chain shape mismatch: pack output is [W, 1, ...]; broadcast back so
    # the scan carry keeps the input shape (timing includes the repeat --
    # subtract nothing, it's ~free relative to the pack)
    t_pack = measure("pack 64->1 (6 merge levels)", pack_fn, lvl0)

    # ---- level-1 coordinate product (2 digits, 4 rows)
    packed = jax.jit(lambda x: ram_mod._pack_rows(par, ctx, x, atk, trunc=tr_ks))(lvl0)
    d1 = coords[1]

    def l1_fn(x):
        return address_mod.coordinate_product(par, ctx, x, d1, trunc=tr_ep)

    t_l1 = measure("level1 coordinate product (2 digits, W rows)", l1_fn, packed[:, 0])

    # ---- final trace (12 keyswitches, W rows)
    sel = jax.jit(lambda x: address_mod.coordinate_product(par, ctx, x, d1, trunc=tr_ep))(packed[:, 0])

    def trace_fn(x):
        return keyswitch.trace(par, ctx, x, atk, trunc=tr_ks)

    t_tr = measure("final trace (12 steps, W rows)", trace_fn, sel)

    # ---- glue micro-ops: the XLA gathers between kernels (pack/trace)
    from fhe_ram_tpu.ops import poly

    def rot_fn(x):
        return poly.rotate(x, 32)

    measure("poly.rotate (gather) on pack level-5 shape", rot_fn, lvl0[:, :32])

    g5 = (par.n >> 5) + 1
    def auto_fn(x):
        return poly.automorphism(x, g5)

    measure("poly.automorphism (gather) on pack level-5 shape", auto_fn,
            lvl0[:, :32])

    # ---- end-to-end read for comparison
    def read_fn(x):
        return ram_mod.read_impl(par, ctx, x, coords, atk)[:, None].repeat(64, 1)

    t_e2e = measure("end-to-end read", read_fn, ram_dev)
    print(f"sum of phases: {t_l0 + t_pack + t_l1 + t_tr:.2f} ms vs e2e {t_e2e:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
