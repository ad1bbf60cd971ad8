"""Scan-slope probe of read_prepare_write ALONE at 2_18r (the write
path's other half; write pieces are covered by write_phase_probe).

With the exact-data-carry restructure rpw returns the data unchanged,
so a naive chain is loop-invariant; each iteration uses rotated
coordinates (iteration-indexed roll of the digit axis operand -- same
shapes, distinct values).

Usage: FHERAM_NTT=pallas python scripts/rpw_probe.py [--k 4]
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
from fhe_ram_tpu.ram import address as address_mod, ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
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
    # k distinct addresses
    aps = [address_mod.prepare(ctx, address_mod.encrypt(
        par, ctx, s_ntt, int(rnd.integers(0, par.max_addr)), src))
        for _ in range(k)]
    coords_k = tuple(
        jnp.stack([a.coordinates[i] for a in aps], axis=0)
        for i in range(len(aps[0].coordinates)))
    atk = ekp.atk_glwe

    def chain(kk):
        def f(d, ck, a):
            def body(acc, cs):
                out, d2, tree = ram_mod.rpw_impl(par, ctx, d, cs, a)
                s = jnp.sum(out[:, :, 0, 0])
                for t in tree:
                    s = s + jnp.sum(t[..., 0, 0, 0])
                return acc + s, None
            cs_k = jax.tree.map(lambda c: c[:kk], ck)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), cs_k)
            return acc
        return jax.jit(f)

    c1, ck_ = chain(1), chain(k)
    t0 = time.time()
    np.asarray(c1(ram_ct, coords_k, atk)); np.asarray(ck_(ram_ct, coords_k, atk))
    print(f"compiles {time.time()-t0:.0f}s", flush=True)

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(ram_ct, coords_k, atk))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(ck_) - t(c1)) / (k - 1) * 1000.0
    print(f"rpw alone: {ms:.2f} ms (2_18r)", flush=True)


if __name__ == "__main__":
    main()
