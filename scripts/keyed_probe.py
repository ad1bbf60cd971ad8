"""Scan-slope microprobe of the keyed CMux kernel path (TPU).

The VM groups (bitwise b-phases, shift barrel levels) run ~10x over
their kernel-work estimate while the read's level-0 kernel does
~6 us/row-EP -- this probe isolates the keyed form
(ggsw.external_product_keyed / fused_external_fold_batched) at the
exact barrel shape (K=2 key groups x B=96 rows) and sweeps tbf.

Scan-slope with loop-carried operands (XLA hoists pure invariant calls
out of lax.scan, BENCH_NOTES round-2 note): the carry feeds x.

Usage: FHERAM_NTT=pallas python scripts/keyed_probe.py
"""

import os
import sys
import time

os.environ.setdefault("FHERAM_NTT", "pallas")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_README_2_18 as par
from fhe_ram_tpu.ops.ntt import get_ntt_context
from fhe_ram_tpu.core import glwe, ggsw, rng

K_REP = 8


def slope(label, fn, x0, *args):
    def chain(kk):
        def wrapped(x):
            def body(c, _):
                y = fn(c, *args)
                return y, jnp.sum(y[(0,) * (y.ndim - 1)])

            out, sums = jax.lax.scan(body, x, None, length=kk)
            return jnp.sum(sums)

        return jax.jit(wrapped)

    f1, fk = chain(1), chain(K_REP)
    np.asarray(f1(x0)); np.asarray(fk(x0))

    def t(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(fk) - t(f1)) / (K_REP - 1) * 1000.0
    print(f"{label}: {ms:.2f} ms", flush=True)


def main():
    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    n, C, L = par.n, par.rank + 1, par.limbs_ct
    rnd = np.random.default_rng(3)

    # two bit GGSWs (the barrel's K=2 key groups)
    bits = [ggsw.encrypt(par, ctx, s_ntt, jnp.zeros(n, jnp.int32), src)
            for _ in range(2)]
    keys = ggsw.prepare(ctx, jnp.stack(bits, axis=0))  # [P, K, D, C, C2, Lg, N]
    keys = jnp.moveaxis(keys, 1, 1)

    tpu = jax.devices()[0]
    keys = jax.device_put(keys, tpu)

    for B in (96, 48):
        x0 = jax.device_put(
            jnp.asarray(rnd.integers(-2**15, 2**15, size=(2, B, C, L, n)),
                        jnp.int32), tpu)

        def keyed(x, kk):
            return ggsw.external_product_keyed(par, ctx, x, kk, base=x)

        slope(f"keyed CMux K=2 B={B} (tbf=2 default)", keyed, x0, keys)

    # reference: the read level-0 kernel shape (one shared key, 256 rows)
    from fhe_ram_tpu.ram import address as address_mod

    coord = ggsw.prepare(ctx, jnp.stack([bits[0]], axis=0))[:, None]
    # [P, dig=1, D, C, C2, Lg, N]
    x0 = jax.device_put(
        jnp.asarray(rnd.integers(-2**15, 2**15, size=(4, 64, C, L, n)),
                    jnp.int32), tpu)

    def l0(x, cc):
        return address_mod.coordinate_product(par, ctx, x, cc)

    slope("read level-0 kernel (1 digit, 256 rows)", l0, x0,
          jax.device_put(coord.reshape(coord.shape[0], 1, *coord.shape[2:]), tpu))


if __name__ == "__main__":
    main()
