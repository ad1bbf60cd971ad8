"""Pack throughput vs batch width: _pack_rows (64-leaf tree, 2_18r
shapes, random operands) scan-slope at several batch widths, to locate
the batched-read pack regression (round-4: pack batched measured
1.82 ms/read vs 1.34 single at B=64).

The merge kernel grids over nb = pairs x batch rows in _TBT-row blocks
(FHERAM_TBT, default 4); sweep it externally:

  for t in 4 8 16; do FHERAM_TBT=$t python scripts/pack_scale_probe.py; done

Usage: FHERAM_NTT=pallas python scripts/pack_scale_probe.py [--nbs 4,16,64,256]
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
from fhe_ram_tpu.ram import ram as ram_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbs", default="4,16,64,256")
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()
    k = args.k
    tr_ks = par.read_ks_trunc

    from fhe_ram_tpu.ops import ntt_pallas

    print("device:", jax.devices()[0], "TBT =", ntt_pallas._TBT, flush=True)
    rnd = np.random.default_rng(0)
    n, C = par.n, par.rank + 1
    P, R, L = par.num_primes, par.num_rows, par.limbs_ct
    atk = {
        g: jnp.asarray(
            rnd.integers(-(1 << 18), 1 << 18,
                         size=(P, L, par.rank, C, par.limbs_evk_trace, n)),
            jnp.int32)
        for g in par.trace_gal_els + tuple(
            (n >> l) + 1 for l in range(R.bit_length() - 1))
    }
    ctx = get_ntt_context(par.n, par.primes)
    from fhe_ram_tpu.ops.ntt_pallas import get_pallas_context

    get_pallas_context(par.n, tuple(par.primes))

    def measure(name, make_fn, x0):
        def chain(kk):
            def wrapped(x):
                def body(c, _):
                    y = make_fn(c)
                    return y, jnp.sum(y[(0,) * 2])

                out, sums = jax.lax.scan(body, x, None, length=kk)
                return jnp.sum(sums)

            return jax.jit(wrapped)

        def _t(f, x):
            t0 = time.perf_counter()
            np.asarray(f(x))
            return time.perf_counter() - t0

        f1, fk = chain(1), chain(k)
        t0 = time.time()
        np.asarray(f1(x0)); np.asarray(fk(x0))
        dt = time.time() - t0
        t1 = min(_t(f1, x0) for _ in range(3))
        tk = min(_t(fk, x0) for _ in range(3))
        ms = (tk - t1) / (k - 1) * 1000.0
        print(f"{name}: {ms:.2f} ms (compile {dt:.0f}s)", flush=True)
        return ms

    for nb in [int(v) for v in args.nbs.split(",")]:
        x = jnp.asarray(
            rnd.integers(-(1 << 16), 1 << 16, size=(nb, R, C, L, n)),
            jnp.int32)

        def pack_fn(v):
            return ram_mod._pack_rows(par, ctx, v, atk, trunc=tr_ks)[
                :, 0][:, None].repeat(R, 1)

        ms = measure(f"pack nb={nb} ({nb} x {R} rows)", pack_fn, x)
        print(f"  -> {ms / max(nb // 4, 1):.3f} ms per 4-subram read-equiv",
              flush=True)


if __name__ == "__main__":
    main()
