"""Scaling-efficiency harness (BASELINE.json config 5): batched encrypted
reads with the address batch sharded over the mesh 'dp' axis (RAM + keys
replicated), measuring ops/s at 1..N devices.

On real multi-chip hardware this measures ICI scaling efficiency
(target >= 80%); on the virtual CPU mesh (default test environment) it
validates the sharded program end-to-end and reports the (meaningless
for efficiency, meaningful for correctness) timings.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/scaling_bench.py --devices 1 2 4 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=2,
                    help="addresses per device")
    ap.add_argument("--config", default="test_small")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fhe_ram_tpu.params import (PARAMS_TEST_SMALL, PARAMS_README_2_18,
                                    PARAMS_CODE_2_14)
    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.core import glwe, keys, rng
    from fhe_ram_tpu.ram import address as address_mod
    from fhe_ram_tpu.ram import ram as ram_mod
    from fhe_ram_tpu.parallel import mesh as mesh_mod

    par = {"test_small": PARAMS_TEST_SMALL, "2_18": PARAMS_README_2_18,
           "2_14": PARAMS_CODE_2_14}[args.config]

    ctx = get_ntt_context(par.n, par.primes)
    src = rng.Source(0)
    sk = rng.ternary_secret(src.split(), par.rank, par.n, par.xs_density)
    s_ntt = glwe.secret_prepare(ctx, sk)
    ekp = keys.prepare(par, keys.keygen(par, sk, src))
    rnd = np.random.default_rng(5)
    data = rnd.integers(0, 256, size=par.max_addr * par.word_size).astype(np.uint8)
    ram_ct = ram_mod.encrypt_ram(par, ctx, s_ntt, data, src)

    base_rate = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"{nd} devices unavailable, skipping")
            continue
        B = nd * args.per_device
        idxs = [int(rnd.integers(0, par.max_addr)) for _ in range(B)]
        aps = [address_mod.prepare(ctx, address_mod.encrypt(par, ctx, s_ntt, i, src))
               for i in idxs]
        coords = mesh_mod.stack_addresses(aps)
        m = mesh_mod.make_mesh(nd, rows=1)
        fn = mesh_mod.batched_read_fn(par, m)
        data_sh = mesh_mod.shard_data_rows(m, ram_ct)
        coords_sh = mesh_mod.shard_addr_batch(m, coords)
        atk_sh = jax.device_put(ekp.atk_glwe, mesh_mod.replicated(m))

        out = np.asarray(fn(data_sh, coords_sh, atk_sh))  # compile + run
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(data_sh, coords_sh, atk_sh))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        rate = B / t
        if base_rate is None:
            base_rate = rate / nd
        eff = rate / (base_rate * nd) * 100
        print(f"devices={nd} batch={B}: {t*1000:.0f} ms, {rate:.2f} reads/s, "
              f"efficiency={eff:.0f}%", flush=True)

        # correctness spot check
        want = glwe.cast_u8_signed(int(data[idxs[0] * par.word_size]), par.k_pt)
        ph = glwe.phase(par, ctx, s_ntt, jnp.asarray(out[0, 0]))
        val, _ = glwe.decode_coeff0(par, np.asarray(ph), want)
        assert int(val) == want, "sharded read incorrect"
    print("scaling harness ok")


if __name__ == "__main__":
    main()
