"""Row-sharded 2^24 read at REAL geometry: AOT-compile on the 8-device
virtual CPU mesh to prove the partitioning compiles, the collectives
place, and the per-device memory fits, without executing the (CPU-
infeasible) full computation.

data at 2^24: int32[4, 4096, 2, 3, 4096] = 1.5 GiB total, ~192 MiB per
device with rows sharded 8 ways -- far under a v5e chip's HBM.  The
memory analysis printed here is XLA's own buffer accounting for the
compiled executable (argument/output/temp sizes).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/dryrun_2_24.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from fhe_ram_tpu.params import PARAMS_2_24_READOPT as par
from fhe_ram_tpu.parallel import mesh as mesh_mod


def main():
    assert len(jax.devices()) == 8
    m = mesh_mod.make_mesh(8, rows=8)  # all devices on the row axis

    I32 = jnp.int32
    n, C, P = par.n, par.rank + 1, par.num_primes
    data = jax.ShapeDtypeStruct((par.word_size, par.num_rows, C, par.limbs_ct, n), I32)
    coords = tuple(
        jax.ShapeDtypeStruct(
            (P, len(b.bases), par.dnum_ct, C, C, par.limbs_ggsw, n), I32)
        for b in par.base2d().rows
    )
    atk = {
        g: jax.ShapeDtypeStruct(
            (P, par.dnum_ct, par.rank, C, par.limbs_evk_trace, n), I32)
        for g in par.trace_gal_els
    }

    def check(name, lowered, limit_gib=12):
        print(f"[{name}] lowered ok (partitioning valid)", flush=True)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gib = 2.0 ** 30
        print(f"[{name}] compiled ok; XLA memory analysis (per device):",
              flush=True)
        print(f"  arguments: {ma.argument_size_in_bytes / gib:.2f} GiB")
        print(f"  output:    {ma.output_size_in_bytes / gib:.3f} GiB")
        print(f"  temps:     {ma.temp_size_in_bytes / gib:.2f} GiB")
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes)
        print(f"  total:     {total / gib:.2f} GiB", flush=True)
        # v5e HBM = 16 GiB; require comfortable fit
        assert total < limit_gib * gib, f"2^24 {name} would not fit a v5e chip"
        print(f"DRYRUN 2^24 {name}: OK", flush=True)

    fn = mesh_mod.sharded_read_fn(par, m)
    print(f"rows={par.num_rows} tree={par.tree_shape()} "
          f"data={np.prod(data.shape)*4/2**30:.2f} GiB total", flush=True)
    check("SHARDED READ (rows=8)", fn.lower(data, coords, atk))

    # batched sharded read (B=8) on a dp=2 x rows=4 mesh: exercises both
    # axes + the batch-gridded kernels' memory at real 2^24 geometry.
    # NOTE: this AOT compile uses the CPU butterfly COMPOSED path whose
    # transients over-state the fused-kernel path that runs on real
    # chips (the fused kernels stream blocks; the single-read check
    # above passes at 1.7 GiB because _chunked_product slices) -- the
    # bound here is a loose upper bound on the real-device footprint.
    m2 = mesh_mod.make_mesh(8, rows=4)
    B = 8
    coords_b = tuple(
        jax.ShapeDtypeStruct((B,) + c.shape, I32) for c in coords)
    fnb = mesh_mod.batched_read_fn(par, m2)
    check("BATCHED B=8 (dp=2 x rows=4)", fnb.lower(data, coords_b, atk),
          limit_gib=14)


if __name__ == "__main__":
    main()
