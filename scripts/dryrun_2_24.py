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
        """limit_gib=None: report-only (no fit assertion)."""
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
        if limit_gib is None:
            print(f"DRYRUN 2^24 {name}: REPORTED (no fit bound)", flush=True)
            return
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

    # sharded RMW (round 5): the WRITE path partitioned over rows=8 --
    # replicated root work + the split-tree extraction sharded by
    # residue class + row-local inverse products (parallel/mesh.py).
    from fhe_ram_tpu.core import keys as keys_mod

    coords_c = tuple(
        jax.ShapeDtypeStruct(
            (len(b.bases), par.dnum_ct, C, C, par.limbs_ggsw, n), I32)
        for b in par.base2d().rows)
    w = jax.ShapeDtypeStruct((par.word_size, C, par.limbs_ct, n), I32)
    keys_sd = keys_mod.EvaluationKeysPrepared(
        atk_glwe=atk,
        atk_ggsw={-1: jax.ShapeDtypeStruct(
            (P, par.dnum_ggsw, par.rank, C, par.limbs_evk_ggsw, n), I32)},
        tsk=jax.ShapeDtypeStruct(
            (P, par.rank, par.dnum_ggsw, C, C, par.limbs_evk_ggsw, n), I32))
    frmw = mesh_mod.sharded_rmw_fn(par, m)
    check("SHARDED RMW (rows=8)",
          frmw.lower(data, coords, coords_c, w, keys_sd), limit_gib=14)

    # batched RMW (single chip): 2^24 sits exactly at rmw_batch's
    # geometry boundary (R == N, one pack chunk).  REPORT-ONLY: the
    # composed CPU path's AOT temps (33 GiB at B=2) over-state the
    # fused-kernel footprint by design (the batched B=8 READ above
    # shows the same inflation), and at 2^24 several [B, W, R, C, L, N]
    # tensors are inherently ~B x 1.6 GiB each -- batched RMW at 2^24
    # is a sharded-RMW job (the rows=8 check above fits at 2.1 GiB),
    # not a single-chip one.  Single-chip batched RMW targets <= 2^18.
    from functools import partial

    from fhe_ram_tpu.ops.ntt import get_ntt_context
    from fhe_ram_tpu.ram import ram as ram_mod

    Brmw = 2
    ctx = get_ntt_context(par.n, par.primes)
    cp_b = tuple(jax.ShapeDtypeStruct((Brmw,) + c.shape, I32)
                 for c in coords)
    cc_b = tuple(jax.ShapeDtypeStruct((Brmw,) + c.shape, I32)
                 for c in coords_c)
    w_b = jax.ShapeDtypeStruct((Brmw,) + w.shape, I32)
    frb = jax.jit(partial(ram_mod.rmw_batch_impl, par, ctx),
                  donate_argnums=(0,))
    check(f"BATCHED RMW B={Brmw} (1 device)",
          frb.lower(data, cp_b, cc_b, w_b, keys_sd), limit_gib=None)


if __name__ == "__main__":
    main()
