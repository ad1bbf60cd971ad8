"""Multi-chip execution: device meshes + sharded batched reads and
row-sharded RAM.

The reference is strictly single-threaded (SURVEY.md §2: no rayon/MPI/
NCCL); scaling is new, TPU-first functionality:

  * axis "dp": independent encrypted reads (the batch of addresses) --
    embarrassingly parallel, addresses sharded, RAM + keys replicated.
  * axis "rows": the RAM's GLWE-row axis (the long axis for MAX_ADDR
    up to 2^24+, SURVEY.md §5 long-context analog) -- CMux external
    products are row-local; the packing tree's first merges cross row
    shards and XLA inserts the collectives (all ICI traffic).

Shardings are expressed with jax.sharding.NamedSharding on jit
boundaries (GSPMD partitioning) rather than hand-written collectives;
a Pallas ring-reduce variant can replace the pack-merge collectives
later (SNIPPETS.md §1 pattern).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import Params
from ..ops.ntt import get_ntt_context
from ..ram import ram as ram_mod


def make_mesh(n_devices: int | None = None, rows: int = 1, devices=None) -> Mesh:
    """Mesh with axes (dp, rows).  rows divides n_devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    assert n % rows == 0
    arr = np.array(devs[:n]).reshape(n // rows, rows)
    return Mesh(arr, ("dp", "rows"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_data_rows(mesh: Mesh, data):
    """Place RAM data with the row axis sharded over the 'rows' mesh
    axis: int32[W, R, C, L, N] -> R sharded."""
    return jax.device_put(data, NamedSharding(mesh, P(None, "rows")))


def shard_addr_batch(mesh: Mesh, coords_stacked):
    """Shard a stacked address batch (tuple of [B, dig, ...] arrays...)
    over the 'dp' axis."""
    sh = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(c, sh) for c in coords_stacked)


def stack_addresses(addr_preps) -> tuple:
    """Stack prepared addresses into a batch: tuple over coordinates of
    [B, P, dig, D, C, C2, Lg, N]."""
    import jax.numpy as jnp

    n2 = len(addr_preps[0].coordinates)
    return tuple(
        jnp.stack([a.coordinates[i] for a in addr_preps], axis=0) for i in range(n2)
    )


def batched_read_fn(params: Params, mesh: Mesh):
    """Jitted batched read: addresses sharded over dp, RAM rows sharded
    over rows, output sharded over dp."""
    ctx = get_ntt_context(params.n, params.primes)
    fn = jax.vmap(partial(ram_mod.read_impl, params, ctx), in_axes=(None, 0, None))
    return jax.jit(
        fn,
        in_shardings=(
            NamedSharding(mesh, P(None, "rows")),
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P()),
        ),
        out_shardings=NamedSharding(mesh, P("dp")),
    )


def sharded_read_fn(params: Params, mesh: Mesh):
    """Jitted single read over row-sharded RAM (the 2^24-scale config:
    rows over chips, pack-tree partials reduced by XLA collectives)."""
    ctx = get_ntt_context(params.n, params.primes)
    return jax.jit(
        partial(ram_mod.read_impl, params, ctx),
        in_shardings=(
            NamedSharding(mesh, P(None, "rows")),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
        out_shardings=NamedSharding(mesh, P()),
    )
