"""Multi-host execution: jax.distributed initialization and hybrid
ICI x DCN meshes.

The reference is single-threaded (SURVEY.md §2); multi-host scaling is
new, TPU-first functionality (BASELINE configs 4-5: 2^24-address RAM
over a v5e-8, >= 2-host pods at >= 80% scaling efficiency).

Topology mapping:
  * "rows" (the RAM's GLWE-row axis) stays INSIDE a host slice: the
    pack-tree merges that cross row shards ride ICI.
  * "dp" (independent encrypted reads) spans hosts: address batches are
    embarrassingly parallel, so the only DCN traffic is input/output
    ciphertexts -- the right axis to put on the slow links.

Run `scripts/multihost_dryrun.py` for a multi-process CPU validation
(each process owns a slice of a global mesh; the sharded read executes
under GSPMD with cross-process collectives)."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None, **kw):
    """Initialize jax.distributed (idempotent).  On TPU pods the three
    arguments are auto-detected from the environment; on CPU/GPU
    clusters pass them explicitly (coordinator 'host:port')."""
    # do NOT touch jax.devices()/process_count() here: any backend query
    # before initialize() makes it un-initializable
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def make_multihost_mesh(rows_per_host: int | None = None) -> Mesh:
    """Global (dp, rows) mesh over all processes' devices.

    rows (fast axis, contiguous local devices -> ICI) x dp (spans
    hosts -> DCN).  rows_per_host defaults to all local devices, i.e.
    dp == num_processes."""
    devs = jax.devices()  # global, ordered by (process, local index)
    local = jax.local_device_count()
    rows = rows_per_host if rows_per_host is not None else local
    assert local % rows == 0, (local, rows)
    n = len(devs)
    # arrange [dp, rows]: consecutive local devices along rows
    arr = np.array(devs).reshape(n // rows, rows)
    return Mesh(arr, ("dp", "rows"))


def host_local_batch(mesh: Mesh, global_batch_leaves):
    """Assemble a globally-sharded address batch from per-process data.

    global_batch_leaves: pytree of np arrays holding the FULL batch
    (identical on every process -- fine for dryruns/benchmarks; real
    deployments feed per-host slices via the same API).  Returns global
    jax.Arrays sharded P('dp') over the mesh."""
    sh = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: np.asarray(x[idx]))

    return jax.tree.map(put, global_batch_leaves)


def replicated_global(mesh: Mesh, leaves):
    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: np.asarray(x[idx]))

    return jax.tree.map(put, leaves)


def shard_rows_global(mesh: Mesh, data):
    """RAM data with rows sharded over the (intra-host) 'rows' axis and
    replicated over dp: int32[W, R, C, L, N] -> P(None, 'rows').

    Rows are STRIDED over shards (mesh.row_shard_perm) so the sharded
    pack's local dilated trees see the global leaves congruent to their
    shard index (see parallel/mesh.py module docstring)."""
    from .mesh import row_shard_perm

    r = mesh.shape["rows"]
    if r > 1:
        data = np.asarray(data)[:, row_shard_perm(data.shape[1], r)]
    sh = NamedSharding(mesh, P(None, "rows"))
    return jax.make_array_from_callback(
        data.shape, sh, lambda idx: np.asarray(data[idx]))
