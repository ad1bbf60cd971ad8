"""Custom Pallas ICI collective: ring all-gather via async remote
copies (the SNIPPETS.md §1 / SURVEY.md §5 pattern, from the JAX
distributed-Pallas guide).

Used by the row-sharded pack (parallel/mesh.py): after the local
dilated pack trees, each rows-shard holds ONE GLWE root and the shards
exchange all roots before the replicated tail merges.  By default that
exchange is jax.lax.all_gather (XLA places the collective); with
FHERAM_RING_AG=1 it runs this hand-written ring instead -- n-1 hops of
`pltpu.make_async_remote_copy` around the 'rows' axis, each hop
forwarding the chunk received the hop before.

Why hand-write it: XLA's all-gather is a black box placed at its own
discretion; the explicit ring gives (a) deterministic neighbor-only
ICI traffic (no tree doublings through shared links), and (b) a place
to overlap communication with the tail-merge compute later (start the
hop-h copy, run the merges that only need chunks < h, then wait --
the merge kernels would consume roots in ring-arrival order).  On one
chip this is unmeasurable; correctness is pinned on the virtual CPU
mesh via the TPU interpret mode (pltpu.InterpretParams emulates remote
DMAs; tests/test_collective.py checks bit-exactness against
lax.all_gather).
"""

from __future__ import annotations

import os
from functools import partial

import jax
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FHERAM_RING_AG: 0 = XLA all_gather (default), 1 = Pallas ring
# all-gather, 2 = merge-interleaved exchange (the overlap realized:
# parallel/mesh._merge_exchange_tail consumes each arriving chunk
# IMMEDIATELY in its tail merge -- recursive doubling, log2(n) partner
# exchanges of one GLWE each instead of the ring's n-1 hops followed by
# the whole tail; see exchange()).
RING_AG_MODE = os.environ.get("FHERAM_RING_AG", "0")
USE_RING_AG = RING_AG_MODE == "1"


def _ag_kernel(input_ref, output_ref, local_sem, send_sem, recv_sems, *,
               num_devices: int, axis_name: str):
    step = pl.program_id(0)
    my_id = lax.axis_index(axis_name)
    right = lax.rem(my_id + 1, num_devices)

    # hop 0: place the local chunk into our own slot
    @pl.when(step == 0)
    def _():
        local = pltpu.make_async_copy(
            src_ref=input_ref, dst_ref=output_ref.at[my_id], sem=local_sem)
        local.start()
        local.wait()

    # hop h: forward the chunk that arrived at hop h-1 (our own at h=0)
    # to the right neighbor, into the same slot index there
    slot = lax.rem(my_id - step + num_devices, num_devices)
    copy = pltpu.make_async_remote_copy(
        src_ref=output_ref.at[slot],
        dst_ref=output_ref.at[slot],
        send_sem=send_sem,
        recv_sem=recv_sems.at[step],
        # dict form: names the ring axis, so the collective composes
        # with multi-axis meshes (dp x rows) -- other axes keep our
        # own coordinates
        device_id={axis_name: right},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    copy.start()
    copy.wait()


def ring_all_gather(x, axis_name: str, num_devices: int,
                    interpret: bool = False, collective_id: int = 0):
    """All-gather x (one chunk per shard of `axis_name`) into
    [num_devices, *x.shape], ordered by device index -- a drop-in for
    jax.lax.all_gather(x, axis_name) on a ring.  Must be called inside
    shard_map with `axis_name` bound.

    collective_id must be UNIQUE among Pallas collectives in the same
    compiled program: two kernels sharing an id alias barrier
    semaphores and can deadlock or corrupt.  The default 0 is correct
    for the single pack-root exchange; a second collective (e.g. a
    per-chunk overlapped tail) must pass its own id.

    interpret=True uses the TPU interpret mode (CPU emulation of the
    remote DMAs) so the ring is testable on the virtual device mesh."""
    out_shape = jax.ShapeDtypeStruct((num_devices,) + x.shape, x.dtype)
    grid = (num_devices - 1,) if num_devices > 1 else (1,)
    kernel = partial(_ag_kernel, num_devices=num_devices,
                     axis_name=axis_name)
    if num_devices == 1:
        return x[None]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,                       # local copy
            pltpu.SemaphoreType.DMA,                       # send
            pltpu.SemaphoreType.DMA((num_devices - 1,)),   # per-hop recv
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(x)


def _exchange_kernel(input_ref, output_ref, send_sem, recv_sem, *,
                     stride: int, axis_name: str):
    my_id = lax.axis_index(axis_name)
    partner = my_id ^ stride
    copy = pltpu.make_async_remote_copy(
        src_ref=input_ref,
        dst_ref=output_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id={axis_name: partner},
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    copy.start()
    copy.wait()


def exchange(x, axis_name: str, stride: int, num_devices: int,
             collective_id: int = 0, interpret: bool | None = None):
    """Bidirectional partner exchange: every shard sends x to shard
    (my_id XOR stride) along `axis_name` and returns the partner's x --
    the communication primitive of the merge-interleaved pack tail
    (FHERAM_RING_AG=2).  XOR partners form an involution, so one
    async remote copy each way suffices; the caller merges the returned
    chunk immediately (communication consumed in arrival order by
    construction).

    collective_id must be unique per exchange ROUND in the same program
    (see ring_all_gather).  Falls back to lax.ppermute under
    multi-process interpret emulation (remote DMAs cannot cross process
    boundaries off-TPU)."""
    assert stride & (stride - 1) == 0 and 0 < stride < num_devices
    if interpret is None:
        interpret = interpret_default()
    if interpret and jax.process_count() > 1:
        perm = [(i, i ^ stride) for i in range(num_devices)]
        return lax.ppermute(x, axis_name, perm)
    kernel = partial(_exchange_kernel, stride=stride, axis_name=axis_name)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,   # send
            pltpu.SemaphoreType.DMA,   # recv
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(x)


def interpret_default() -> bool:
    """Ring kernels need the interpret emulation off-TPU (CPU test
    meshes); on real TPUs they compile natively."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def all_gather(x, axis_name: str, num_devices: int,
               interpret: bool | None = None):
    """The pack-root exchange: XLA's all_gather by default, the Pallas
    ring when FHERAM_RING_AG=1 (see module docstring).

    Multi-process limitation: the CPU interpret emulation of remote
    DMAs cannot cross process boundaries, so under multi-HOST CPU
    emulation (jax.process_count() > 1) the ring falls back to
    lax.all_gather even when requested.  On real multi-host TPUs the
    ring compiles natively (no interpret) and is not affected."""
    if USE_RING_AG and num_devices > 1:
        if interpret is None:
            interpret = interpret_default()
        if interpret and jax.process_count() > 1:
            return lax.all_gather(x, axis_name)
        return ring_all_gather(x, axis_name, num_devices,
                               interpret=interpret)
    return lax.all_gather(x, axis_name)
