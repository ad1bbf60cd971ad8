"""Timing + noise telemetry (SURVEY.md §5: the reference only has
std::time::Instant around ops and per-read noise prints in its example;
here both are first-class helpers).

Timing over the axon remote tunnel cannot rely on block_until_ready --
`synced_time` forces a tiny dependent host fetch instead.  For real
kernel breakdowns use `trace_to` (jax.profiler) on a local TPU.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def synced_time(fn, *args, repeats: int = 3):
    """min wall time of fn(*args), forcing completion via a scalar fetch
    of the (first leaf of the) result."""
    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * (leaf.ndim - 1)])

    run()  # warmup/compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def noise_report(params, ctx, s_ntt, ct, want: int):
    """Telemetry for one result ciphertext: decoded value + log2 noise
    (the reference prints this per read, examples/fhe-ram.rs:108)."""
    from ..core import glwe

    ph = glwe.phase(params, ctx, s_ntt, ct)
    val, noise = glwe.decode_coeff0(params, np.asarray(ph), want)
    return {"value": int(val), "noise_log2": float(noise),
            "budget_log2": float(-(params.k_pt + 1) - noise)}
