"""Device profiling helpers (the TPU-native upgrade of the reference's
wall-clock-only `TicToc`, SURVEY.md §5.1): jax.profiler traces viewable in
TensorBoard/Perfetto, plus an edges/s throughput report for aggregation
kernels."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Iterable, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/bsms-trace"):
    """`with device_trace(): ...` writes an xplane trace for TensorBoard's
    profile plugin / Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput(
    fn: Callable,
    args: Iterable,
    edges: Optional[int] = None,
    steps: int = 50,
    warmup: int = 3,
) -> dict:
    """Pipelined sustained throughput: issue `steps` dispatches, sync once.
    Returns ms/step (+ edges/s when `edges` given)."""
    from bsms_gnn_tpu.utils.timing import device_sync

    args = tuple(args)
    for _ in range(warmup):
        device_sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    device_sync(out)
    dt = (time.perf_counter() - t0) / steps
    out = {"ms_per_step": dt * 1e3}
    if edges is not None:
        out["edges_per_s"] = edges / dt
    return out
