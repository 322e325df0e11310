"""Profiling / tracing helpers (SURVEY.md §5.1 TPU equivalents).

The reference ships wall-clock phase timers + a logger event stream; on TPU
the equivalents are (a) the JAX profiler (XProf traces viewable in
TensorBoard / Perfetto) and (b) honest per-kernel timing via synced
repetition.  The lattice's own phase timers measure dispatch by default —
set OSCILLINK_SYNC_TIMINGS=1 for blocking timings (see core/lattice.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["trace", "time_fn", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/oscillink_trace", host_profile: bool = True):
    """JAX profiler trace context: `with trace("/tmp/t"): lat.settle()` then
    view in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    repeats: int = 10,
    warmup: int = 2,
    **kwargs,
) -> dict:
    """Honest device timing: block_until_ready around each call; returns
    median/min/max milliseconds. NOTE: on tunneled runtimes each sync costs
    a fixed RPC (~27 ms measured) — subtract `sync_floor_ms` for kernel-only
    estimates, or chain applications inside one jit."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append(1000.0 * (time.perf_counter() - t0))
    ts.sort()
    return {
        "median_ms": ts[len(ts) // 2],
        "min_ms": ts[0],
        "max_ms": ts[-1],
        "repeats": repeats,
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> Optional[dict]:
    """Live/peak HBM usage for a device, when the backend exposes it."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
