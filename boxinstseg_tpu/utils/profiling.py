"""Profiling helpers (reference: mmdet/utils/profiling.py profile_time with
CUDA events + MemoryProfilerHook). TPU equivalents: wall-clock context
with device sync, and jax.profiler trace capture."""
from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def profile_time(name: str, logger=None, sync=True):
    """Wall-clock a block; blocks on outstanding device work first/last so
    the timing covers the device compute launched inside."""
    import jax
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - t0
    msg = f'{name}: {dt * 1000:.2f} ms'
    if logger is not None:
        logger.info(msg)
    else:
        print(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
