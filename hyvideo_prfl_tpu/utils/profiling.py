"""Profiling / tracing hooks.

Replaces the reference's ad-hoc `log_memory_usage` prints +
CUDA_LAUNCH_BLOCKING (train_prfl.py:101-107, :171; SURVEY.md 5.1) with
jax.profiler traces and device-memory introspection — without the
synchronous-launch debuggability hack (XLA doesn't need it).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax


def log_memory_usage(tag: str = "") -> dict:
    """Per-device live/peak HBM bytes (the analog of
    torch.cuda.memory_allocated/max_allocated prints)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:  # backend without memory_stats
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    if tag and out:
        for dev, s in out.items():
            logging.info(
                "[mem] %s %s: in_use=%.2fGB peak=%.2fGB", tag, dev,
                s["bytes_in_use"] / 2 ** 30, s["peak_bytes_in_use"] / 2 ** 30,
            )
    return out


@contextlib.contextmanager
def trace(log_dir: str, name: Optional[str] = None):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("[trace] %s: %.3fs -> %s", name or "block",
                     time.perf_counter() - t0, log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler timelines (NVTX-range analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield
