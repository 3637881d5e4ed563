"""Profiling / tracing utilities.

The reference's observability is ad-hoc wall-clock prints (detect.py:55-60,
train_multi_gpu.py:173-199, rtm3d_loss.py:342-417). Here: a timing context
that blocks on device work (so numbers mean something under async dispatch),
a step-time meter, and one-call XLA profiler capture for TensorBoard's trace
viewer."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class Timer:
    """Accumulating named wall-clock timer with device sync."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1e3:.1f}ms"
            for k in sorted(self.totals)
        )

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard (Profile tab).
    Replaces the reference's print-based timing with real device traces."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    """Per-device live-bytes summary (the reference prints
    torch.cuda.memory_cached, train.py:108)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = int(stats.get("bytes_in_use", 0))
        except Exception:
            out[str(d)] = -1
    return out
