"""Tracing / profiling hooks (SURVEY.md section 5: absent in the reference,
which imports ``time`` and never uses it -- V5_ProjectingBBoxes.py:12).

* :class:`StageTimer` -- named wall-clock stages with a device-completion
  barrier that works on the axon relay (where ``jax.block_until_ready``
  returns before the computation finishes -- only a host read blocks).
* :func:`trace` -- context manager around ``jax.profiler`` trace capture.
* :class:`ThroughputMeter` -- frames/sec/chip counter (the north-star
  metric, BASELINE.json).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


def device_barrier(tree) -> None:
    """Reliably wait for device work: host-read one scalar per leaf root.

    ``jax.block_until_ready`` is not trustworthy through the axon loopback
    relay; reading a value back is.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0])


class StageTimer:
    """Accumulates per-stage wall times; ``with timer.stage("project"): ...``."""

    def __init__(self, barrier: bool = True):
        self.barrier = barrier
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder: List = []
        try:
            yield holder
        finally:
            if self.barrier and holder:
                device_barrier(holder[-1])
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.times.values())
        lines = []
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            pct = 100 * t / total if total else 0
            lines.append(f"{name:<24} {t * 1000:9.2f} ms "
                         f"({pct:5.1f}%, n={self.counts[name]})")
        lines.append(f"{'TOTAL':<24} {total * 1000:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """frames/sec/chip with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._batches: List[tuple] = []

    def record(self, n_frames: int, seconds: float) -> None:
        self._batches.append((n_frames, seconds))

    @property
    def frames_per_sec(self) -> Optional[float]:
        counted = self._batches[self.warmup:]
        if not counted:
            return None
        frames = sum(n for n, _ in counted)
        secs = sum(s for _, s in counted)
        return frames / secs if secs > 0 else None
