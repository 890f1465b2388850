"""Profiling hooks (SURVEY §5: the reference has no tracing at all).

Two layers:
  * `trace(dir)` — context manager around jax.profiler for full XLA traces
    viewable in TensorBoard/Perfetto;
  * `StageTimer` — lightweight named wall-clock stages for the host loop,
    aggregated like utils.metrics.MetricsRecorder.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): pipeline step(s)`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stages with summary percentiles."""

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append((time.perf_counter() - t0) * 1e3)

    def summary(self) -> dict:
        out = {}
        for name, vals in self.samples.items():
            v = np.asarray(vals)
            out[name] = {
                "n": int(v.size),
                "mean_ms": float(v.mean()),
                "p50_ms": float(np.percentile(v, 50)),
                "p95_ms": float(np.percentile(v, 95)),
            }
        return out
