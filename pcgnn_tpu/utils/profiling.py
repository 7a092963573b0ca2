"""Tracing / profiling utilities.

The reference only accumulates (and then discards) per-batch wall-clock time
(``src/model_handler.py:143-156``).  The TPU equivalents here (SURVEY.md §5):
  * ``trace`` — context manager around ``jax.profiler`` trace capture,
    viewable in TensorBoard/XProf.
  * ``StepTimer`` — wall-clock per-step timing with edges/s accounting.
  * ``annotate`` — named trace regions (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pcgnn_tpu_trace"):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Accumulates per-step wall time and derived throughput counters."""

    edges_per_step: float = 0.0
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def edges_per_s(self) -> float:
        return self.edges_per_step / self.mean_s if self.mean_s else 0.0

    def summary(self) -> dict:
        return {"steps": len(self.times), "mean_step_ms": self.mean_s * 1e3,
                "edges_per_s": self.edges_per_s}
