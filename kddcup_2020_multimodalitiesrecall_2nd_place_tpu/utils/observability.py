"""Structured metrics, timing and profiling hooks.

The reference's observability is print statements, commented-out wall-clock
accumulators (``load_data_pred.py:185-221``) and TF summaries for LR/loss
(``train_normal.py:136``). Here: one tiny structured-metrics sink with
pairs/sec counters and ``jax.profiler`` trace annotations per pipeline stage.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Meter:
    """Accumulates per-stage wall time and item counts."""

    seconds: dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        import jax.profiler

        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.seconds[name] += time.perf_counter() - t0
        self.counts[name] += items

    def rate(self, name: str) -> float:
        s = self.seconds.get(name, 0.0)
        return self.counts.get(name, 0) / s if s > 0 else 0.0

    def summary(self) -> dict:
        return {
            name: {
                "seconds": round(self.seconds[name], 4),
                "count": self.counts.get(name, 0),
                "per_second": round(self.rate(name), 2),
            }
            for name in self.seconds
        }


def log_metrics(step: int, metrics: dict, stream=None) -> None:
    """One JSON line per step: greppable, machine-parsable."""
    stream = stream or sys.stdout
    payload = {"step": step}
    for k, v in metrics.items():
        try:
            payload[k] = float(v)
        except (TypeError, ValueError):
            payload[k] = str(v)
    stream.write(json.dumps(payload) + "\n")
    stream.flush()


@contextlib.contextmanager
def device_profile(log_dir: str | None):
    """Capture a device trace viewable in TensorBoard/XProf (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
