"""Tracing / profiling utilities (SURVEY.md §5 tracing row).

The reference's only instrumentation is tqdm bars + per-step prints
(train.py:158) and, on mobile, `android.os.Trace` sections around
preprocess/inference with on-screen ms (Classifier.java:248-259,
ClassifierActivity.java:113-115). Here:

  * `trace(name)` — a context manager emitting a `jax.profiler.TraceAnnotation`
    (visible in XProf/TensorBoard timelines) AND accumulating wall-time into
    a process-local registry (the android.os.Trace analogue);
  * `StepTimer` — steps/sec + images/sec EMA counters for training loops;
  * `start_server` / `trace_to` — jax.profiler hooks for on-demand capture.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class _Registry:
    # Per-span ring of recent durations: enough for meaningful p50/p99
    # over a serving window, bounded so a long-lived daemon never grows.
    RING = 512

    def __init__(self):
        self._lock = threading.Lock()
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._recent: dict[str, list[float]] = defaultdict(list)
        # Plain accumulators (bytes shipped, rows padded, ...): values,
        # not durations — reported as {"total", "count"} in summary().
        self._counters: dict[str, float] = defaultdict(float)
        self._counter_events: dict[str, int] = defaultdict(int)

    def count(self, name: str, value: float):
        """Accumulate a measured VALUE (not a duration) under `name`."""
        with self._lock:
            self._counters[name] += value
            self._counter_events[name] += 1

    def add(self, name: str, dt: float):
        with self._lock:
            self.totals[name] += dt
            self.counts[name] += 1
            ring = self._recent[name]
            if len(ring) >= self.RING:
                # counts was already incremented for THIS sample, so the
                # oldest surviving sample sits at (counts-1) % RING; using
                # counts % RING would evict the 2nd-oldest and let sample
                # #1 (typically a compile-inflated outlier) pollute the
                # percentile window for a whole extra wrap.
                ring[(self.counts[name] - 1) % self.RING] = dt
            else:
                ring.append(dt)

    def summary(self) -> dict[str, dict[str, float]]:
        with self._lock:
            out = {}
            for k in self.totals:
                entry = {
                    "total_s": self.totals[k],
                    "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
                }
                ring = self._recent[k]
                if ring:
                    srt = sorted(ring)
                    entry["p50_ms"] = 1e3 * srt[len(srt) // 2]
                    entry["p99_ms"] = 1e3 * srt[min(
                        len(srt) - 1, int(len(srt) * 0.99)
                    )]
                out[k] = entry
            for k in self._counters:
                out[k] = {
                    "total": self._counters[k],
                    "count": self._counter_events[k],
                }
            return out

    def reset(self):
        with self._lock:
            self.totals.clear()
            self.counts.clear()
            self._recent.clear()
            self._counters.clear()
            self._counter_events.clear()


SPANS = _Registry()


@contextlib.contextmanager
def trace(name: str):
    """Wall-time span + XLA profiler annotation."""
    import jax

    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        SPANS.add(name, time.perf_counter() - t0)


def start_server(port: int = 9999):
    """Start the jax.profiler gRPC server for on-demand XProf capture."""
    import jax

    jax.profiler.start_server(port)
    return port


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """steps/sec + images/sec counters with an exponential moving average."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last: float | None = None
        self.step_time_ema: float | None = None
        self.total_steps = 0
        self.total_images = 0
        self._t0 = time.perf_counter()

    def tick(self, batch_size: int) -> dict[str, float]:
        now = time.perf_counter()
        self.total_steps += 1
        self.total_images += batch_size
        out: dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self.step_time_ema = (
                dt
                if self.step_time_ema is None
                else self.ema * self.step_time_ema + (1 - self.ema) * dt
            )
            out["step_ms"] = dt * 1e3
            out["steps_per_sec"] = 1.0 / self.step_time_ema
            out["images_per_sec"] = batch_size / self.step_time_ema
        self._last = now
        out["avg_images_per_sec"] = self.total_images / max(now - self._t0, 1e-9)
        return out
