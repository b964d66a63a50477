"""Tracing / profiling utilities.

The reference's only profiling is Lightning's `profiler="simple"` wall-time
table (`/root/reference/train.py:106`) plus ad-hoc `time.time()` around
sampling (`generate.py:72-79`).  TPU-native equivalents:

- `trace(dir)`: a `jax.profiler` trace context producing a TensorBoard /
  Perfetto-readable trace of device execution (XLA ops, Pallas kernels, DMA);
- `StepTimer`: throughput counters (steps/s, items/s) with jsonl-friendly
  snapshots — this is how the bench and trainer report steps/sec/chip;
- `timed`: a `with` block that reports host wall time for a named phase.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile tab
    (or Perfetto). Usage: `with profiling.trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counter: call `tick(n_items)` once per step."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def tick(self, n_items: int = 1):
        self.steps += 1
        self.items += n_items

    def snapshot(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "seconds": dt,
            "steps": self.steps,
            "steps_per_sec": self.steps / dt,
            "items_per_sec": self.items / dt,
        }

    def reset(self):
        self.__init__()


class timed:
    """`with timed('phase') as t: ...` — then `t.seconds`."""

    def __init__(self, name: str, log=None):
        self.name = name
        self.log = log
        self.seconds: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.log is not None:
            self.log({"event": "timing", "name": self.name,
                      "seconds": self.seconds})
        return False
