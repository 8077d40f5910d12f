"""Tracing / profiling (SURVEY.md §5.1 — the reference had only ad-hoc
perf_counter pairs in its benchmark harness).

* `StageTimer`: per-stage wall-clock accumulation with blocking-aware
  device sync, `report()` for a breakdown table.
* `trace()`: context manager around `jax.profiler` emitting a TensorBoard-
  readable trace directory (XLA ops, fusion, HBM traffic).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage.

    Use `sync=True` for stages whose result is consumed asynchronously —
    it blocks on the device so the measurement is honest.
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-12
        lines = [f"{'stage':<28}{'total s':>10}{'calls':>8}{'ms/call':>10}{'%':>6}"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            c = self.counts[name]
            lines.append(
                f"{name:<28}{t:>10.3f}{c:>8}{t / c * 1e3:>10.2f}{t / total * 100:>6.1f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mast3r_trace"):
    """XLA profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
