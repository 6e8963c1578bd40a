"""Profiling and debug instrumentation.

The reference has no tracing at all (SURVEY.md §5: glog + Ceres progress prints
only). Here:
- :class:`StageTimer` — wall-clock stage timers with blocking device sync, for
  per-stage breakdowns of the host loop;
- :func:`trace` — context manager around ``jax.profiler`` for on-device traces
  viewable in TensorBoard/XProf;
- :func:`enable_debug_checks` — switches on NaN checks (``jax_debug_nans``),
  the equivalent of the reference's pervasive CHECK assertions (e.g.
  lidar_odometry.cc:119,150; cost_functor.h:36-37) in a form that works under
  jit.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Accumulates wall time per named stage; blocks on device completion so
    timings are real."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            c = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:<28} total {tot*1e3:9.1f} ms  n={c:<5d} mean {tot/c*1e3:8.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: ``with trace('/tmp/profile'): run()`` then
    inspect with TensorBoard's profile plugin or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, infs: bool = False) -> None:
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
