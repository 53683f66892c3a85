"""Wall timing with block_until_ready discipline + per-stage collectors.

Replaces the reference's Timer (utils/timer.h:23-41) and its static timing
vectors (ImgPyramidRGBD::dtTimes imgpyramidrgbd.cpp:23,250; trackingTimes
system.cpp:246) with context managers that synchronize the device before
stopping the clock, plus a jax.profiler trace helper (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class Timer:
    """``with Timer() as t: ...; t.ms`` — syncs outstanding device work."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                import jax

                jax.effects_barrier()
            except Exception:
                pass
        self.ms = (time.perf_counter() - self._t0) * 1000.0


class StageTimes:
    """Named per-stage wall-time series, like dtTimes/trackingTimes."""

    def __init__(self):
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            import jax

            jax.block_until_ready(result)
        self._times[name].append((time.perf_counter() - t0) * 1000.0)

    def add(self, name: str, ms: float) -> None:
        self._times[name].append(ms)

    def mean(self, name: str) -> float:
        xs = self._times.get(name, [])
        return sum(xs) / len(xs) if xs else 0.0

    def report(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self._times}


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
