"""Tracing / profiling: per-phase wall timers + jax.profiler traces.

The reference has no built-in tracing (SURVEY.md §5 — only ad-hoc cuda
timers in eval_vqa.py:32-56).  On TPU this is nearly free, so it is a
first-class subsystem: ``phase('calib')`` context managers accumulate a
wall-clock report, and ``trace(dir)`` captures an XLA/TPU profile
viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        self._stack.append(name)
        try:
            yield
        finally:
            self._stack.pop()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ['phase                          total_s   calls']
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f'{name:<30} {tot:8.2f}  {self.counts[name]:6d}')
        return '\n'.join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


TIMER = PhaseTimer()  # global default, used by the pipeline driver


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace (device + host) around a region; no-op when
    logdir is None."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the TPU trace viewer."""
    import jax
    return jax.profiler.TraceAnnotation(name)
