"""Profiling / tracing utilities.

The reference's observability is a Keras TensorBoard callback plus manual
phase timers in the evaluator (SURVEY.md §5).  TPU-native equivalents:
``jax.profiler`` trace capture (viewable in TensorBoard / Perfetto) and the
same lightweight phase timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating named phase timers (reference evaluator.py:307-525)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f'{name:<24} {total:8.2f}s total '
                         f'({total / max(n, 1) * 1000:7.1f} ms x {n})')
        return '\n'.join(lines)
