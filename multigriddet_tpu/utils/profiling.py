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


_NULL_WALL: Dict[int, float] = {}
_PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s


def null_wall(loop: int = 16, repeats: int = 10) -> float:
    """Per-dispatch wall floor of a runtime-trivial jitted program.

    Through the axon tunnel every independent dispatch pays a ~29.5 ms
    round trip; ``timed_op`` subtracts this floor so sub-RTT programs
    are measurable.  Cached per ``loop`` for the process lifetime.
    """
    if loop in _NULL_WALL:
        return _NULL_WALL[loop]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(s):
        return jax.lax.fori_loop(0, loop, lambda i, a: a * 0.9999 + 1e-6, s)

    for _ in range(2):
        float(prog(jnp.float32(1.0)))
    t0 = time.time()
    outs = [prog(jnp.float32(1.0)) for _ in range(repeats)]
    _ = [float(o) for o in outs]
    _NULL_WALL[loop] = (time.time() - t0) / repeats
    return _NULL_WALL[loop]


def timed_op(fn, *args, loop: int = 16, repeats: int = 3,
             with_mfu: bool = False):
    """Per-call wall time of ``fn(*args)`` as ``loop`` serialized
    in-program iterations (single timing implementation for the tools/
    bench harnesses — fix measurement bugs HERE, once).

    Through the tunnel, independent dispatches do not pipeline — every
    call pays the RTT, which floors any program cheaper than that.  So
    the op is looped INSIDE one jitted program, serialized by a
    runtime-tiny scalar (~1e-30, numerically a no-op) that perturbs the
    first argument so XLA's loop-invariant code motion cannot hoist the
    body.  The residual per-program dispatch cost (``null_wall``) is
    subtracted.

    Returns seconds/call, or ``(seconds, mfu)`` when ``with_mfu`` —
    MFU from XLA's cost analysis (a while-loop body is counted ONCE,
    so the looped program's flops ARE the per-call flops) against the
    v5e bf16 peak.
    """
    import jax
    import jax.numpy as jnp

    def body(s, first, rest):
        out = fn(first * (1.0 + s), *rest)
        leaf = jax.tree.leaves(out)[0]
        return jnp.reshape(leaf, (-1,))[0].astype(jnp.float32) * 1e-30

    jitted = jax.jit(lambda first, *rest: jax.lax.fori_loop(
        0, loop, lambda i, s: body(s, first, rest), jnp.float32(0.0)))
    first, rest = args[0], args[1:]
    for _ in range(2):  # tunnel warm-up beyond compile
        float(jitted(first, *rest))
    t0 = time.time()
    outs = [jitted(first, *rest) for _ in range(repeats)]
    _ = sum(float(o) for o in outs)
    dt = max((time.time() - t0) / repeats - null_wall(loop), 1e-9) / loop
    if not with_mfu:
        return dt
    flops = None
    try:
        cost = jitted.lower(first, *rest).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
    except Exception:
        pass
    mfu = flops / dt / _PEAK_BF16 if flops else float('nan')
    return dt, mfu


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
