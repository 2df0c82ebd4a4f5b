"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5.1). Here: programmatic ``jax.profiler``
trace capture around rollouts, plus ``jax.named_scope`` annotations so the
engine stages (collide / dynamics / solve / integrate) are legible in
XLA/Perfetto traces, and a tiny wall-clock stage timer for quick checks.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # engine stages annotate with profile.scope("solve")


class StageTimer:
    """Wall-clock timer with block_until_ready — for quick profiling without
    a trace viewer. Usage: ``with timer.stage("rollout"): ...``"""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [
            f"{k:24s} {v*1e3:9.2f} ms  {100*v/total:5.1f}%"
            for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
