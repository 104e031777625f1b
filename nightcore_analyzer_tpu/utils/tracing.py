"""Lightweight stage tracing / profiling (SURVEY §5).

The reference's only instrumentation is the injectable ``log`` callback
threaded through the pipeline (``pipeline.py:34,77-79``); the TPU build
keeps that and adds:

* :class:`StageTimer` — wall-clock per named stage, reported through the
  same log channel (works everywhere, including the axon tunnel where
  ``jax.profiler`` device traces are unavailable);
* :func:`device_trace` — a ``jax.profiler.trace`` context when the backend
  supports it (writes a TensorBoard-loadable trace), a no-op otherwise.

Enable for any entry point with ``NCFA_TRACE=1`` (stage timings to stderr)
or ``NCFA_TRACE_DIR=/path`` (adds a device trace when supported).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Callable, Optional

__all__ = ["StageTimer", "device_trace", "tracing_enabled"]


def tracing_enabled() -> bool:
    return bool(os.environ.get("NCFA_TRACE") or os.environ.get("NCFA_TRACE_DIR"))


class StageTimer:
    """Accumulates wall-clock per stage; emits through a log callback.

    >>> t = StageTimer(log=print)
    >>> with t.stage("decode"):
    ...     work()
    >>> t.report()
    """

    def __init__(self, log: Optional[Callable[[str], None]] = None,
                 enabled: Optional[bool] = None):
        self._log = log or (lambda m: print(m, file=sys.stderr))
        self.enabled = tracing_enabled() if enabled is None else enabled
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self._log(f"[trace] {name}: {dt * 1000:.1f} ms")

    def report(self) -> None:
        if self.enabled and self.times:
            total = sum(self.times.values())
            self._log("[trace] ── stage totals ──")
            for name, dt in sorted(self.times.items(), key=lambda kv: -kv[1]):
                self._log(f"[trace] {name:>24}: {dt * 1000:8.1f} ms "
                          f"({dt / total * 100:4.1f}%)")


@contextlib.contextmanager
def device_trace():
    """``jax.profiler.trace`` into ``NCFA_TRACE_DIR`` when set and the
    backend supports device tracing; silently a no-op otherwise."""
    trace_dir = os.environ.get("NCFA_TRACE_DIR")
    if not trace_dir:
        yield
        return
    try:
        import jax
        with jax.profiler.trace(trace_dir):
            yield
    except Exception:
        yield
