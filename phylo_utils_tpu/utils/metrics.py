"""Structured metrics + timing (SURVEY.md §5: observability is new design).

Per-step records (logL, grad-norm, step-time, sites/s/chip) stream to JSONL
and optionally stdout; ``Timer`` wraps ``jax.block_until_ready`` so device
work is actually measured, and ``trace`` hooks ``jax.profiler`` for
TensorBoard/Perfetto captures.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import jax

__all__ = ["MetricsLogger", "Timer", "trace", "enable_debug_checks"]


class MetricsLogger:
    """Append-only JSONL metrics stream (host 0 only under multi-host)."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = None
        if path and jax.process_index() == 0:
            self._fh = open(path, "a", buffering=1)

    def log(self, step: int, **metrics: Any) -> Dict[str, Any]:
        rec = {"step": int(step), "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
        if self.echo and jax.process_index() == 0:
            print(line)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Timer:
    """Wall-clock timer that blocks on device results.

    >>> with Timer() as t:
    ...     out = fn(*args)
    ...     t.block(out)
    >>> t.seconds
    """

    def __enter__(self):
        self.seconds = None
        self._t0 = time.perf_counter()
        return self

    def block(self, value):
        jax.block_until_ready(value)
        return value

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """``jax.profiler.trace`` when a logdir is given, no-op otherwise."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


def enable_debug_checks(nans: bool = True, checks: bool = False) -> None:
    """Turn on JAX runtime debugging (SURVEY.md §5 sanitizer row).

    ``nans=True`` makes any NaN produced under jit raise at the op that
    created it (jax_debug_nans); ``checks=True`` enables jax_enable_checks
    (internal invariant checking; slow). Use in tests/debug sessions, not
    production.
    """
    if nans:
        jax.config.update("jax_debug_nans", True)
    if checks:
        jax.config.update("jax_enable_checks", True)
