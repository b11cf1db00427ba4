"""Profiler integration.

Replaces the reference's ANSI Timer prints (SURVEY.md SS5 tracing row) with
``jax.profiler`` traces plus the per-phase JSONL spans of utils.timing.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a jax.profiler trace for the enclosed block (view with
    TensorBoard / xprof).  No-op when logdir is None."""
    if logdir is None:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def edges_per_second(num_edges: int, iterations: int, seconds: float) -> float:
    """The north-star metric (BASELINE.md): stored entries traversed/s."""
    return num_edges * iterations / seconds
