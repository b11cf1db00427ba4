"""Wall-clock spans + structured JSONL metrics.

Replaces the reference's ``linalgcpp::Timer`` ANSI prints
(partitioner.cpp:1124,1247-1248, embedder.cpp:219-222) with explicit
``block_until_ready`` spans and per-phase JSONL records (SURVEY.md SS5
tracing/metrics rows).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time

import jax


class Timer:
    """Accumulating span timer; ``timer()`` context manages one span."""

    def __init__(self, name: str = ""):
        self.name = name
        self.spans: list[float] = []

    @contextlib.contextmanager
    def __call__(self, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.spans.append(time.perf_counter() - t0)

    @property
    def total(self) -> float:
        return sum(self.spans)

    def __getitem__(self, i):
        return self.spans[i]


class MetricsLogger:
    """Plain JSONL metrics sink (stdout or file)."""

    def __init__(self, path: str | None = None):
        self._fh = open(path, "a") if path else None

    def log(self, **record):
        record.setdefault("t", time.time())
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall time of ``fn(*args)`` with device sync, for benches."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
