"""Structured per-solve metrics and optional profiler capture.

The reference's observability is wall-clock prints only (reference:
solver_utils.py:4-17); SURVEY §5 plans structured JSON metrics (iteration
counts, factor times, nnz/s) alongside the reference-format convergence
lines.  This module provides them, off by default:

  HELMHOLTZ_X_TPU_METRICS=stderr          emit one JSON line per event
  HELMHOLTZ_X_TPU_METRICS=path/to.jsonl   append JSON lines to a file
  HELMHOLTZ_X_TPU_PROFILE=trace_dir       capture a jax.profiler trace of
                                          every nonlinear eigensolve

Events carry an `event` tag, a wall timestamp, and event-specific fields
(e.g. {"event": "fpi", "iters": 5, "omega": [.., ..], "wall_s": 1.3}).
"""

from __future__ import annotations

import atexit
import json
import os
import sys
import time
from contextlib import contextmanager

_DEST = os.environ.get("HELMHOLTZ_X_TPU_METRICS", "")
_PROFILE_DIR = os.environ.get("HELMHOLTZ_X_TPU_PROFILE", "")
_RECORDS: list[dict] = []


def metrics_enabled() -> bool:
    return bool(_DEST)


def record(event: str, **fields) -> None:
    """Queue one structured metric event (no-op unless enabled)."""
    if not _DEST:
        return
    rec = {"event": event, "t": round(time.time(), 3)}
    for k, v in fields.items():
        if isinstance(v, complex):
            v = [v.real, v.imag]
        rec[k] = v
    if _DEST == "stderr":
        # streamed immediately; never buffered (unbounded growth otherwise)
        print(json.dumps(rec), file=sys.stderr, flush=True)
        return
    _RECORDS.append(rec)
    # flush in small batches so a killed process (the remote-TPU worker
    # failure mode) loses at most the last few events, not the whole run
    if len(_RECORDS) >= 20:
        _flush()


@contextmanager
def timed(event: str, **fields):
    """Context manager recording the block's wall time as `wall_s`; the
    yielded dict lets the block attach result fields."""
    extra: dict = {}
    t0 = time.perf_counter()
    try:
        yield extra
    finally:
        if _DEST:
            record(event, wall_s=round(time.perf_counter() - t0, 4),
                   **fields, **extra)


@contextmanager
def profiled(name: str):
    """jax.profiler trace around a solve when HELMHOLTZ_X_TPU_PROFILE is a
    directory; inert otherwise."""
    if not _PROFILE_DIR:
        yield
        return
    import jax

    with jax.profiler.trace(_PROFILE_DIR):
        with jax.profiler.TraceAnnotation(name):
            yield


def _flush() -> None:
    if not _DEST or _DEST == "stderr" or not _RECORDS:
        return
    os.makedirs(os.path.dirname(os.path.abspath(_DEST)) or ".", exist_ok=True)
    with open(_DEST, "a") as f:
        for rec in _RECORDS:
            f.write(json.dumps(rec) + "\n")
    _RECORDS.clear()


atexit.register(_flush)
