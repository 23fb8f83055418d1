"""Background device session warm-up and readiness tracking.

Remote-accelerator backends (the axon TPU relay used on this rig) bind a
device session lazily on the FIRST blocking host<->device round trip; behind
a relay that bind can take minutes — it waits out the server-side hold of a
previous (possibly killed) client's session.  Nothing in the numerics needs
the device that early, so:

* :func:`start_device_warmup` fires the bind from a daemon thread at t=0 —
  the wait overlaps host-side setup (mesh load, assembly, flame matrices)
  instead of serializing with it;
* :func:`device_ready` reports (without blocking) whether the device is
  usable yet;
* :func:`wait_device` blocks up to a deadline.

The solver tiering (solvers/linsolve.build_shifted_factor) consults these to
fall back to the host sparse-direct tier rather than stalling a production
solve on a cold session — the degraded-mode branch of the failure-detection
plan in SURVEY.md §5.  On a local backend (cpu tests, healthy TPU) the first
round trip costs microseconds and the warm-up is an imperceptible no-op.
"""

from __future__ import annotations

import os
import threading
import time

_state = {"started": False, "ready": False, "bind_s": None, "error": None}
_cv = threading.Condition()


def _bind():
    t0 = time.perf_counter()
    err = None
    try:
        import jax.numpy as jnp
        import numpy as np

        # a put alone is buffered client-side; the readback forces the
        # session bind + full round trip
        np.asarray(jnp.zeros(8))
    except Exception as e:  # no device at all: report, never raise
        err = e
    with _cv:
        _state["bind_s"] = time.perf_counter() - t0
        _state["error"] = err
        _state["ready"] = err is None
        _cv.notify_all()


def start_device_warmup() -> None:
    """Idempotent; returns immediately.  Call as early as possible."""
    with _cv:
        if _state["started"]:
            return
        _state["started"] = True
        _state["t_start"] = time.monotonic()
    threading.Thread(target=_bind, daemon=True, name="hx-device-warmup").start()


def warmup_started() -> bool:
    """Whether a session claim was ever initiated (no side effects)."""
    with _cv:
        return bool(_state["started"])


def device_ready() -> bool:
    """True once the first device round trip has completed successfully.
    Never blocks.  If the warm-up was never started, starts it (so callers
    polling this late still make progress) and reports the current state."""
    start_device_warmup()
    with _cv:
        return _state["ready"]


def wait_device(timeout: float | None = None) -> bool:
    """Block until the device is ready or `timeout` seconds passed.

    Only the FIRST caller pays the timeout: once a wait has expired without
    the device coming up, later calls return the current readiness
    immediately (a bench solving four cases should not stack four 10 s
    waits on a device that is not coming)."""
    start_device_warmup()
    with _cv:
        if _state["ready"]:
            return True
        if _state.get("wait_expired"):
            return False
    deadline = None if timeout is None else time.monotonic() + timeout
    with _cv:
        while not _state["ready"] and _state["error"] is None:
            remaining = None if deadline is None else deadline - time.monotonic()
            if remaining is not None and remaining <= 0:
                _state["wait_expired"] = True
                break
            _cv.wait(remaining)
        return _state["ready"]


def bind_seconds() -> float | None:
    """Wall seconds the session bind took (None while pending)."""
    with _cv:
        return _state["bind_s"]


def cold_start_policy() -> float:
    """Seconds a solver should still wait for a cold device before
    degrading to the host tier.

    The budget (HELMHOLTZ_X_TPU_DEVICE_WAIT_S, default 25) counts from
    the WARM-UP START, not from the solver's call: a healthy bind takes
    5-11 s and host-side setup overlaps it, so by factor time the bind is
    normally done and the residual wait is ~zero; a bind still pending
    tens of seconds in means a server-side session hold (measured
    170-600 s) and waiting longer only stalls the degraded run.  (The old
    fixed 10 s FROM CALL TIME both stacked avoidable waits onto degraded
    runs and sat within measurement noise of the healthy 10.6 s bind.)"""
    budget = float(os.environ.get("HELMHOLTZ_X_TPU_DEVICE_WAIT_S", "25"))
    with _cv:
        t0 = _state.get("t_start")
    if t0 is None:
        return budget
    return max(2.0, budget - (time.monotonic() - t0))
