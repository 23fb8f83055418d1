"""Opt-in debug / NaN-check mode (SURVEY §5 "jax.debug/NaN checks,
deterministic reductions").

    HELMHOLTZ_X_TPU_DEBUG=1   enable

When enabled:
* ``jax.config.jax_debug_nans`` is switched on the first time a check runs,
  so any NaN produced INSIDE a jitted program raises at the emitting op
  (XLA re-runs the program un-jitted to locate it);
* :func:`check_finite` raises a labelled ``FloatingPointError`` at the
  host-side seams (factor probes, basis health, FPI iterates) instead of
  letting a NaN surface later as a cryptic projection fallback or a
  diverged refinement.

Off by default: the checks cost device syncs and disable some fusions.
"""

from __future__ import annotations

import os

import numpy as np

_enabled = os.environ.get("HELMHOLTZ_X_TPU_DEBUG", "0") not in ("0", "", "no",
                                                                "false")
_configured = False


def debug_enabled() -> bool:
    return _enabled


def _configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    jax.config.update("jax_debug_nans", True)


def check_finite(name: str, *arrays) -> None:
    """Raise FloatingPointError naming `name` if any array has a NaN/Inf.
    No-op (zero cost beyond the truthiness test) unless debug mode is on.
    Accepts numpy/jax arrays, Z pairs, python scalars, or None."""
    if not _enabled:
        return
    _configure()
    for a in arrays:
        if a is None:
            continue
        if hasattr(a, "re"):  # Z pair
            check_finite(name, a.re, a.im)
            continue
        arr = np.asarray(a)
        if arr.size and not np.all(np.isfinite(arr)):
            bad = int(arr.size - np.isfinite(arr).sum())
            raise FloatingPointError(
                f"[debug] non-finite values in {name}: {bad}/{arr.size} "
                f"entries (dtype {arr.dtype}, shape {arr.shape})")
