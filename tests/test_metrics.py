"""Structured-metrics smoke test: with HELMHOLTZ_X_TPU_METRICS set, a solve
emits JSON events for factorization, Arnoldi and the FPI driver."""

import json

import numpy as np
import os
import subprocess
import sys


def test_metrics_jsonl(tmp_path):
    out = tmp_path / "metrics.jsonl"
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.fem.fields import gaussian_function, rho_step, temperature_step
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
x_f = np.array([[0.25, 0.0, 0.0]]); x_r = np.array([[0.20, 0.0, 0.0]])
mesh = one_dimensional_setup(300)
T = temperature_step(mesh, x_f, 293.0, 1000.0)
m = AcousticMatrices(mesh, {1: {"Neumann"}, 2: {"Neumann"}}, T)
D = DistributedFlameMatrix(mesh, gaussian_function(mesh, x_r, 0.025),
                           gaussian_function(mesh, x_f, 0.025),
                           rho_step(mesh, x_f, 0.025, 0.85, 1.22), T,
                           -27.0, 0.1, nTau(1.0, 0.0015))
D.assemble_submatrices()
fixed_point_iteration(m, D, 200 * 2 * np.pi, nev=2, i=0)
"""
    env = dict(os.environ, HELMHOLTZ_X_TPU_METRICS=str(out),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd="/root/repo",
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    events = [json.loads(line) for line in out.read_text().splitlines()]
    names = {e["event"] for e in events}
    assert {"factor", "fpi"} <= names, names
    # the inner eigensolve is either the resolvent-projection path or a full
    # Arnoldi (fallback) — one of the two must have reported
    assert names & {"projection", "arnoldi"}, names
    fpi = [e for e in events if e["event"] == "fpi"][-1]
    assert fpi["iters"] >= 1
    assert np.isfinite(fpi["omega"][0]) and fpi["omega"][0] > 0
    assert fpi["wall_s"] > 0
    factor = [e for e in events if e["event"] == "factor"][0]
    assert factor["tier"] in ("dense", "banded", "host")


def test_debug_nan_check(monkeypatch):
    """HELMHOLTZ_X_TPU_DEBUG=1 turns check_finite into a labelled raise; off
    by default it is a no-op."""
    import importlib

    import numpy as np
    import pytest

    import helmholtz_x_tpu.utils.debug as dbg

    monkeypatch.setattr(dbg, "_enabled", False)
    dbg.check_finite("noop", np.array([np.nan]))  # no raise when disabled

    monkeypatch.setattr(dbg, "_enabled", True)
    monkeypatch.setattr(dbg, "_configured", True)  # skip jax config flip
    dbg.check_finite("fine", np.ones(3), None, 1.0 + 2.0j)
    from helmholtz_x_tpu.ops.cplx import Z

    with pytest.raises(FloatingPointError, match="bad-z"):
        dbg.check_finite("bad-z", Z(np.ones(2), np.array([1.0, np.inf])))
    with pytest.raises(FloatingPointError, match="bad-arr"):
        dbg.check_finite("bad-arr", np.array([np.nan]))
