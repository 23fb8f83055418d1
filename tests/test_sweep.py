"""Batched target sweep (solvers/sweep.py): the vmapped shared-geometry
banded path must reproduce the sequential per-target solves."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (CPU backend, x64)


def _prf1d_problem():
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (Field, c_step, density_step,
                                            gaussian_function,
                                            temperature_step)
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh import one_dimensional_setup

    r_gas, gamma = 287.0, 1.4
    p_amb, rho_amb, c_amb = 1e5, 1.22, 339.0
    rho_in, rho_out = rho_amb, 0.85
    U_ref, p_ref = c_amb, p_amb
    T_u = (p_amb / (r_gas * rho_in)) * r_gas / U_ref**2
    T_d = (p_amb / (r_gas * rho_out)) * r_gas / U_ref**2
    rho_u = rho_in * U_ref**2 / p_ref
    rho_d = rho_out * U_ref**2 / p_ref
    n_ftf = 0.014 / (np.pi * 0.047**2 / 4) / p_ref
    tau = 0.0015 * U_ref
    Rc = -0.975 - 0.05j
    x_f = np.array([[0.25, 0.0, 0.0]])
    x_r = np.array([[0.20, 0.0, 0.0]])
    mesh = one_dimensional_setup(300)
    c = c_step(mesh, x_f, np.sqrt(gamma * p_amb / rho_in) / U_ref,
               np.sqrt(gamma * p_amb / rho_out) / U_ref)
    matrices = AcousticMatrices(mesh, {1: {"Robin": Rc}, 2: {"Robin": Rc}}, c)
    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 0], 0.25, 0.025, rho_d, rho_u),
                "rho")
    T = temperature_step(mesh, x_f, T_u, T_d)
    w = gaussian_function(mesh, x_r, 0.025)
    h = gaussian_function(mesh, x_f, 0.025)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, 200.0, 0.1, FTF,
                               gamma=gamma)
    D.assemble_submatrices()
    return matrices, D


def test_sweep_matches_sequential(monkeypatch):
    """The vmapped banded sweep (forced on the CPU test backend) reproduces
    the sequential fixed_point_iteration at every target — first AND second
    acoustic modes of the PRF tube."""
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
    from helmholtz_x_tpu.solvers.sweep import sweep_targets

    matrices, D = _prf1d_problem()
    targets = [np.pi, 2 * np.pi]

    seq = {}
    for t in targets:
        E = fixed_point_iteration(matrices, D, t, nev=4, i=0)
        seq[t] = E.getEigenvalue(0)

    monkeypatch.setenv("HELMHOLTZ_X_TPU_SWEEP", "banded")
    res = sweep_targets(matrices, D, targets, nev=4, i=0, chunk=2)
    for t in targets:
        assert res[t] is not None
        om = res[t].getEigenvalue(0)
        assert abs(om - seq[t]) < 1e-7 * abs(seq[t]), (t, om, seq[t])


def test_sweep_sequential_mode(monkeypatch):
    """auto mode on the CPU backend = sequential; still returns every
    target with the reference eigenvalue at the first target."""
    from helmholtz_x_tpu.solvers.sweep import sweep_targets

    matrices, D = _prf1d_problem()
    res = sweep_targets(matrices, D, [np.pi], nev=2, i=0)
    om = res[complex(np.pi)].getEigenvalue(0)
    expected = 3.42271328 + 0.00219526j
    assert abs(om - expected) / abs(expected) < 1e-5
