"""Device block-Krylov basis (rank k > 1) — the single-dispatch path used by
multi-flame cases (MICCA annulus, 16 burners) on the dense/banded tiers.

Correctness trick: a rank-1 flame operator D = L R^T rewritten as REDUNDANT
rank-3 factors (L3 = [a1 L, a2 L, a3 L], R3 = [b1 R, b2 R, b3 R] with
sum(ai bi) = 1) is the SAME operator, so the k=3 block path must converge to
exactly the rank-1 eigenvalue — through multi-RHS solves, block CGS2/MGS2,
and the k x k Woodbury capacitance.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (CPU backend, x64)


def _prf1d_problem():
    """PRF 1D active case (Robin BCs -> quadratic pencil, n = 300 dofs)."""
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (
        Field,
        c_step,
        density_step,
        gaussian_function,
        temperature_step,
    )
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh import one_dimensional_setup

    r_gas, gamma = 287.0, 1.4
    p_amb, rho_amb, c_amb = 1e5, 1.22, 339.0
    rho_in, rho_out = rho_amb, 0.85
    L_ref, U_ref, p_ref = 1.0, c_amb, p_amb
    T_u = (p_amb / (r_gas * rho_in)) * r_gas / U_ref**2
    T_d = (p_amb / (r_gas * rho_out)) * r_gas / U_ref**2
    rho_u = rho_in * U_ref**2 / p_ref
    rho_d = rho_out * U_ref**2 / p_ref
    n_ftf = 0.014 / (np.pi * 0.047**2 / 4) / (p_ref * L_ref**2)
    tau = 0.0015 * U_ref / L_ref
    R = -0.975 - 0.05j
    x_f = np.array([[0.25, 0.0, 0.0]])
    x_r = np.array([[0.20, 0.0, 0.0]])
    mesh = one_dimensional_setup(300)
    c = c_step(mesh, x_f, np.sqrt(gamma * p_amb / rho_in) / U_ref,
               np.sqrt(gamma * p_amb / rho_out) / U_ref)
    matrices = AcousticMatrices(mesh, {1: {"Robin": R}, 2: {"Robin": R}}, c)
    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 0], 0.25, 0.025, rho_d, rho_u), "rho")
    T = temperature_step(mesh, x_f, T_u, T_d)
    w = gaussian_function(mesh, x_r, 0.025)
    h = gaussian_function(mesh, x_f, 0.025)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, 200.0, 0.1, FTF, gamma=gamma)
    D.assemble_submatrices()
    return matrices, D


def _redundant_rank3(D):
    a = np.array([0.5, 0.3, 0.2])
    b = np.array([1.0, 1.0, 1.0])
    assert abs(np.sum(a * b) - 1.0) < 1e-15
    L1, R1 = D.factors
    D._L = np.concatenate([ai * L1 for ai in a], axis=1)
    D._R = np.concatenate([bi * R1 for bi in b], axis=1)
    return D


@pytest.mark.parametrize("tier", ["banded", "dense"])
def test_block_basis_matches_rank1(tier, monkeypatch):
    monkeypatch.setenv("HELMHOLTZ_X_TPU_SPARSE_TIER", tier)
    import helmholtz_x_tpu.solvers.linsolve as ls

    monkeypatch.setattr(ls, "SPARSE_TIER", tier)
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    matrices, D = _prf1d_problem()
    E1 = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0)
    om1 = E1.getEigenvalue(0)

    matrices, D = _prf1d_problem()
    D = _redundant_rank3(D)
    E3 = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0)
    om3 = E3.getEigenvalue(0)

    expected = 3.422713 + 0.002195j  # reference PRF 1D direct
    assert abs(om1 - expected) / abs(expected) < 1e-5, om1
    assert abs(om3 - om1) < 1e-8 * abs(om1), (om3, om1)


def _rijke1d_problem():
    """Dimensional Rijke 1D active case (Neumann BCs -> linear/eps pencil)."""
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (
        gaussian_function,
        rho_step,
        temperature_step,
    )
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh import one_dimensional_setup

    r_gas, gamma = 287.0, 1.4
    p_amb, rho_u, rho_d = 1e5, 1.22, 0.85
    c_u = np.sqrt(gamma * p_amb / rho_u)
    c_d = np.sqrt(gamma * p_amb / rho_d)
    T_u = c_u**2 / (gamma * r_gas)
    T_d = c_d**2 / (gamma * r_gas)
    x_f = np.array([[0.25, 0.0, 0.0]])
    x_r = np.array([[0.20, 0.0, 0.0]])
    mesh = one_dimensional_setup(300)
    T = temperature_step(mesh, x_f, T_u, T_d)
    matrices = AcousticMatrices(mesh, {1: {"Neumann"}, 2: {"Neumann"}}, T)
    FTF = nTau(0.1 / (np.pi * 0.047**2 / 4), 0.0015)
    rho = rho_step(mesh, x_f, 0.025, rho_d, rho_u)
    w = gaussian_function(mesh, x_r, 0.025)
    h = gaussian_function(mesh, x_f, 0.025)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, -27.008910380099735,
                               0.10066660027273297, FTF)
    D.assemble_submatrices()
    return matrices, D


@pytest.mark.parametrize("tier", ["banded", "dense"])
def test_block_basis_matches_rank1_eps(tier, monkeypatch):
    import helmholtz_x_tpu.solvers.linsolve as ls

    monkeypatch.setattr(ls, "SPARSE_TIER", tier)
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    matrices, D = _rijke1d_problem()
    E1 = fixed_point_iteration(matrices, D, 200 * 2 * np.pi, nev=2, i=0)
    om1 = np.sqrt(E1.getEigenvalue(0))

    matrices, D = _rijke1d_problem()
    D = _redundant_rank3(D)
    E3 = fixed_point_iteration(matrices, D, 200 * 2 * np.pi, nev=2, i=0)
    om3 = np.sqrt(E3.getEigenvalue(0))
    assert abs(om3 - om1) < 1e-8 * abs(om1), (om3, om1)


@pytest.mark.parametrize("tier", ["banded", "dense"])
def test_split_basis_matches_fused(tier, monkeypatch):
    """The split-dispatch basis build (seed + per-step programs, used on TPU
    for large cases where one fused program exceeds the remote-compile
    limits) must reproduce the fused single-dispatch eigenvalues exactly —
    rank-1 (eps, Arnoldi chunks) and rank-3 (pep, per-block-step) paths."""
    import helmholtz_x_tpu.solvers.linsolve as ls

    monkeypatch.setattr(ls, "SPARSE_TIER", tier)
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    matrices, D = _rijke1d_problem()
    E = fixed_point_iteration(matrices, D, 200 * 2 * np.pi, nev=2, i=0)
    om_fused = np.sqrt(E.getEigenvalue(0))

    monkeypatch.setenv("HELMHOLTZ_X_TPU_BASIS_SPLIT", "always")
    monkeypatch.setenv("HELMHOLTZ_X_TPU_BASIS_SPLIT_N", "1")
    matrices, D = _rijke1d_problem()
    E = fixed_point_iteration(matrices, D, 200 * 2 * np.pi, nev=2, i=0)
    om_split = np.sqrt(E.getEigenvalue(0))
    assert abs(om_split - om_fused) < 1e-9 * abs(om_fused), (om_split, om_fused)

    matrices, D = _prf1d_problem()
    D = _redundant_rank3(D)
    E = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0)
    om3_split = E.getEigenvalue(0)
    expected = 3.422713 + 0.002195j
    assert abs(om3_split - expected) / abs(expected) < 1e-5, om3_split
