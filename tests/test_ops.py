"""Unit tests for the core kernels: complex-pair ops, CSR SpMV, dense QR
solves, Woodbury correction, and the shift-invert Arnoldi against scipy
oracles on random complex pencils."""

import numpy as np
import pytest
import scipy.sparse as sp

from helmholtz_x_tpu.ops import cplx as zx
from helmholtz_x_tpu.ops.cplx import Z, zarray
from helmholtz_x_tpu.ops.csr import csr_from_scipy, spmv, spmv_H
from helmholtz_x_tpu.ops.dense import dense_solve, dense_solve_H, factor_dense
from helmholtz_x_tpu.solvers.linsolve import ShiftedFactor, csr_weighted_dense
from helmholtz_x_tpu.solvers.arnoldi import eps_solver, pep_solver
from helmholtz_x_tpu.flame import LowRank


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_cplx_roundtrip_and_ops():
    rng = np.random.default_rng(0)
    a = _rand_c(rng, 50)
    b = _rand_c(rng, 50)
    za, zb = zarray(a), zarray(b)
    assert np.allclose(zx.zmul(za, zb).to_numpy(), a * b)
    assert np.allclose(zx.zdotc(za, zb).to_numpy(), np.vdot(a, b))
    assert np.allclose(zx.zdotu(za, zb).to_numpy(), a @ b)
    A = _rand_c(rng, 20, 20)
    x = _rand_c(rng, 20)
    assert np.allclose(zx.zmatvec(zarray(A), zarray(x)).to_numpy(), A @ x)


def test_csr_spmv_matches_scipy():
    rng = np.random.default_rng(1)
    A = sp.random(200, 200, density=0.05, random_state=2).tocsr().astype(complex)
    A = A + 1j * sp.random(200, 200, density=0.05, random_state=3).tocsr()
    x = _rand_c(rng, 200)
    Ac = csr_from_scipy(A)
    assert np.allclose(spmv(Ac, zarray(x)).to_numpy(), A @ x)
    assert np.allclose(spmv_H(Ac, zarray(x)).to_numpy(), A.conj().T @ x)


def test_dense_qr_solve_and_H():
    rng = np.random.default_rng(4)
    A = _rand_c(rng, 80, 80) + 10 * np.eye(80)
    b = _rand_c(rng, 80)
    f = factor_dense(zarray(A))
    x = dense_solve(f, zarray(b)).to_numpy()
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-11
    xh = dense_solve_H(f, zarray(b)).to_numpy()
    assert np.linalg.norm(A.conj().T @ xh - b) / np.linalg.norm(b) < 1e-11


def test_woodbury_exactness():
    rng = np.random.default_rng(5)
    n, k = 60, 3
    P = _rand_c(rng, n, n) + 8 * np.eye(n)
    L = _rand_c(rng, n, k)
    R = _rand_c(rng, n, k)
    s = 0.7 - 0.3j
    b = _rand_c(rng, n)
    f = ShiftedFactor(zarray(P))
    f.set_lowrank_factors(L, R, two_sided=True)
    f.set_scale(s)
    from helmholtz_x_tpu.solvers.arnoldi import _solve_wb, _solve_wb_H

    M = P - s * L @ R.T
    sv = f.solve_op()
    x = _solve_wb(sv, zarray(b), f.nrefine).to_numpy()
    assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-10
    xh = _solve_wb_H(sv, zarray(b), f.nrefine).to_numpy()
    assert np.linalg.norm(M.conj().T @ xh - b) / np.linalg.norm(b) < 1e-10


def test_eps_solver_vs_dense_eig():
    """Shift-invert Arnoldi on a random sparse pencil A x = lam (-C) x vs a
    dense eigensolve oracle."""
    rng = np.random.default_rng(6)
    n = 120
    A = sp.random(n, n, density=0.1, random_state=7).tocsr().astype(complex)
    A = A + A.T - 10 * sp.eye(n)
    C = sp.eye(n, format="csr").astype(complex) * (1.0 + 0.1j)
    import scipy.linalg as sla

    lam_all = sla.eig(A.toarray(), -C.toarray(), right=False)
    target = 2.0 + 0.5j
    Ac, Cc = csr_from_scipy(A), csr_from_scipy(C)
    E = eps_solver(Ac, Cc, np.sqrt(target), nev=2, tol=1e-12)
    got = E.getEigenvalue(0)
    want = lam_all[np.argmin(np.abs(lam_all - target))]
    assert abs(got - want) / abs(want) < 1e-8
    # residual of the eigenpair
    x = E.getEigenvector(0)
    r = A @ x - got * (-(C @ x))
    assert np.linalg.norm(r) / np.linalg.norm(x) < 1e-7


def test_eps_two_sided_left_vector():
    rng = np.random.default_rng(8)
    n = 90
    A = sp.random(n, n, density=0.12, random_state=9).tocsr().astype(complex)
    A = A - 5 * sp.eye(n) + 0.3j * sp.eye(n)
    C = sp.eye(n, format="csr").astype(complex)
    Ac, Cc = csr_from_scipy(A), csr_from_scipy(C)
    E = eps_solver(Ac, Cc, np.sqrt(1.5 + 0.2j), nev=2, tol=1e-12, two_sided=True)
    lam = E.getEigenvalue(0)
    y = E.getLeftEigenvector(0)
    # left eigenvector of the pencil: A^H y = conj(lam) (-C)^H y
    r = A.conj().T @ y - np.conj(lam) * (-(C.conj().T @ y))
    assert np.linalg.norm(r) / np.linalg.norm(y) < 1e-7


def test_pep_solver_vs_companion_oracle():
    rng = np.random.default_rng(10)
    n = 60
    A = sp.random(n, n, density=0.15, random_state=11).tocsr().astype(complex) - 6 * sp.eye(n)
    B = 0.1j * sp.eye(n, format="csr").astype(complex)
    C = sp.eye(n, format="csr").astype(complex)
    import scipy.linalg as sla

    # companion linearization oracle
    Z0 = np.zeros((n, n))
    I = np.eye(n)
    L0 = np.block([[-A.toarray(), Z0], [Z0, I]])
    L1 = np.block([[B.toarray(), C.toarray()], [I, Z0]])
    lam_all = sla.eig(L0, L1, right=False)
    target = 2.2 + 0.1j
    E = pep_solver(csr_from_scipy(A), csr_from_scipy(B), csr_from_scipy(C),
                   target, nev=2, tol=1e-12)
    got = E.getEigenvalue(0)
    want = lam_all[np.argmin(np.abs(lam_all - target))]
    assert abs(got - want) / abs(want) < 1e-8
    x = E.getEigenvector(0)
    r = (A @ x) + got * (B @ x) + got**2 * (C @ x)
    assert np.linalg.norm(r) / np.linalg.norm(x) < 1e-6


def test_lowrank_flame_scaling_conventions():
    """D(omega) = FTF(omega) L R^T; adjoint = conj(FTF(conj(omega))) R L^T
    (reference: flame_matrices.py:96-108)."""
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.flame import FlameMatrixBase

    rng = np.random.default_rng(12)
    fm = FlameMatrixBase.__new__(FlameMatrixBase)
    fm.FTF = nTau(2.0, 0.001)
    fm._L = _rand_c(rng, 30, 2)
    fm._R = _rand_c(rng, 30, 2)
    fm._D = fm._D_adj = None
    omega = 100 + 5j
    fm.assemble_matrix(omega, "direct")
    Dd = fm.matrix.dense()
    assert np.allclose(Dd, fm.FTF(omega) * fm._L @ fm._R.T)
    fm.assemble_matrix(omega, "adjoint")
    Da = fm.adjoint_matrix.dense()
    assert np.allclose(Da, np.conj(fm.FTF(np.conj(omega))) * fm._R @ fm._L.T)
    # with REAL factors (as the physical integrals are) the adjoint operator
    # equals the conjugate transpose of D at conj(omega)
    fm._L = fm._L.real.astype(complex)
    fm._R = fm._R.real.astype(complex)
    fm.assemble_matrix(omega, "adjoint")
    Da = fm.adjoint_matrix.dense()
    fm.assemble_matrix(np.conj(omega), "direct")
    assert np.allclose(Da, fm.matrix.dense().conj().T)
