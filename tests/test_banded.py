"""Block-banded device LU tier: solve exactness vs scipy, and an end-to-end
eigensolve gate routed through the banded factorization."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from helmholtz_x_tpu.solvers.linsolve import BandedShiftedFactor


def _random_banded(n, rng, density=0.01):
    A = sp.diags([np.full(n, 8 + 0.5j)], [0]) + sp.random(n, n, density=density,
                                                          random_state=3)
    return (A + A.T).tocsr().astype(np.complex128)


def test_banded_solve_matches_scipy():
    rng = np.random.default_rng(0)
    A = _random_banded(900, rng)
    f = BandedShiftedFactor(A, nb=64)
    b = rng.standard_normal(900) + 1j * rng.standard_normal(900)
    x = f.solve_P(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-12
    xh = f.solve_P_H(b)
    assert np.linalg.norm(A.conj().T @ xh - b) / np.linalg.norm(b) < 1e-12


def test_banded_woodbury():
    rng = np.random.default_rng(1)
    n, k = 500, 2
    A = _random_banded(n, rng)
    L = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    R = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    s = 0.3 - 0.2j
    f = BandedShiftedFactor(A, nb=64)
    f.set_lowrank_factors(L, R, two_sided=True)
    f.set_scale(s)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    M = (A - s * sp.csr_matrix(L @ R.T)).tocsr()
    x = f.solve_wb(b)
    assert np.linalg.norm(M @ x - b) / np.linalg.norm(b) < 1e-10
    xh = f.solve_wb_H(b)
    assert np.linalg.norm(M.conj().T @ xh - b) / np.linalg.norm(b) < 1e-10


@pytest.mark.slow
def test_banded_tier_end_to_end():
    """3D Rijke passive gate routed through the banded tier (forcing
    SPARSE_TIER=banded and a tiny dense limit)."""
    import helmholtz_x_tpu.solvers.linsolve as lin

    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.fem.fields import c_step
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.solvers.arnoldi import eps_solver
    from helmholtz_x_tpu.eigenvectors import normalize_eigenvector

    old_limit, old_tier = lin.DENSE_DOF_LIMIT, lin.SPARSE_TIER
    lin.DENSE_DOF_LIMIT, lin.SPARSE_TIER = 100, "banded"
    try:
        mesh = XDMFReader(
            "/root/reference/numerical_examples/Longitudinal/NetworkCode/"
            "RijkeTube3D/MeshDir/mesh").mesh
        gamma, p_amb, rho_u = 1.4, 1e5, 1.22
        c_u = np.sqrt(gamma * p_amb / rho_u)
        bcs = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}
        c = c_step(mesh, np.array([[0.0, 0.0, 0.25]]), c_u, c_u)
        matrices = AcousticMatrices(mesh, bcs, c)
        E = eps_solver(matrices.A, matrices.C, 200 * 2 * np.pi, nev=2)
        omega, _ = normalize_eigenvector(mesh, E, 0)
        assert abs(omega - 1064.648163) / 1064.648163 < 1e-6
    finally:
        lin.DENSE_DOF_LIMIT, lin.SPARSE_TIER = old_limit, old_tier


def test_banded_mixed_precision_refinement(monkeypatch):
    """f32 block LU + iterative refinement against the exact operator
    recovers f64 accuracy (the TPU fast path; ops/banded.py dtype plumbing)."""
    monkeypatch.setenv("HELMHOLTZ_X_TPU_MIXED", "1")
    rng = np.random.default_rng(4)
    A = _random_banded(700, rng)
    f = BandedShiftedFactor(A, nb=64)
    assert f.mixed and f.fac.band_re.dtype == np.float32
    b = rng.standard_normal(700) + 1j * rng.standard_normal(700)
    x = f.solve_P(b)
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-12
    xh = f.solve_P_H(b)
    assert np.linalg.norm(A.conj().T @ xh - b) / np.linalg.norm(b) < 1e-12


def test_banded_factor_multirhs_solve_p():
    """BandedShiftedFactor.solve_P on a (n, k) block == per-column solves
    (the polish path batches its Woodbury W-solve through this)."""
    import numpy as np
    import scipy.sparse as sp

    from helmholtz_x_tpu.solvers.linsolve import BandedShiftedFactor

    rng = np.random.default_rng(5)
    n = 120
    main = 4.0 + rng.standard_normal(n) + 1j * rng.standard_normal(n)
    off = rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)
    P = sp.diags([off, main, off.conj()], [-1, 0, 1]).tocsr()
    f = BandedShiftedFactor(P)
    B = rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    X = f.solve_P(B)
    assert X.shape == (n, 3)
    cols = np.stack([f.solve_P(B[:, j]) for j in range(3)], axis=1)
    assert np.linalg.norm(X - cols) / np.linalg.norm(cols) < 1e-12
    assert np.linalg.norm(P @ X - B) / np.linalg.norm(B) < 1e-10


def test_ozaki_refinement_matches_csr_refinement():
    """Production accuracy gate for the Ozaki MXU refinement matvecs
    (solvers/arnoldi._apply_P_ozaki): a banded solve-op whose ozP is the
    Ozaki-packed exact operator must refine to the same answer as the CSR
    gather path, and the packed SpMM itself must agree with the exact
    operator product at the documented ~1e-9 relative floor.  (On the CPU
    test backend the XLA reference kernel runs; the Pallas kernel computes
    the identical chunk algebra on TPU.)"""
    import jax.numpy as jnp

    from helmholtz_x_tpu.ops.cplx import Z
    from helmholtz_x_tpu.ops.ozaki import ozaki_spmm, pack_ozaki_band_device
    from helmholtz_x_tpu.solvers.arnoldi import _apply_P, _solve_wbb

    rng = np.random.default_rng(7)
    n, k = 700, 5
    A = _random_banded(n, rng)
    f = BandedShiftedFactor(A, nb=64)
    # attach CSR terms manually (BandedShiftedFactor built without terms)
    from helmholtz_x_tpu.ops.csr import csr_device, csr_empty, csr_from_scipy

    f._tA = csr_from_scipy(A)
    f._tB, f._cb = None, 0.0
    f._tC, f._cc = csr_from_scipy(sp.identity(n) * 0), 0.0
    sv = f.solve_op()
    assert sv.ozP is None  # CPU backend: no device pack by default

    band, W, nbk, nbkp = pack_ozaki_band_device(
        A, np.asarray(f._perm), nb=int(f.fac.nb), K=6,
        nbkp=int(f.fac.band_re.shape[0]), W=int(f.fac.W))
    sv_oz = sv._replace(ozP=band)

    X = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    xz = Z(jnp.asarray(X.real), jnp.asarray(X.imag))
    # 1) the packed SpMM reproduces the exact operator product
    y_oz = _apply_P(sv_oz, xz)
    y_ex = np.asarray(A @ X)
    got = np.asarray(y_oz.re) + 1j * np.asarray(y_oz.im)
    rel = np.linalg.norm(got - y_ex) / np.linalg.norm(y_ex)
    assert rel < 1e-8, rel

    # 2) refined solves through either matvec agree with scipy
    b = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    bz = Z(jnp.asarray(b.real), jnp.asarray(b.imag))
    x_csr = _solve_wbb(sv, bz, 3)
    x_oz = _solve_wbb(sv_oz, bz, 3)
    xs = np.linalg.inv(A.toarray()) @ b
    for got_z in (x_csr, x_oz):
        g = np.asarray(got_z.re) + 1j * np.asarray(got_z.im)
        assert np.linalg.norm(A @ g - b) / np.linalg.norm(b) < 1e-9
        assert np.linalg.norm(g - xs) / np.linalg.norm(xs) < 1e-8


def test_host_adjoint_factor_reuse():
    """HostAdjointFactor: P_adj = P^H solves reuse the base SuperLU
    factorization with swapped transpose flags, exactly."""
    import scipy.sparse as sp

    from helmholtz_x_tpu.solvers.linsolve import (HostAdjointFactor,
                                                  SparseShiftedFactor)

    rng = np.random.default_rng(5)
    n = 300
    A = _random_banded(n, rng)
    base = SparseShiftedFactor(A)
    adj = HostAdjointFactor(base, A.conj().T.tocsr())
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = adj.solve_P(b)
    assert np.linalg.norm(A.conj().T @ x - b) / np.linalg.norm(b) < 1e-12
    xh = adj.solve_P_H(b)
    assert np.linalg.norm(A @ xh - b) / np.linalg.norm(b) < 1e-12
    # Woodbury path through the view
    k = 2
    L = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    R = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    s = 0.4 + 0.1j
    adj.set_lowrank_factors(L, R, two_sided=True)
    adj.set_scale(s)
    M = (A.conj().T - s * sp.csr_matrix(L @ R.T)).tocsr()
    y = adj.solve_wb(b)
    assert np.linalg.norm(M @ y - b) / np.linalg.norm(b) < 1e-10
