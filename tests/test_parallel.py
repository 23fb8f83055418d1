"""Sharded-operator tests on the 8-virtual-device CPU mesh: the distributed
SpMV/GMRES step must agree with the serial (scipy) computation."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from helmholtz_x_tpu.parallel.dist import (
    AXIS,
    make_dist_gmres_step,
    partition_csr,
    shard_vector,
)


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), (AXIS,))


def test_dist_step_matches_serial(mesh8):
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 97  # deliberately not a multiple of 8
    # complex sparse 'shifted' operator (diagonally dominant so GMRES(8) bites)
    A = sp.random(n, n, density=0.08, random_state=5).tocsr()
    A = A + A.T + sp.eye(n) * 8.0
    A = A.astype(np.complex128)
    A = A + 1j * sp.eye(n) * 0.5
    C = sp.eye(n, format="csr", dtype=np.complex128)

    # pad to n_pad with identity rows so the padded dofs stay decoupled
    n_dev = 8
    n_local = -(-n // n_dev)
    n_pad = n_local * n_dev
    Ap = sp.lil_matrix((n_pad, n_pad), dtype=np.complex128)
    Ap[:n, :n] = A
    for i in range(n, n_pad):
        Ap[i, i] = 1.0
    Cp = sp.lil_matrix((n_pad, n_pad), dtype=np.complex128)
    Cp[:n, :n] = C

    with mesh8:
        A_sh, n_pad2, n_loc = partition_csr(Ap.tocsr(), n_dev, mesh8)
        C_sh, _, _ = partition_csr(Cp.tocsr(), n_dev, mesh8)
        assert n_pad2 == n_pad and n_loc == n_local
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        xz = shard_vector(x, n_pad, n_dev, mesh8)
        step = make_dist_gmres_step(mesh8, A_sh, C_sh, n_local, n_dev, m_krylov=10)
        zre, zim, rq_r, rq_i = step(A_sh, C_sh, xz.re, xz.im)
        z = (np.asarray(zre) + 1j * np.asarray(zim)).ravel()[:n]

    # serial reference: GMRES(10) from scipy on the same system
    b = np.zeros(n_pad, dtype=np.complex128)
    b[:n] = C @ x
    from scipy.sparse.linalg import gmres as scipy_gmres

    z_ref, _ = scipy_gmres(Ap.tocsr(), b, rtol=1e-12, restart=10, maxiter=1)
    z_ref = z_ref[:n]
    z_ref /= np.linalg.norm(z_ref)

    # same Krylov space, same iteration count -> same direction
    z /= np.linalg.norm(z)
    align = abs(np.vdot(z, z_ref))
    assert align > 1 - 1e-8, f"distributed step diverged from serial: {align}"

    # Rayleigh quotient should match <z, Az>/<z, z>
    rq = complex(rq_r, rq_i)
    zfull = np.zeros(n_pad, dtype=np.complex128)
    zfull[:n] = z
    rq_ref = np.vdot(zfull, Ap.tocsr() @ zfull) / np.vdot(zfull, zfull)
    assert abs(rq - rq_ref) / abs(rq_ref) < 1e-8


def test_dist_eigensolve_matches_serial(mesh8):
    """Serial vs sharded eigenvalue equality — the SURVEY §4 multi-device
    correctness gate — on the 1D Rijke passive pencil."""
    import numpy as np

    from helmholtz_x_tpu.mesh import one_dimensional_setup
    from helmholtz_x_tpu.fem.fields import c_step
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.solvers.arnoldi import eps_solver
    from helmholtz_x_tpu.parallel.eigensolve import dist_eps_solve

    mesh = one_dimensional_setup(300)
    c = c_step(mesh, np.array([[0.25, 0, 0]]), 338.67, 338.67)
    matrices = AcousticMatrices(mesh, {1: {"Neumann"}, 2: {"Neumann"}}, c)
    target = 200 * 2 * np.pi
    E = eps_solver(matrices.A, matrices.C, target, nev=2)
    serial = E.getEigenvalue(0)

    lams, _ = dist_eps_solve(matrices.A.to_scipy(), matrices.C.to_scipy(),
                             target, mesh8, 8, nev=1)
    assert abs(lams[0] - serial) / abs(serial) < 1e-7, (lams[0], serial)
