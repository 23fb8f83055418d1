"""Production multi-chip gates: the distributed resolvent-projection FPI on
the 8-virtual-device CPU mesh must reproduce the serial eigenvalues to 1e-8
(the reference's serial-vs-`mpirun` log-equality check, SURVEY §4), and the
halo-exchange SpMV must agree with scipy."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from helmholtz_x_tpu.parallel.dist import AXIS


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), (AXIS,))


def _rijke1d(n_elem=300):
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (gaussian_function, rho_step,
                                            temperature_step)
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
    mesh = one_dimensional_setup(n_elem)
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


def test_halo_spmv_matches_scipy(mesh8):
    import scipy.sparse as sp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from helmholtz_x_tpu.parallel.dist import shard_vector
    from helmholtz_x_tpu.parallel.halo import halo_spmv, partition_halo_csr

    rng = np.random.default_rng(11)
    n, bw = 101, 7  # banded complex matrix, n not a multiple of 8
    diags = [rng.standard_normal(n - abs(o)) + 1j * rng.standard_normal(n - abs(o))
             for o in range(-bw, bw + 1)]
    A = sp.diags(diags, range(-bw, bw + 1)).tocsr()
    n_dev = 8
    n_local = -(-n // n_dev)
    n_pad = n_local * n_dev
    Ap = sp.lil_matrix((n_pad, n_pad), dtype=np.complex128)
    Ap[:n, :n] = A
    Ap = Ap.tocsr()
    with mesh8:
        H_sh, _, n_loc, hw = partition_halo_csr(Ap, n_dev, mesh8)
        assert 0 < hw <= bw
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        xz = shard_vector(x, n_pad, n_dev, mesh8)

        def body(Hb, xr, xi):
            yr, yi = halo_spmv(Hb, xr[0], xi[0], hw, n_loc, n_dev)
            return yr[None], yi[None]

        fn = jax.jit(shard_map(
            body, mesh=mesh8,
            in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None)), check_vma=False))
        yr, yi = fn(H_sh, xz.re, xz.im)
    y = (np.asarray(yr) + 1j * np.asarray(yi)).ravel()[:n]
    ref = A @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-13


def test_dist_fpi_eps_matches_serial(mesh8):
    """Sharded active FPI (eps path, Neumann BCs) == serial to 1e-8."""
    from helmholtz_x_tpu.parallel.fpi import dist_projected_fpi
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    matrices, D = _rijke1d()
    target = 200 * 2 * np.pi
    E_ser = fixed_point_iteration(matrices, D, target, nev=2, i=0)
    om_ser = np.sqrt(E_ser.getEigenvalue(0))

    E_dist = dist_projected_fpi(matrices, D, target, mesh8, 8, nev=2, i=0)
    assert E_dist is not None, "distributed projection path fell back"
    om_dist = np.sqrt(E_dist.getEigenvalue(0))
    assert abs(om_dist - om_ser) / abs(om_ser) < 1e-8, (om_dist, om_ser)


def test_dist_fpi_pep_matches_serial(mesh8):
    """Sharded quadratic-pencil FPI (Robin BCs -> B present) == serial,
    on the PRF nondimensional case (same constants as test_prf1d)."""
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import (Field, c_step, density_step,
                                            gaussian_function,
                                            temperature_step)
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh import one_dimensional_setup
    from helmholtz_x_tpu.parallel.fpi import dist_projected_fpi
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
    from tests import test_prf1d as prf

    mesh = one_dimensional_setup(300)
    x_f, x_r = prf.x_f, prf.x_r
    bcs = {1: {"Robin": prf.R_in}, 2: {"Robin": prf.R_out}}
    c = c_step(mesh, x_f, prf.c_u, prf.c_d)
    matrices = AcousticMatrices(mesh, bcs, c)
    FTF = nTau(prf.n_ftf, prf.tau)
    rho = Field(density_step(mesh.points[:, 0], x_f[0][0], prf.a_f,
                             prf.rho_d, prf.rho_u), "rho")
    T = temperature_step(mesh, x_f, prf.T_u, prf.T_d)
    w = gaussian_function(mesh, x_r, prf.a_r)
    h = gaussian_function(mesh, x_f, prf.a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, prf.q_0, prf.u_b, FTF,
                               gamma=prf.gamma)
    D.assemble_submatrices()

    E_ser = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0)
    om_ser = E_ser.getEigenvalue(0)

    E_dist = dist_projected_fpi(matrices, D, np.pi, mesh8, 8, nev=2, i=0)
    assert E_dist is not None, "distributed projection path fell back"
    om_dist = E_dist.getEigenvalue(0)
    assert abs(om_dist - om_ser) / abs(om_ser) < 1e-8, (om_dist, om_ser)


@pytest.mark.slow
def test_dist_fpi_micca_3d(mesh8):
    """Sharded 3D gate at REPRESENTATIVE scale: the MICCA full-annulus
    active FPI (34,787 dofs, 16-burner rank-16 flame, quadratic pencil) over
    the 8-device mesh.  The halo layout must engage (real RCM bandwidth 897
    fits one 4,349-row block) with the RAS preconditioner, and the converged
    eigenvalue must match the reference's committed value
    (fullAnnulus/Results/Active/FPI/active.log) — the same 1e-6 gate the
    serial tests (test_micca_full) pass, proving serial == sharded."""
    import sys

    from helmholtz_x_tpu.parallel.fpi import DistShiftedSolver, \
        dist_projected_fpi

    sys.path.insert(0, "/root/repo/tests")
    from test_micca_full import _build

    mesh, matrices, D = _build("direct")
    target = 3225.120 + 481.0j
    E = dist_projected_fpi(matrices, D, target, mesh8, 8, nev=4, i=0,
                           m=48, inner_tol=1e-8)
    assert E is not None, "distributed projection path fell back"
    lam = sorted([E.getEigenvalue(0), E.getEigenvalue(1)],
                 key=lambda z: -z.imag)[0]
    expected = 3253.754657 + 472.569066j
    assert abs(lam - expected) / abs(expected) < 1e-6, lam


@pytest.mark.slow
def test_dist_solver_micca_layout(mesh8):
    """The MICCA operator's sharded solver must engage the halo layout with
    the RAS preconditioner (not the all_gather fallback) — structural check
    split out of the full convergence gate."""
    import sys

    from helmholtz_x_tpu.parallel.fpi import DistShiftedSolver

    sys.path.insert(0, "/root/repo/tests")
    from test_micca_full import CASE, gamma, r_gas, T_amb, T_a, T_b, l_cc, \
        R_outlet
    from tests_micca_common import axial_sound_speed_dg0

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader

    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed_dg0(mesh, gamma, r_gas, T_amb, T_a, T_b, l_cc)
    matrices = AcousticMatrices(mesh, {11: {"Robin": R_outlet}}, c)
    sigma = complex(3225.120 + 481.0j)
    P = (matrices.A.to_scipy() + sigma * matrices.B.to_scipy()
         + sigma**2 * matrices.C.to_scipy())
    solver = DistShiftedSolver(P, mesh8, 8, m_krylov=40, inner_tol=1e-8)
    assert solver.layout == "halo", solver.layout
    assert solver.pc_kind == "ras", solver.pc_kind
    assert 0 < solver.hw <= solver.n_local
    rng = np.random.default_rng(3)
    B = rng.standard_normal((P.shape[0], 4)) \
        + 1j * rng.standard_normal((P.shape[0], 4))
    X = solver.solve_block(B)
    rel = np.linalg.norm(P @ X - B) / np.linalg.norm(B)
    assert rel < 1e-7, rel
