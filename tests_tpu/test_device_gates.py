"""Production device-tier gates on real TPU hardware (run ALONE).

Promotes tools/probe_micca_tpu.py / probe_flamedduct_tpu.py into automated
gates: the banded+Ozaki production solve must (a) actually run on a device
tier, (b) reproduce the reference eigenvalues at 1e-6, and the Pallas
double-single / Ozaki kernels must deliver their f64-class accuracy — none
of which "passes on CPU" certifies (XLA-CPU rewrites compensated
arithmetic; BENCH_NOTES round 4).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

OMEGA_MICCA = 3253.754657 + 472.569066j  # fullAnnulus FPI active.log
OMEGA_DUCT = 1649.695869 - 43.234201j    # FlamedDuct active.log


def _micca_setup():
    from scipy.io import loadmat

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import q_multiple
    from helmholtz_x_tpu.flame import PointwiseFlameMatrix
    from helmholtz_x_tpu.ftf import stateSpace
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from tests_micca_common import axial_sound_speed_dg0, cyl2cart

    CASE = ("/root/reference/numerical_examples/AnnularCombustor/Micca/"
            "fullAnnulus")
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed_dg0(mesh, 1.4, 287.0, 300.0, 1521.0, 1200.0, 0.2)
    matrices = AcousticMatrices(mesh, {11: {"Robin": -0.875 - 0.2j}}, c)
    mat = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
    h = q_multiple(mesh, 16)
    x_r = np.array([cyl2cart(0.175, i * np.deg2rad(22.5), -0.02)
                    for i in range(16)])
    D = PointwiseFlameMatrix(mesh, None, x_r, h, 101325.0 / (287.0 * 300.0),
                             2080.0, 0.66, FTF)
    return mesh, matrices, D


@pytest.mark.parametrize("problem_type,sign", [("direct", 1), ("adjoint", -1)])
def test_micca_banded_production_solve(device, record_gate, problem_type,
                                       sign):
    """The headline path: banded device LU + Ozaki-refined block-Krylov
    basis + projected FPI, on hardware, gated at 1e-6 and gated on the
    TIER actually being a device tier (not the host degradation)."""
    from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
    from helmholtz_x_tpu.solvers.linsolve import build_shifted_factor

    mesh, matrices, D = _micca_setup()
    D.assemble_submatrices(problem_type)
    expected = OMEGA_MICCA.real + sign * 1j * OMEGA_MICCA.imag
    t0 = time.perf_counter()
    E = fixed_point_iteration(matrices, D, 3225.120 + sign * 481.0j, i=0,
                              nev=4, tol=1e-8, problem_type=problem_type)
    wall = time.perf_counter() - t0
    tier = getattr(build_shifted_factor, "last_tier", "?")
    om1, _ = normalize_eigenvector(mesh, E, 0)
    om2, _ = normalize_eigenvector(mesh, E, 1)
    got = sorted([om1, om2], key=lambda z: -sign * z.imag)[0]
    rel = abs(got - expected) / abs(expected)
    record_gate(gate=f"micca_{problem_type}", omega=[got.real, got.imag],
                rel=rel, tier=tier, wall_s=round(wall, 2),
                backend=jax.default_backend())
    assert "banded" in tier, f"expected the device tier, ran on {tier!r}"
    assert rel < 1e-6, (got, expected, rel)


def test_flamedduct_banded_production_solve(device, record_gate):
    """Rank-1 split-basis device path (choked BCs, quadratic pencil)."""
    import test_flamedduct as fd

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
    from helmholtz_x_tpu.fem.fields import (gaussian_function,
                                            half_gaussian_function, rho_ideal,
                                            temperature_step)
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
    from helmholtz_x_tpu.solvers.linsolve import build_shifted_factor

    mesh = XDMFReader(fd.CASE + "/MeshDir/mesh").mesh
    T = temperature_step(mesh, fd.x_flame, fd.T_passive, fd.T_flame)
    matrices = AcousticMatrices(mesh, fd.bcs, T)
    rho = rho_ideal(T, fd.p_gas, fd.r_gas)
    w = gaussian_function(mesh, fd.x_ref, fd.a_ref)
    h = half_gaussian_function(mesh, fd.x_flame, fd.a_flame)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, fd.q_0, fd.u_b,
                               nTau(fd.n_ftf, fd.tau))
    D.assemble_submatrices()
    t0 = time.perf_counter()
    E = fixed_point_iteration(matrices, D, 250 * 2 * np.pi, nev=2)
    wall = time.perf_counter() - t0
    tier = getattr(build_shifted_factor, "last_tier", "?")
    omega, _ = normalize_eigenvector(mesh, E, 0)
    rel = abs(omega - OMEGA_DUCT) / abs(OMEGA_DUCT)
    record_gate(gate="flamedduct", omega=[omega.real, omega.imag], rel=rel,
                tier=tier, wall_s=round(wall, 2))
    assert "banded" in tier, f"expected the device tier, ran on {tier!r}"
    assert rel < 1e-6, (omega, rel)


def test_pallas_ds_f64_accuracy_on_hardware(device, record_gate):
    """The double-single band matvec must deliver f64-class accuracy ON
    HARDWARE (Mosaic preserves IEEE f32; XLA-CPU does not)."""
    from helmholtz_x_tpu.ops.banded import build_band
    from helmholtz_x_tpu.ops.pallas_band import band_matvec_pallas_ds
    from test_pallas_ds import _banded_problem

    a, x = _banded_problem()
    n = a.shape[0]
    band_re, band_im, W, nbk, nbkp, npad = build_band(a, np.arange(n), 128)
    xp = np.zeros(npad, complex)
    xp[:n] = x
    yre, yim = band_matvec_pallas_ds(jnp.asarray(band_re),
                                     jnp.asarray(band_im),
                                     jnp.asarray(xp.real),
                                     jnp.asarray(xp.imag), W, 128, nbkp)
    y = np.asarray(yre)[:n] + 1j * np.asarray(yim)[:n]
    rel = np.linalg.norm(y - a @ x) / np.linalg.norm(a @ x)
    record_gate(gate="pallas_ds", rel=float(rel))
    assert rel < 1e-12, rel


def test_ozaki_spmm_f64_accuracy_on_hardware(device, record_gate):
    """The Ozaki bf16 MXU SpMM (the production refinement matvec) vs the
    exact host product on the real MICCA shifted operator."""
    import scipy.sparse as sp

    from helmholtz_x_tpu.native import rcm
    from helmholtz_x_tpu.ops.cplx import Z
    from helmholtz_x_tpu.ops.ozaki import ozaki_spmm, pack_ozaki_band_device

    mesh, matrices, D = _micca_setup()
    sigma = complex(3225.120 + 481.0j)
    P = (matrices.A.to_scipy() + sigma * matrices.B.to_scipy()
         + sigma**2 * matrices.C.to_scipy()).tocsr()
    pattern = sp.csr_matrix((np.ones(P.nnz), P.indices, P.indptr),
                            shape=P.shape)
    sym = ((pattern + pattern.T) > 0).astype(np.float64).tocsr()
    perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
    nb = 256
    band, W, nbk, nbkp = pack_ozaki_band_device(P, perm, nb=nb, K=6)
    npad = nbkp * nb
    rng = np.random.default_rng(3)
    nrhs = 8
    x = rng.standard_normal((P.shape[0], nrhs)) \
        + 1j * rng.standard_normal((P.shape[0], nrhs))
    # permute rows into banded order: padded[i] = x[perm_pad[i]] (zeros on
    # the padding dofs)
    perm_pad = np.concatenate([perm, np.arange(P.shape[0], npad)])
    xfull = np.zeros((npad, nrhs), complex)
    xfull[: P.shape[0]] = x
    xp = xfull[perm_pad]
    y = ozaki_spmm(band, Z(jnp.asarray(xp.real), jnp.asarray(xp.imag)),
                   W, nb, nbkp)
    iperm = np.empty(npad, dtype=np.int64)
    iperm[perm_pad] = np.arange(npad)
    yh = (np.asarray(y.re) + 1j * np.asarray(y.im))[iperm][: P.shape[0]]
    yref = P @ x
    rel = np.linalg.norm(yh - yref) / np.linalg.norm(yref)
    record_gate(gate="ozaki_spmm", rel=float(rel), nrhs=nrhs)
    assert rel < 1e-8, rel
