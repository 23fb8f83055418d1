"""Stitched-annulus oracle for the Bloch reduction.

The Bloch gates in test_micca_bloch.py are pinned to THIS framework's
geometric master/slave pairing, which deviates from the reference's
index-order pairing (reference bloch_operator.py:29-38).  This test carries
the proof in-repo: build the explicit 16-copy rotationally-stitched annulus
from the committed sector mesh, solve the FULL problem (no Bloch reduction),
and assert it reproduces the sector-reduced eigenvalues — machine-checked,
not comment-claimed.
"""

import numpy as np
import pytest
from scipy.io import loadmat

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.bloch import Blochifier
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.fem.fields import q_multiple
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.ftf import stateSpace
from helmholtz_x_tpu.mesh.stitch import rotational_stitch
from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from test_micca_bloch import (
    CASE,
    R_outlet,
    axial_sound_speed,
    q_0,
    r_f,
    rho_amb,
    theta,
    u_b,
    z_r,
)

N = 16


def _sector():
    return XDMFReader(CASE + "/MeshDir/mesh").mesh


def test_stitch_geometry():
    """Conformity of the stitched annulus: interface vertices merged, volume
    exactly n x sector volume, per-copy facet tags preserved."""
    sector = _sector()
    full = rotational_stitch(sector, N, drop_facet_tags=(12, 13),
                             sector_cell_tag=0)
    # volume is rotation-invariant and additive
    assert np.isclose(full.cell_volumes().sum(),
                      N * sector.cell_volumes().sum(), rtol=1e-12)
    # interfaces merged: strictly fewer than n x nv vertices, and every
    # vertex id is used by some cell (no orphans)
    assert full.num_vertices < N * sector.num_vertices
    assert np.unique(full.cells).size == full.num_vertices
    # master/slave facets dropped, outlet facets replicated n times
    assert not np.isin(full.facet_tag_values, (12, 13)).any()
    n11 = (sector.facet_tag_values == 11).sum()
    assert (full.facet_tag_values == 11).sum() == N * n11
    # 16 per-sector flame subdomains of equal cell count
    counts = [len(full.cells_with_tag(k)) for k in range(N)]
    assert counts == [len(sector.cells_with_tag(0))] * N


@pytest.mark.slow
def test_stitched_annulus_passive():
    """Sector Bloch reduction == explicit full annulus (passive pencil)."""
    sector = _sector()
    bcs = {t: "Neumann" for t in range(1, 12)}
    bcs[12], bcs[13] = "Master", "Slave"
    mat_s = AcousticMatrices(sector, bcs, axial_sound_speed(sector))
    bloch = Blochifier(geometry=sector, boundary_conditions=bcs, N=N,
                       passive_matrices=mat_s)
    Es = eps_solver(bloch.A, bloch.C, 3000.0, nev=3, mmax=160)
    om_sector = np.sqrt(Es.getEigenvalue(0))

    full = rotational_stitch(sector, N, drop_facet_tags=(12, 13))
    mat_f = AcousticMatrices(full, {1: {"Neumann"}}, axial_sound_speed(full))
    Ef = eps_solver(mat_f.A, mat_f.C, om_sector.real, nev=6)
    got = np.sqrt([Ef.getEigenvalue(k) for k in range(Ef.nconv)])
    d = np.abs(got - om_sector) / abs(om_sector)
    # the b=+-1 azimuthal mode appears as a degenerate DOUBLET on the annulus
    assert (d < 1e-8).sum() >= 2, (om_sector, got)


@pytest.mark.slow
def test_stitched_annulus_active():
    """Sector Bloch FPI == full-annulus FPI with 16 explicit pointwise flames.

    This is the oracle behind the pinned gate 3238.692274+500.381371j in
    test_micca_bloch.test_bloch_active (vs the reference log's 3235.145+436.055j
    from index-order dof pairing)."""
    sector = _sector()
    bcs = {t: "Neumann" for t in range(1, 11)}
    bcs[11] = {"Robin": R_outlet}
    bcs[12], bcs[13] = "Master", "Slave"
    mat_s = AcousticMatrices(sector, bcs, axial_sound_speed(sector))
    bloch = Blochifier(geometry=sector, boundary_conditions=bcs, N=N,
                       passive_matrices=mat_s)
    mat = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
    from helmholtz_x_tpu.fem.fields import q_volumetric

    h_s = q_volumetric(sector, 1.0, flame_tag=0)
    D_s = PointwiseFlameMatrix(sector, None,
                               np.array([[r_f, 0.0, z_r]]), h_s, rho_amb,
                               q_0, u_b, FTF, bloch_object=bloch)
    D_s.assemble_submatrices("direct")
    D_s.blochify()
    E_s = fixed_point_iteration(bloch, D_s, 3200 + 500j, nev=3, i=0, tol=1e-8)
    om_sector, _ = normalize_eigenvector(sector, E_s, 0,
                                         BlochRemapper=bloch.remapper)

    full = rotational_stitch(sector, N, drop_facet_tags=(12, 13),
                             sector_cell_tag=0)
    mat_f = AcousticMatrices(full, {11: {"Robin": R_outlet}},
                             axial_sound_speed(full))
    h_f = q_multiple(full, N)
    x_r = np.array([[r_f * np.cos(k * theta), r_f * np.sin(k * theta), z_r]
                    for k in range(N)])
    D_f = PointwiseFlameMatrix(full, None, x_r, h_f, rho_amb, q_0, u_b, FTF)
    D_f.assemble_submatrices("direct")
    E_f = fixed_point_iteration(mat_f, D_f, 3200 + 500j, nev=4, i=0, tol=1e-8)
    om_full, _ = normalize_eigenvector(full, E_f, 0)

    assert abs(om_full - om_sector) / abs(om_sector) < 1e-6, (om_full, om_sector)
    # and both sit on the committed gate value
    exact = 3238.692274 + 500.381371j
    assert abs(om_sector - exact) / abs(exact) < 1e-6, om_sector
