"""Native annular-sector mesh generation + Bloch round trip.

The reference generates its annular geometries with gmsh OCC + mirrored
periodic meshing (AnnularCombustor/Micca/bloch/generateMesh.py:374-392,
Master tag 12 / Slave tag 13); gmsh is not a dependency here, so
mesh/generate.annular_sector_tet provides the parametric sector natively
and mesh/stitch.rotational_stitch revolves it into the full annulus.
These tests gate both: tag layout + exact slave-is-rotated-master node
property, and the Bloch-reduced eigenvalue against the stitched
full-annulus oracle (the same machine-checked pattern as
test_bloch_stitched.py).
"""

import numpy as np
import pytest

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.bloch import Blochifier
from helmholtz_x_tpu.fem.fields import c_uniform
from helmholtz_x_tpu.mesh.generate import annular_sector_tet
from helmholtz_x_tpu.mesh.stitch import rotational_stitch
from helmholtz_x_tpu.solvers.arnoldi import eps_solver

N = 16
R_IN, R_OUT, LEN = 0.15, 0.20, 0.20  # the MICCA combustion-chamber annulus


def test_sector_structure():
    sector = annular_sector_tet(R_IN, R_OUT, LEN, n_sectors=N)
    pts = sector.points
    th = 2 * np.pi / N
    # reference tag conventions: 12 = master (phi=0), 13 = slave (phi=th)
    m = np.unique(sector.facets_with_tag(12))
    s = np.unique(sector.facets_with_tag(13))
    assert len(m) == len(s) > 0
    assert np.allclose(pts[m][:, 1], 0.0, atol=1e-14)
    # slave node set is EXACTLY the master set rotated by the sector angle
    c, s_ = np.cos(th), np.sin(th)
    rot = pts[m] @ np.array([[c, s_, 0], [-s_, c, 0], [0, 0, 1.0]])
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))  # noqa: E731
    assert np.allclose(rot[key(rot)], pts[s][key(pts[s])], atol=1e-12)
    # volume = sector of the analytic annulus (polar grid: exact in r, z;
    # chordal in phi)
    vol = sector.cell_volumes().sum()
    exact = 0.5 * th * (R_OUT**2 - R_IN**2) * LEN
    assert abs(vol - exact) / exact < 0.01


@pytest.mark.slow
def test_native_sector_bloch_equals_stitched_annulus():
    """Bloch-reduced b=1 eigenvalue on the native sector == the stitched
    full annulus's corresponding azimuthal doublet (uniform c passive
    pencil; the analytic mode is ~ c/r_mid for m=1)."""
    sector = annular_sector_tet(R_IN, R_OUT, LEN, n_sectors=N,
                                nr=3, nphi=5, nz=12)
    c0 = 340.0
    bcs = {1: "Neumann", 2: "Neumann", 3: "Neumann", 4: "Neumann",
           12: "Master", 13: "Slave"}
    mat_s = AcousticMatrices(sector, bcs, c_uniform(sector, c0))
    bloch = Blochifier(geometry=sector, boundary_conditions=bcs, N=N,
                       passive_matrices=mat_s)
    # analytic azimuthal m=1 mode of a thin annulus ~ c/r_mid ~ 1943 rad/s
    Es = eps_solver(bloch.A, bloch.C, 1900.0, nev=3, mmax=120)
    om_sector = np.sqrt(Es.getEigenvalue(0))

    full = rotational_stitch(sector, N, drop_facet_tags=(12, 13))
    mat_f = AcousticMatrices(full, {t: {"Neumann"} for t in (1, 2, 3, 4)},
                             c_uniform(full, c0))
    Ef = eps_solver(mat_f.A, mat_f.C, om_sector.real, nev=6)
    got = np.sqrt([Ef.getEigenvalue(k) for k in range(Ef.nconv)])
    d = np.abs(got - om_sector) / abs(om_sector)
    # b=+-1 is a degenerate doublet on the full annulus
    assert (d < 1e-8).sum() >= 2, (om_sector, got)
