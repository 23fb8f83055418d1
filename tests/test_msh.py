"""Gmsh .msh reader vs the XDMF path on the committed RijkeTube2D mesh:
identical cell/facet counts, identical geometry (up to vertex permutation),
identical passive eigenvalue."""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh.msh import read_msh
from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import c_step
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector

CASE = "/root/reference/numerical_examples/Longitudinal/NetworkCode/RijkeTube2D/MeshDir"


def _passive_omega(mesh):
    gamma, p_amb, rho_u = 1.4, 1e5, 1.22
    c_u = np.sqrt(gamma * p_amb / rho_u)
    bcs = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}
    c = c_step(mesh, np.array([[0.25, 0.0, 0.0]]), c_u, c_u)
    matrices = AcousticMatrices(mesh, bcs, c)
    E = eps_solver(matrices.A, matrices.C, 200 * 2 * np.pi, nev=2)
    omega, _ = normalize_eigenvector(mesh, E, 0, print_eigs=False)
    return omega


def test_msh_matches_xdmf():
    m_msh = read_msh(CASE + "/mesh.msh")
    m_x = XDMFReader(CASE + "/mesh").mesh
    assert m_msh.dim == 2
    assert m_msh.num_cells == m_x.num_cells == 1234
    assert m_msh.num_vertices == m_x.num_vertices
    assert len(m_msh.facets) == len(m_x.facets)
    # same point cloud up to permutation
    a = np.sort(np.round(m_msh.points, 10).view([("x", float), ("y", float)]),
                order=["x", "y"], axis=0)
    b = np.sort(np.round(m_x.points, 10).view([("x", float), ("y", float)]),
                order=["x", "y"], axis=0)
    assert np.array_equal(a, b)
    om1 = _passive_omega(m_msh)
    om2 = _passive_omega(m_x)
    assert abs(om1 - om2) / abs(om2) < 1e-10, (om1, om2)


def test_generated_cylinder_roundtrip_ascii_and_binary(tmp_path):
    """Lm-layer pipeline: generate the RijkeTube3D cylinder natively, write
    gmsh .msh 4.1 in BOTH ASCII and binary, read both back, and check
    full geometric/topological equality (reference generateMesh.py needs
    gmsh+OCC for the same geometry)."""
    import numpy as np

    from helmholtz_x_tpu.mesh.generate import cylinder_tet, write_msh41
    from helmholtz_x_tpu.mesh.msh import read_msh

    m = cylinder_tet(0.047 / 2, 1.0, nr=2, nz=10)
    for binary in (False, True):
        p = str(tmp_path / f"gen_{binary}.msh")
        write_msh41(p, m, binary=binary)
        m2 = read_msh(p)
        assert m2.num_cells == m.num_cells
        assert m2.num_vertices == m.num_vertices
        assert np.allclose(m2.points, m.points)
        assert np.array_equal(np.sort(m2.cells, 1), np.sort(m.cells, 1))
        assert len(m2.facets) == len(m.facets)
        assert np.array_equal(np.sort(m2.facet_tag_values),
                              np.sort(m.facet_tag_values))


def test_generated_cylinder_mesh_quality():
    """Conformity invariants of the native tet mesher: positive volumes,
    every interior face shared exactly twice, every boundary face tagged."""
    import numpy as np

    from helmholtz_x_tpu.mesh.generate import cylinder_tet

    m = cylinder_tet(0.5, 2.0, nr=3, nz=8)
    pts, cells = m.points, m.cells
    a = pts[cells[:, 1]] - pts[cells[:, 0]]
    b = pts[cells[:, 2]] - pts[cells[:, 0]]
    c = pts[cells[:, 3]] - pts[cells[:, 0]]
    vol = np.einsum("ij,ij->i", np.cross(a, b), c) / 6
    assert vol.min() > 0
    # 18-gon cross-section area ratio vs the true circle
    poly = 0.5 * 18 * np.sin(2 * np.pi / 18) / (2 * np.pi / 2)
    assert abs(vol.sum() - np.pi * 0.25 * 2 * poly) < 1e-12
    faces = {}
    for tet in cells:
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            k = tuple(sorted(tet[list(f)]))
            faces[k] = faces.get(k, 0) + 1
    nb = sum(1 for v in faces.values() if v == 1)
    assert set(faces.values()) == {1, 2}
    assert nb == len(m.facets)


@pytest.mark.slow
def test_generated_rijke3d_solves_to_reference():
    """End-to-end Lm gate: regenerate the RijkeTube3D case mesh with the
    native mesher (reference geometry: gmsh OCC cylinder d=0.047, L=1,
    lc=1e-2 -> 8,530 tets; ours: structured 7,200 tets) and run the active
    FPI.  Eigenvalues are mesh-dependent at the 1e-3 level (the reference's
    own 1D/2D/3D values span 1242.2-1247.4), so the gate is 2e-3 relative
    vs the committed reference-mesh value plus a 1e-8 self-consistency
    check of the converged FPI."""
    import numpy as np

    import test_rijke_2d3d as t3
    from helmholtz_x_tpu.mesh.generate import cylinder_tet

    m = cylinder_tet(0.047 / 2, 1.0, nr=2, nz=100)
    omega = t3._active(m, np.array([[0.0, 0.0, 0.25]]),
                       np.array([[0.0, 0.0, 0.20]]), 0.1, 200 * 2 * np.pi,
                       passive_param="c")
    expected = 1247.436923 + 6.827640j  # reference unstructured-mesh value
    assert abs(omega - expected) / abs(expected) < 2e-3, omega
