"""Gmsh .msh reader vs the XDMF path on the committed RijkeTube2D mesh:
identical cell/facet counts, identical geometry (up to vertex permutation),
identical passive eigenvalue."""

import numpy as np

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
