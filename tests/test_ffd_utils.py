"""Unit tests for the FFD utility surface: nonaxisymmetric normalizer, VTU
control-point export, local FFD morphing, and the control-point displacement
field (reference: shape_derivatives_utils.py:38-91, 156-165, 298-318 and
shape_derivatives.py:39-77)."""

import xml.etree.ElementTree as ET

import numpy as np

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.shape import (
    FFDCylindrical,
    deform_mesh_local,
    ffd_displacement_vector,
    nonaxisymmetric_derivatives_normalize,
    write_ffd_points,
)

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"


def _mesh():
    return XDMFReader(CASE + "/MeshDir/Original/mesh").mesh


def test_nonaxisymmetric_normalize():
    d = {0: {0: 2.0 - 8.0j, 1: -4.0 + 1.0j},
         1: {0: 1.0 + 0.5j, 1: 0.0 + 0.0j}}
    n = nonaxisymmetric_derivatives_normalize(d)
    res = [v.real for row in n.values() for v in row.values()]
    ims = [v.imag for row in n.values() for v in row.values()]
    # real and imag scaled independently by their own maxima
    assert np.isclose(max(abs(r) for r in res), 1.0)
    assert np.isclose(max(abs(i) for i in ims), 1.0)
    assert np.isclose(n[0][1].real, -1.0)
    assert np.isclose(n[0][0].imag, -1.0)
    assert np.isclose(n[1][0].real, 0.25)


def test_write_ffd_points(tmp_path):
    mesh = _mesh()
    lattice = FFDCylindrical.from_mesh(mesh, 2, 4, 9)
    path = write_ffd_points(lattice, str(tmp_path / "FFDinitial"))
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == 2 * 4 * 9
    coords = piece.find(".//Points/DataArray").text.split()
    assert len(coords) == 3 * 2 * 4 * 9


def test_deform_mesh_local():
    mesh = _mesh()
    zmax = mesh.points[:, 2].max()
    # lattice over the lower half of the cylinder only
    lower = mesh.points[mesh.points[:, 2] <= 0.5 * zmax]
    lattice = FFDCylindrical(lower, 2, 4, 5)
    lattice.Pr[1, :, 2] += 0.003  # bulge the outer layer mid-height
    new = deform_mesh_local(mesh, lattice)
    moved = np.linalg.norm(new.points - mesh.points, axis=1)
    inside = mesh.points[:, 2] <= 0.5 * zmax + 1e-12
    assert moved[~inside].max() == 0.0  # non-local vertices untouched
    assert moved[inside].max() > 1e-4  # local region morphed
    assert np.array_equal(new.cells, mesh.cells)


def test_ffd_displacement_vector():
    mesh = _mesh()
    lattice = FFDCylindrical.from_mesh(mesh, 2, 4, 9)
    V = ffd_displacement_vector(mesh, lattice, 1, 1, 1, 4)
    surf = np.unique(mesh.facets_with_tag(1))
    off = np.setdiff1d(np.arange(mesh.num_vertices), surf)
    assert np.all(V[off] == 0.0)
    mags = np.linalg.norm(V[surf], axis=1)
    assert mags.max() > 0.0
    # displacement is along the (unit) surface normal scaled by the Bernstein
    # weight, so its magnitude equals the weight
    w = lattice.bernstein_weight(1, 1, 4, mesh.points)[surf]
    nz = mags > 1e-14
    assert np.allclose(mags[nz], np.abs(w[nz]), rtol=1e-6)
