"""I/O parity: write_xdmf_mesh (.msh -> XDMF pair) round-trips through
XDMFReader; vtk_writer / xdmf_writer emit ParaView-consumable files;
dict_writer/dict_loader round-trip (reference: helmholtz_x/io_utils.py)."""

import os

import numpy as np

from helmholtz_x_tpu.mesh.msh import read_msh
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_xdmf_mesh
from helmholtz_x_tpu.utils.io import dict_loader, dict_writer, vtk_writer, xdmf_writer

CASE = "/root/reference/numerical_examples/Longitudinal/NetworkCode/RijkeTube2D/MeshDir"


def test_write_xdmf_mesh_roundtrip(tmp_path):
    src = CASE + "/mesh.msh"
    dst = str(tmp_path / "mesh")
    with open(src) as f:
        data = f.read()
    with open(dst + ".msh", "w") as f:
        f.write(data)
    m0 = read_msh(src)
    write_xdmf_mesh(dst)
    m1 = XDMFReader(dst).mesh
    assert m1.num_cells == m0.num_cells
    assert m1.num_vertices == m0.num_vertices
    assert np.array_equal(m1.cells, m0.cells)
    assert np.array_equal(m1.facet_tag_values, m0.facet_tag_values)
    assert np.allclose(m1.points[:, : m0.gdim], m0.points)
    assert np.array_equal(m1.cell_tag_values, m0.cell_tag_values)


def test_vtk_and_xdmf_function_writers(tmp_path):
    mesh = read_msh(CASE + "/mesh.msh")
    vals = np.linspace(0, 1, mesh.num_vertices) + 1j * np.ones(mesh.num_vertices)
    vtk_writer(str(tmp_path / "p"), mesh, vals)
    txt = open(tmp_path / "p.vtk").read()
    assert "UNSTRUCTURED_GRID" in txt and "p_real" in txt and "p_imag" in txt
    assert f"POINTS {mesh.num_vertices} double" in txt
    xdmf_writer(str(tmp_path / "p"), mesh, vals)
    assert os.path.exists(tmp_path / "p.xdmf") and os.path.exists(tmp_path / "p.h5")


def test_dict_roundtrip(tmp_path):
    d = {"omega_1": 3253.75 + 472.57j, "omega_2": 3248.70 + 452.11j}
    base = str(tmp_path / "eigs")
    dict_writer(base, d)
    assert dict_loader(base) == d
