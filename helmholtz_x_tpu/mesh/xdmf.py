"""XDMF + HDF5 mesh reader/writer (the reference's meshio-generated format).

Reads the `mesh.xdmf` / `mesh_tags.xdmf` (+ optional `mesh_edgetags.xdmf`)
pairs the reference commits under every example's MeshDir (reference:
helmholtz_x/io_utils.py:98-218 writes/reads these via meshio + dolfinx).
Implemented directly on h5py + ElementTree — no meshio dependency.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import h5py
import numpy as np

from .core import Mesh

_TOPO_DIM = {
    "Polyvertex": 0,
    "Polyline": 1,
    "Triangle": 2,
    "Tetrahedron": 3,
}


def _read_grid(xdmf_path: str):
    """Return (points, cells, cell_values, topo_dim) from one XDMF grid."""
    tree = ET.parse(xdmf_path)
    grid = tree.getroot().find(".//Grid")
    base = os.path.dirname(os.path.abspath(xdmf_path))

    def load_item(item):
        txt = item.text.strip()
        fname, dset = txt.split(":")
        with h5py.File(os.path.join(base, fname), "r") as f:
            return np.asarray(f[dset])

    geom = grid.find("Geometry")
    points = load_item(geom.find("DataItem"))
    topo = grid.find("Topology")
    ttype = topo.get("TopologyType")
    cells = load_item(topo.find("DataItem")).astype(np.int32)
    values = None
    attr = grid.find("Attribute")
    if attr is not None:
        values = load_item(attr.find("DataItem")).astype(np.int32)
    return points.astype(np.float64), cells, values, _TOPO_DIM[ttype]


class XDMFReader:
    """Geometry loader mirroring the reference's XDMFReader API
    (reference: io_utils.py:161-218): mesh + cell tags + facet tags."""

    def __init__(self, name: str):
        self.name = name
        points, cells, cell_values, dim = _read_grid(name + ".xdmf")
        mesh = Mesh(points=points, cells=cells, dim=dim)
        if cell_values is not None:
            mesh.cell_tag_indices = np.arange(mesh.num_cells, dtype=np.int32)
            mesh.cell_tag_values = cell_values
        tags_file = name + "_tags.xdmf"
        if os.path.exists(tags_file):
            _, facets, fvalues, fdim = _read_grid(tags_file)
            assert fdim == dim - 1, "facet tag mesh dimension mismatch"
            mesh.facets = facets
            mesh.facet_tag_values = (
                fvalues if fvalues is not None else np.zeros(len(facets), np.int32)
            )
        edge_file = name + "_edgetags.xdmf"
        if os.path.exists(edge_file):
            _, edges, evalues, _ = _read_grid(edge_file)
            self.edges = edges
            self.edge_tag_values = evalues
        self._mesh = mesh

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @property
    def dimension(self) -> int:
        return self._mesh.dim

    def getAll(self):
        return self._mesh

    def getInfo(self) -> int:
        n = self._mesh.num_cells
        print("Number of cells:  {:,}".format(n))
        return n


def write_function_xdmf(name: str, mesh: Mesh, values: np.ndarray,
                        field_name: str = "p"):
    """Write a nodal field + mesh as ParaView-compatible XDMF/HDF5
    (reference: io_utils.py:40-60).  Complex fields are written as two
    attributes `<name>_real` / `<name>_imag` (ParaView-friendly)."""
    os.makedirs(os.path.dirname(os.path.abspath(name)) or ".", exist_ok=True)
    h5name = name + ".h5"
    topo_name = {1: "Polyline", 2: "Triangle", 3: "Tetrahedron"}[mesh.dim]
    geom_type = "XY" if mesh.gdim == 2 else ("XYZ" if mesh.gdim == 3 else "X")
    pts = mesh.points
    if mesh.gdim == 1:  # XDMF wants at least 2D coords
        pts = np.concatenate([pts, np.zeros_like(pts)], axis=1)
        geom_type = "XY"
    vals = np.asarray(values)
    if vals.shape[0] > mesh.num_vertices:
        # degree-2 (or higher) field: vertex dofs lead the dof layout, so the
        # restriction to the first num_vertices entries IS the degree-1
        # interpolant — the reference likewise interpolates degree>1 fields
        # to degree 1 before writing (reference io_utils.py:40-60)
        vals = vals[: mesh.num_vertices]
    cplx = np.iscomplexobj(vals)
    with h5py.File(h5name, "w") as f:
        f["points"] = pts
        f["cells"] = mesh.cells
        if cplx:
            f[field_name + "_real"] = vals.real
            f[field_name + "_imag"] = vals.imag
        else:
            f[field_name] = vals
    h5base = os.path.basename(h5name)

    def attr(nm):
        return (
            f'<Attribute Name="{nm}" AttributeType="Scalar" Center="Node">'
            f'<DataItem DataType="Float" Dimensions="{len(vals)}" Format="HDF" '
            f'Precision="8">{h5base}:/{nm}</DataItem></Attribute>'
        )

    attrs = (attr(field_name + "_real") + attr(field_name + "_imag")) if cplx else attr(field_name)
    xml = (
        '<Xdmf Version="3.0"><Domain><Grid Name="Grid">'
        f'<Geometry GeometryType="{geom_type}">'
        f'<DataItem DataType="Float" Dimensions="{pts.shape[0]} {pts.shape[1]}" '
        f'Format="HDF" Precision="8">{h5base}:/points</DataItem></Geometry>'
        f'<Topology TopologyType="{topo_name}" NumberOfElements="{mesh.num_cells}" '
        f'NodesPerElement="{mesh.cells.shape[1]}">'
        f'<DataItem DataType="Int" Dimensions="{mesh.num_cells} {mesh.cells.shape[1]}" '
        f'Format="HDF" Precision="8">{h5base}:/cells</DataItem></Topology>'
        f"{attrs}</Grid></Domain></Xdmf>"
    )
    with open(name + ".xdmf", "w") as f:
        f.write(xml)


_TOPO_NAME = {0: "Polyvertex", 1: "Polyline", 2: "Triangle", 3: "Tetrahedron"}
_VTK_TYPE = {1: 3, 2: 5, 3: 10}  # line / triangle / tetra


def _write_tagged_grid(name: str, points: np.ndarray, conn: np.ndarray,
                       topo_dim: int, values: np.ndarray | None,
                       attr_name: str):
    """One XDMF grid (+HDF5 payload) in the exact layout `_read_grid` and the
    reference's meshio conversion produce (reference: io_utils.py:74-96)."""
    os.makedirs(os.path.dirname(os.path.abspath(name)) or ".", exist_ok=True)
    h5name = name + ".h5"
    with h5py.File(h5name, "w") as f:
        f["points"] = points
        f["cells"] = conn.astype(np.int32)
        if values is not None:
            f["values"] = values.astype(np.int32)
    h5base = os.path.basename(h5name)
    attr = ""
    if values is not None:
        attr = (
            f'<Attribute Name="{attr_name}" AttributeType="Scalar" Center="Cell">'
            f'<DataItem DataType="Int" Dimensions="{len(values)}" Format="HDF" '
            f'Precision="4">{h5base}:/values</DataItem></Attribute>'
        )
    xml = (
        '<Xdmf Version="3.0"><Domain><Grid Name="Grid">'
        f'<Geometry GeometryType="{"XY" if points.shape[1] == 2 else "XYZ"}">'
        f'<DataItem DataType="Float" Dimensions="{points.shape[0]} {points.shape[1]}" '
        f'Format="HDF" Precision="8">{h5base}:/points</DataItem></Geometry>'
        f'<Topology TopologyType="{_TOPO_NAME[topo_dim]}" '
        f'NumberOfElements="{conn.shape[0]}" NodesPerElement="{conn.shape[1]}">'
        f'<DataItem DataType="Int" Dimensions="{conn.shape[0]} {conn.shape[1]}" '
        f'Format="HDF" Precision="4">{h5base}:/cells</DataItem></Topology>'
        f"{attr}</Grid></Domain></Xdmf>"
    )
    with open(name + ".xdmf", "w") as f:
        f.write(xml)


def write_xdmf_mesh(name: str, dimension: int | None = None):
    """Convert `name.msh` to the `name.xdmf` + `name_tags.xdmf` pair that
    `XDMFReader` (and ParaView) consume — the reference's gmsh-to-XDMF
    preprocessing step (reference: io_utils.py:98-136), without meshio."""
    from .msh import read_msh

    mesh = read_msh(name + ".msh", dim=dimension)
    pts = mesh.points
    if pts.shape[1] == 1:
        pts = np.concatenate([pts, np.zeros_like(pts)], axis=1)
    _write_tagged_grid(name, pts, mesh.cells, mesh.dim,
                       getattr(mesh, "cell_tag_values", None), "mesh_tags")
    facets = getattr(mesh, "facets", None)
    if facets is not None and len(facets):
        _write_tagged_grid(name + "_tags", pts, facets, mesh.dim - 1,
                           mesh.facet_tag_values, "mesh_tags")
    print(f"XDMF mesh is generated for {name}.msh")
    return mesh


def vtk_writer(name: str, mesh: Mesh, values: np.ndarray,
               field_name: str = "p"):
    """Legacy ASCII VTK unstructured-grid writer for nodal fields
    (reference: io_utils.py:62-72).  Complex fields are written as
    `<name>_real` / `<name>_imag` point scalars."""
    os.makedirs(os.path.dirname(os.path.abspath(name)) or ".", exist_ok=True)
    pts = np.zeros((mesh.num_vertices, 3))
    pts[:, : mesh.gdim] = mesh.points
    cells = mesh.cells
    k = cells.shape[1]
    vals = np.asarray(values)
    with open(name + ".vtk", "w") as f:
        f.write("# vtk DataFile Version 3.0\nhelmholtz_x_tpu field\n"
                "ASCII\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(pts)} double\n")
        np.savetxt(f, pts, fmt="%.16g")
        f.write(f"CELLS {len(cells)} {len(cells) * (k + 1)}\n")
        np.savetxt(f, np.concatenate(
            [np.full((len(cells), 1), k, dtype=np.int64), cells], axis=1),
            fmt="%d")
        f.write(f"CELL_TYPES {len(cells)}\n")
        np.savetxt(f, np.full(len(cells), _VTK_TYPE[mesh.dim]), fmt="%d")
        f.write(f"POINT_DATA {len(vals)}\n")
        comps = ([(field_name + "_real", vals.real),
                  (field_name + "_imag", vals.imag)]
                 if np.iscomplexobj(vals) else [(field_name, vals)])
        for nm, v in comps:
            f.write(f"SCALARS {nm} double 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, np.asarray(v, dtype=np.float64), fmt="%.16g")
