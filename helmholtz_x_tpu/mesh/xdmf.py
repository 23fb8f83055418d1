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
