"""Cylindrical free-form-deformation lattice and mesh morphing.

Gmsh-free re-design of the reference's FFD machinery
(reference: helmholtz_x/shape_derivatives_utils.py:93-318): the lattice is
built from the mesh vertex cloud, parametric coordinates and Bernstein
weights are closed-form array ops, and mesh morphing displaces the vertex
array directly (the reference rebuilds the gmsh model,
shape_derivatives_utils.py:262-296).  Everything here is host-side setup;
the deformed mesh re-enters the standard assembly path.
"""

from __future__ import annotations

from math import comb

import numpy as np

from ..mesh.core import Mesh


def cart2cyl(x, y, z):
    return np.hypot(x, y), np.arctan2(y, x), z


def cyl2cart(rho, phi, zeta):
    return rho * np.cos(phi), rho * np.sin(phi), zeta


class FFDCylindrical:
    """Uniform l x m x n control lattice in cylindrical (r, phi, z) spanning
    a point cloud (reference: shape_derivatives_utils.py:93-187)."""

    def __init__(self, points: np.ndarray, l: int, m: int, n: int):
        self.l, self.m, self.n = l, m, n
        rho, phi, zeta = cart2cyl(points[:, 0], points[:, 1], points[:, 2])
        self.r0, self.dr = rho.min(), rho.max() - rho.min()
        self.phi0, self.dphi = phi.min(), 2 * np.pi
        self.z0, self.dz = zeta.min(), zeta.max() - zeta.min()

        self.Pr = np.zeros((l, m, n))
        self.Pphi = np.zeros((l, m, n))
        self.Pz = np.zeros((l, m, n))
        for i in range(l):
            for j in range(m):
                for k in range(n):
                    self.Pr[i, j, k] = self.r0 + self.dr * i / (l - 1)
                    self.Pphi[i, j, k] = self.phi0 + self.dphi * j / (m - 1)
                    self.Pz[i, j, k] = self.z0 + self.dz * k / (n - 1)

    @classmethod
    def from_mesh(cls, mesh: Mesh, l: int, m: int, n: int) -> "FFDCylindrical":
        return cls(mesh.points, l, m, n)

    def calc_stu(self, points: np.ndarray):
        """Normalized lattice coordinates of cartesian points
        (reference: shape_derivatives_utils.py:167-187)."""
        rho, phi, zeta = cart2cyl(points[:, 0], points[:, 1], points[:, 2])
        s = (rho - self.r0) / self.dr
        t = (phi - self.phi0) / self.dphi
        u = (zeta - self.z0) / self.dz
        return s, t, u

    def bernstein_weight(self, i: int, j: int, k: int, points: np.ndarray) -> np.ndarray:
        """Tensor Bernstein basis value of control point (i,j,k) at points
        (reference: shape_derivatives.py:60-62)."""
        s, t, u = self.calc_stu(points)
        return (
            comb(self.l - 1, i) * (1 - s) ** (self.l - 1 - i) * s**i
            * comb(self.m - 1, j) * (1 - t) ** (self.m - 1 - j) * t**j
            * comb(self.n - 1, k) * (1 - u) ** (self.n - 1 - k) * u**k
        )

    def deform_points(self, points: np.ndarray) -> np.ndarray:
        """Map points through the (possibly displaced) lattice: the Bernstein
        sum over an unperturbed uniform lattice reproduces the identity, so
        only control-point displacements move the cloud
        (reference: deformCylindricalFFD, shape_derivatives_utils.py:262-296)."""
        s, t, u = self.calc_stu(points)
        r_new = np.zeros(len(points))
        phi_new = np.zeros(len(points))
        z_new = np.zeros(len(points))
        for i in range(self.l):
            bi = comb(self.l - 1, i) * (1 - s) ** (self.l - 1 - i) * s**i
            for j in range(self.m):
                bj = comb(self.m - 1, j) * (1 - t) ** (self.m - 1 - j) * t**j
                for k in range(self.n):
                    bk = comb(self.n - 1, k) * (1 - u) ** (self.n - 1 - k) * u**k
                    w = bi * bj * bk
                    r_new += w * self.Pr[i, j, k]
                    phi_new += w * self.Pphi[i, j, k]
                    z_new += w * self.Pz[i, j, k]
        x, y, z = cyl2cart(r_new, phi_new, z_new)
        return np.stack([x, y, z], axis=1)


def deform_mesh(mesh: Mesh, lattice: FFDCylindrical) -> Mesh:
    """New mesh with vertices mapped through the displaced lattice."""
    new = Mesh(points=lattice.deform_points(mesh.points), cells=mesh.cells.copy(),
               dim=mesh.dim, cell_tag_indices=mesh.cell_tag_indices.copy(),
               cell_tag_values=mesh.cell_tag_values.copy(),
               facets=mesh.facets.copy(),
               facet_tag_values=mesh.facet_tag_values.copy())
    return new


def surface_normals(mesh: Mesh, tag: int):
    """Outward unit normals: per tagged facet and area-weight-averaged per
    surface vertex (replaces gmsh.model.getNormal, reference
    shape_derivatives.py:50-53)."""
    facets = mesh.facets_with_tag(tag)
    x = mesh.points[facets]  # (nf, d, 3-ish)
    e1 = x[:, 1] - x[:, 0]
    e2 = x[:, 2] - x[:, 0]
    nrm = np.cross(e1, e2)
    # orient outward: away from the adjacent cell's centroid
    from ..fem.assembly import facet_adjacent_cells

    cells = facet_adjacent_cells(mesh, facets)
    centroids = mesh.points[mesh.cells[cells]].mean(axis=1)
    fc = x.mean(axis=1)
    flip = np.einsum("fd,fd->f", nrm, fc - centroids) < 0
    nrm[flip] *= -1.0
    area2 = np.linalg.norm(nrm, axis=1, keepdims=True)
    unit = nrm / area2

    vert_normal = np.zeros((mesh.num_vertices, 3))
    for loc in range(facets.shape[1]):
        np.add.at(vert_normal, facets[:, loc], nrm / facets.shape[1])
    lens = np.linalg.norm(vert_normal, axis=1, keepdims=True)
    lens[lens == 0] = 1.0
    vert_normal = vert_normal / lens
    return unit, vert_normal


def write_ffd_points(lattice: FFDCylindrical, name: str) -> str:
    """Write the lattice control points as a ParaView-readable .vtu point
    cloud (reference: shape_derivatives_utils.py:156-165 via pyevtk)."""
    import os

    r = lattice.Pr.ravel()
    phi = lattice.Pphi.ravel()
    z = lattice.Pz.ravel()
    x, y, z = cyl2cart(r, phi, z)
    n = len(x)
    os.makedirs(os.path.dirname(os.path.abspath(name)) or ".", exist_ok=True)
    coords = " ".join(f"{a} {b} {c}" for a, b, c in zip(x, y, z))
    conn = " ".join(str(i) for i in range(n))
    offs = " ".join(str(i + 1) for i in range(n))
    types = " ".join("1" for _ in range(n))  # VTK_VERTEX
    xml = (
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">'
        f'<UnstructuredGrid><Piece NumberOfPoints="{n}" NumberOfCells="{n}">'
        '<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">'
        f"{coords}</DataArray></Points><Cells>"
        f'<DataArray type="Int32" Name="connectivity" format="ascii">{conn}</DataArray>'
        f'<DataArray type="Int32" Name="offsets" format="ascii">{offs}</DataArray>'
        f'<DataArray type="UInt8" Name="types" format="ascii">{types}</DataArray>'
        "</Cells></Piece></UnstructuredGrid></VTKFile>"
    )
    path = name + ".vtu"
    with open(path, "w") as f:
        f.write(xml)
    print("FFD points are saved as " + path)
    return path


def deform_mesh_local(mesh: Mesh, lattice: FFDCylindrical) -> Mesh:
    """Local FFD morphing: only vertices INSIDE the lattice box (parametric
    coordinates in [0,1]^3) move; the rest of the mesh is untouched
    (reference: deformCylindricalLocalFFD, shape_derivatives_utils.py:298-318,
    which re-adds the non-local gmsh entities with their original nodes)."""
    s, t, u = lattice.calc_stu(mesh.points)
    eps = 1e-12
    inside = ((s >= -eps) & (s <= 1 + eps) & (t >= -eps) & (t <= 1 + eps)
              & (u >= -eps) & (u <= 1 + eps))
    pts = mesh.points.copy()
    pts[inside] = lattice.deform_points(mesh.points[inside])
    return Mesh(points=pts, cells=mesh.cells.copy(), dim=mesh.dim,
                cell_tag_indices=mesh.cell_tag_indices.copy(),
                cell_tag_values=mesh.cell_tag_values.copy(),
                facets=mesh.facets.copy(),
                facet_tag_values=mesh.facet_tag_values.copy())


def ffd_displacement_vector(mesh: Mesh, lattice: FFDCylindrical,
                            surface_tag: int, i: int, j: int, k: int) -> np.ndarray:
    """Vertex displacement field (nv, 3) of control point (i,j,k): the tensor
    Bernstein weight carried along the outward surface normal, nonzero only
    on the tagged surface (reference: shape_derivatives.py:39-77, which
    queries gmsh parametric normals; here normals come from the facet
    geometry itself)."""
    _, vert_normal = surface_normals(mesh, surface_tag)
    w = lattice.bernstein_weight(i, j, k, mesh.points)
    on_surface = np.zeros(mesh.num_vertices, dtype=bool)
    on_surface[np.unique(mesh.facets_with_tag(surface_tag))] = True
    out = np.zeros((mesh.num_vertices, 3))
    out[on_surface] = w[on_surface, None] * vert_normal[on_surface]
    return out
