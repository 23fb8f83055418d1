"""Built-in structured meshes with tagged boundaries and flame subdomain.

Mirrors the geometry and tagging conventions of the reference setups
(reference: helmholtz_x/dolfinx_utils.py:73-185 — OneDimensionalSetup,
SquareSetup, RectangleSetup) so eigenvalues computed on these meshes are
directly comparable to the reference logs.
"""

from __future__ import annotations

import numpy as np

from .core import Mesh, locate_cells


def one_dimensional_setup(n_elem: int, x_f: float = 0.25, a_f: float = 0.025,
                          x_end: float = 1.0, tag: int = 0) -> Mesh:
    """Uniform interval [0, x_end]; boundary tag 1 = left end, 2 = right end;
    cells fully inside [x_f - a_f, x_f + a_f] tagged as the flame subdomain."""
    pts = np.linspace(0.0, x_end, n_elem + 1)[:, None]
    cells = np.stack([np.arange(n_elem), np.arange(1, n_elem + 1)], axis=1).astype(np.int32)
    mesh = Mesh(points=pts, cells=cells, dim=1)

    eps = 1e-16
    marked = locate_cells(mesh, lambda x: (x_f - a_f - eps <= x[0]) & (x[0] <= x_f + a_f + eps))
    mesh.cell_tag_indices = marked
    mesh.cell_tag_values = np.full(len(marked), tag, dtype=np.int32)

    mesh.facets = np.array([[0], [n_elem]], dtype=np.int32)
    mesh.facet_tag_values = np.array([1, 2], dtype=np.int32)
    return mesh


def _tag_rect_boundaries(mesh: Mesh, lx: float, ly: float):
    """Boundary facet tags: 1=left(x=0), 2=right(x=lx), 3=bottom(y=0), 4=top(y=ly)."""
    # boundary edges = edges appearing in exactly one triangle
    edges = np.concatenate([mesh.cells[:, [0, 1]], mesh.cells[:, [1, 2]], mesh.cells[:, [0, 2]]])
    edges_sorted = np.sort(edges, axis=1)
    uniq, counts = np.unique(edges_sorted, axis=0, return_counts=True)
    bedges = uniq[counts == 1]
    x = mesh.points
    tol = 1e-12
    tags, keep = [], []
    for e in bedges:
        p = x[e]
        if np.all(np.abs(p[:, 0]) < tol):
            t = 1
        elif np.all(np.abs(p[:, 0] - lx) < tol):
            t = 2
        elif np.all(np.abs(p[:, 1]) < tol):
            t = 3
        elif np.all(np.abs(p[:, 1] - ly) < tol):
            t = 4
        else:
            continue
        tags.append(t)
        keep.append(e)
    mesh.facets = np.asarray(keep, dtype=np.int32)
    mesh.facet_tag_values = np.asarray(tags, dtype=np.int32)


def rectangle_setup(nx: int, ny: int, lx: float, ly: float,
                    x_f: float = 0.25, a_f: float = 0.025) -> Mesh:
    """Structured triangle mesh of [0,lx]x[0,ly], 'right' diagonal split
    (matching dolfinx create_rectangle defaults, reference dolfinx_utils.py:158)."""
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    cells = []
    for i in range(nx):
        for j in range(ny):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            # "right" diagonal: split along (v00, v11)
            cells.append([v00, v10, v11])
            cells.append([v00, v11, v01])
    mesh = Mesh(points=pts, cells=np.asarray(cells, dtype=np.int32), dim=2)

    eps = 1e-16
    marked = locate_cells(mesh, lambda x: (x_f - a_f - eps <= x[0]) & (x[0] <= x_f + a_f + eps))
    mesh.cell_tag_indices = marked
    mesh.cell_tag_values = np.zeros(len(marked), dtype=np.int32)
    _tag_rect_boundaries(mesh, lx, ly)
    return mesh


def square_setup(n_elem: int, x_f: float = 0.25, a_f: float = 0.025) -> Mesh:
    return rectangle_setup(n_elem, n_elem, 1.0, 1.0, x_f=x_f, a_f=a_f)
