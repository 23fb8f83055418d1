"""Simplex mesh container and geometry kernels.

The reference delegates meshes to DOLFINx's C++ core (reference:
helmholtz_x/dolfinx_utils.py:73-185, io_utils.py:161-218).  Here a mesh is a
set of flat numpy arrays — vertices, cells, tagged facets, tagged cells —
prepared once on the host; everything the device kernels need (volumes,
gradients, assembly scatter patterns) is derived from these arrays.

Supported cells: interval (1D), triangle (2D), tetrahedron (3D), all affine
P1 geometry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import factorial
from typing import Optional

import numpy as np


@dataclass
class Mesh:
    points: np.ndarray  # (nv, gdim) float64 vertex coordinates
    cells: np.ndarray  # (nc, dim+1) int32 vertex ids
    dim: int  # topological dimension (1, 2, 3)
    # tagged entities (like dolfinx meshtags):
    cell_tag_indices: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    cell_tag_values: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    facets: np.ndarray = field(default_factory=lambda: np.zeros((0, 1), np.int32))
    facet_tag_values: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))

    # cached geometry
    _volumes: Optional[np.ndarray] = None
    _grads: Optional[np.ndarray] = None

    @property
    def num_vertices(self) -> int:
        return self.points.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def gdim(self) -> int:
        return self.points.shape[1]

    def cells_with_tag(self, tag: int) -> np.ndarray:
        return self.cell_tag_indices[self.cell_tag_values == tag]

    def facets_with_tag(self, tag: int) -> np.ndarray:
        """Vertex arrays (nf, dim) of the facets carrying the given tag."""
        return self.facets[self.facet_tag_values == tag]

    def cell_volumes(self) -> np.ndarray:
        if self._volumes is None:
            self._compute_geometry()
        return self._volumes

    def cell_grads(self) -> np.ndarray:
        """(nc, dim+1, dim) constant gradients of the P1 barycentric basis."""
        if self._grads is None:
            self._compute_geometry()
        return self._grads

    def _compute_geometry(self):
        d = self.dim
        x = self.points[self.cells][:, :, :d]  # (nc, d+1, d) affine simplex coords
        # jt rows are the edge vectors (v_i - v0), i.e. jt = J^T of the affine map.
        jt = x[:, 1:, :] - x[:, :1, :]  # (nc, d, d)
        if d == 1:
            detj = jt[:, 0, 0]
            g_rest = (1.0 / detj)[:, None, None]  # (nc, 1, 1)
        else:
            detj = np.linalg.det(jt)
            # grad(lambda_k) . (v_i - v0) = delta_ik  =>  jt @ G^T = I,
            # G rows = grads of lambda_1..lambda_d  =>  G = inv(jt)^T
            g_rest = np.transpose(np.linalg.inv(jt), (0, 2, 1))  # (nc, d, d)
        g0 = -g_rest.sum(axis=1, keepdims=True)  # grad lambda_0 = -sum others
        self._grads = np.concatenate([g0, g_rest], axis=1)  # (nc, d+1, d)
        self._volumes = np.abs(detj) / factorial(d)

    def facet_measures(self, facets: np.ndarray) -> np.ndarray:
        """Measure (|F|) of facets given as (nf, dim) vertex id arrays.

        Points (1D boundaries) have measure 1 (counting measure), edges their
        length, triangles their area.
        """
        m = facets.shape[1]
        if m == 1:
            return np.ones(facets.shape[0])
        x = self.points[facets]  # (nf, m, gdim)
        if m == 2:
            return np.linalg.norm(x[:, 1] - x[:, 0], axis=1)
        if m == 3:
            e1 = x[:, 1] - x[:, 0]
            e2 = x[:, 2] - x[:, 0]
            if x.shape[2] == 3:
                return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
            return 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        raise ValueError(f"unsupported facet arity {m}")


def locate_cells(mesh: Mesh, predicate) -> np.ndarray:
    """Cells all of whose vertices satisfy ``predicate(x)`` — mirrors
    dolfinx ``locate_entities`` semantics (reference: dolfinx_utils.py:87-90).

    ``predicate`` maps coordinate array (gdim, npts) -> bool array (npts,).
    """
    ok = np.asarray(predicate(mesh.points.T))
    return np.nonzero(ok[mesh.cells].all(axis=1))[0].astype(np.int32)


def locate_dofs_on_facets(mesh: Mesh, tag: int) -> np.ndarray:
    """All vertex (= P1 dof) ids on facets with the given tag."""
    f = mesh.facets_with_tag(tag)
    return np.unique(f.ravel()).astype(np.int32)
