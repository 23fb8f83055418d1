"""Rotational stitching: build a full annulus mesh from a 1/n sector.

The Bloch reduction (bloch.py) solves on one sector with phase-periodic
master/slave coupling; this utility provides the *oracle* for it — the
explicit full-annulus mesh assembled from n rotated copies of the sector with
the interface vertices merged.  The reference has no equivalent (its Bloch
gates are golden logs, reference bloch_operator.py); here the stitched mesh
lets tests assert sector-reduced == full-annulus eigenvalues machine-checked.
"""

from __future__ import annotations

import numpy as np

from .core import Mesh


def _rotation_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _merge_coincident(points: np.ndarray, tol: float) -> np.ndarray:
    """Map each point to a canonical id, merging points closer than tol.

    Uses a KD-tree pair query + connected components, so coincident clusters
    are found regardless of floating-point rounding direction (a plain
    coordinate-quantization would split pairs straddling a grid boundary).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    from scipy.spatial import cKDTree

    npts = points.shape[0]
    pairs = cKDTree(points).query_pairs(tol, output_type="ndarray")
    if len(pairs) == 0:
        return np.arange(npts)
    g = coo_matrix((np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])),
                   shape=(npts, npts))
    _, labels = connected_components(g, directed=False)
    return labels


def rotational_stitch(mesh: Mesh, n: int, *, drop_facet_tags=(),
                      sector_cell_tag: int | None = None,
                      tol: float = 1e-9) -> Mesh:
    """Stitch ``n`` copies of a 1/n sector, rotated about the z axis, into the
    full annulus.

    - Vertices coincident across sector interfaces (within ``tol``) are
      merged, so the result is a conforming mesh.
    - Facet tags are replicated per copy, except ``drop_facet_tags`` (the
      Bloch Master/Slave pair — interior surfaces after stitching).
    - If ``sector_cell_tag`` is given, the sector cells carrying that tag
      become tag ``k`` in copy ``k`` — per-sector flame subdomains matching
      the reference's Q_multiple convention (parameters_utils.py:228-246).
    """
    if mesh.gdim != 3:
        raise ValueError("rotational_stitch needs a 3D (x,y,z) point cloud")
    nv, nc = mesh.num_vertices, mesh.num_cells
    theta = 2.0 * np.pi / n

    all_pts = np.concatenate(
        [mesh.points @ _rotation_z(k * theta).T for k in range(n)])
    labels = _merge_coincident(all_pts, tol)

    # labels are contiguous 0..n_unique-1 component ids; use them directly as
    # the new vertex ids and pick one representative coordinate per cluster
    # (coincident points agree to tol, so any representative works)
    vid = labels
    points = np.empty((labels.max() + 1, 3))
    points[vid] = all_pts

    cells = np.concatenate(
        [vid[k * nv + mesh.cells] for k in range(n)]).astype(np.int32)

    keep = np.array([t not in drop_facet_tags
                     for t in mesh.facet_tag_values], dtype=bool)
    sector_facets, sector_ftags = mesh.facets[keep], mesh.facet_tag_values[keep]
    facets = np.concatenate(
        [vid[k * nv + sector_facets] for k in range(n)]).astype(np.int32)
    facet_tags = np.tile(sector_ftags, n).astype(np.int32)

    if sector_cell_tag is not None:
        flame = mesh.cells_with_tag(sector_cell_tag)
        cell_idx = np.concatenate(
            [flame + k * nc for k in range(n)]).astype(np.int32)
        cell_val = np.repeat(np.arange(n, dtype=np.int32), len(flame))
    else:
        cell_idx = np.concatenate(
            [mesh.cell_tag_indices + k * nc for k in range(n)]).astype(np.int32)
        cell_val = np.tile(mesh.cell_tag_values, n).astype(np.int32)

    return Mesh(points=points, cells=cells, dim=mesh.dim,
                cell_tag_indices=cell_idx, cell_tag_values=cell_val,
                facets=facets, facet_tag_values=facet_tags)
