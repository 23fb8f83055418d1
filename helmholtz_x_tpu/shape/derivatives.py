"""Hadamard shape derivatives of the thermoacoustic eigenvalue w.r.t.
FFD control-point displacement (reference: helmholtz_x/shape_derivatives.py).

d omega(i,j,k) = int_S (V_ijk . n) G ds,
G = div(conj(p_adj) c^2 grad(p_dir))
  = grad(conj(p_adj) c^2) . grad(p_dir)   on P1 elements (laplacian term
    vanishes per cell), evaluated from the facet's adjacent cell

with p_adj normalized so <p_adj, dL/domega p_dir> = 1
(eigenvectors.normalize_adjoint) and V_ijk the Bernstein displacement field
of control point (i,j,k) carried along the surface normal.
"""

from __future__ import annotations

import numpy as np

from ..eigenvectors import normalize_adjoint
from ..fem.assembly import facet_adjacent_cells
from ..fem.fields import Field
from ..mesh.core import Mesh
from .ffd import FFDCylindrical, surface_normals


def _facet_third_average(mesh: Mesh, facets, vertex_vals):
    """int_F f ds with f P1 on each facet: |F|/m * sum of vertex values."""
    meas = mesh.facet_measures(facets)
    m = facets.shape[1]
    return meas / m * vertex_vals[facets].sum(axis=1)


def shape_derivatives_ffd(mesh: Mesh, lattice: FFDCylindrical, surface_tag: int,
                          omega_dir: complex, p_dir: Field, p_adj: Field,
                          c: Field, matrices, flame_matrix=None) -> dict:
    """Derivative dict {zeta: {phi: domega}} for the outermost radial layer
    of control points (reference: shape_derivatives.py:12-37)."""
    p_adj_n = normalize_adjoint(omega_dir, p_dir, p_adj, matrices, flame_matrix)
    pa_conj = np.conj(p_adj_n.values)

    # G per cell: grad(conj(p_adj) c^2) . grad(p_dir)
    g = mesh.cell_grads()  # (nc, d+1, d)
    conn = mesh.cells
    w_vals = pa_conj * c.values**2  # P1 nodal product (interpolation, as UFL
    # does for the P1 coefficient product)
    grad_w = np.einsum("ki,kid->kd", w_vals[conn], g)
    grad_p = np.einsum("ki,kid->kd", p_dir.values[conn], g)
    G_cell = np.einsum("kd,kd->k", grad_w, grad_p)  # (nc,) complex

    facets = mesh.facets_with_tag(surface_tag)
    adj = facet_adjacent_cells(mesh, facets)
    meas = mesh.facet_measures(facets)
    _, vert_n = surface_normals(mesh, surface_tag)

    i = lattice.l - 1  # outermost radial layer
    derivatives = {}
    for zeta in range(lattice.n):
        derivatives[zeta] = {}
        for phi in range(lattice.m):
            w = lattice.bernstein_weight(i, phi, zeta, mesh.points)  # (nv,)
            # V.n with V = w * n at surface vertices -> scalar field w on S
            vn = w  # (V.n) = w since V is along the unit normal
            # int_F (V.n) G ds: (V.n) P1 on facet, G constant from adj cell
            m = facets.shape[1]
            vn_face = vn[facets].sum(axis=1) / m
            val = np.sum(meas * vn_face * G_cell[adj])
            derivatives[zeta][phi] = complex(val)
    return derivatives


def derivatives_normalize(derivatives: dict) -> dict:
    """Normalize the derivative dict by its largest magnitude (plot/step-size
    helper, reference: shape_derivatives_utils.py:7-36)."""
    mags = [abs(v) for zz in derivatives.values() for v in zz.values()]
    peak = max(mags) if mags else 1.0
    return {z: {p: v / peak for p, v in row.items()}
            for z, row in derivatives.items()}
