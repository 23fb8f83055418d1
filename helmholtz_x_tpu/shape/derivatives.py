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
from .ffd import FFDCylindrical


def _facet_third_average(mesh: Mesh, facets, vertex_vals):
    """int_F f ds with f P1 on each facet: |F|/m * sum of vertex values."""
    meas = mesh.facet_measures(facets)
    m = facets.shape[1]
    return meas / m * vertex_vals[facets].sum(axis=1)


def shape_derivatives_ffd(mesh: Mesh, lattice: FFDCylindrical, surface_tag: int,
                          omega_dir: complex, p_dir: Field, p_adj: Field,
                          c: Field, matrices, flame_matrix=None,
                          degree: int = 1) -> dict:
    """Derivative dict {zeta: {phi: domega}} for the outermost radial layer
    of control points (reference: shape_derivatives.py:12-37).

    degree=2 evaluates G = div(conj(p_adj) c^2 grad p) classically per cell
    from the P2 interpolants (gradients linear, laplacian constant per
    affine cell) — the same quantities the reference's UFL expression
    produces on its degree-2 run (main_shape.py:68)."""
    if degree == 2:
        return _shape_derivatives_ffd_p2(mesh, lattice, surface_tag, omega_dir,
                                         p_dir, p_adj, c, matrices, flame_matrix)
    p_adj_n = normalize_adjoint(omega_dir, p_dir, p_adj, matrices, flame_matrix)
    u = np.conj(p_adj_n.values)  # the unconjugated left null vector of L(omega)

    # The reference evaluates G = div(u c^2 grad p) with UFL (P2 second
    # derivatives); substituting the strong equation div(c^2 grad p) =
    # -omega^2 p gives the equivalent  G = c^2 grad(u).grad(p) - omega^2 u p,
    # which is exact for P1 elements too (no cellwise laplacian needed).
    g = mesh.cell_grads()  # (nc, d+1, d)
    conn = mesh.cells
    grad_u = np.einsum("ki,kid->kd", u[conn], g)
    grad_p = np.einsum("ki,kid->kd", p_dir.values[conn], g)
    gradugradp = np.einsum("kd,kd->k", grad_u, grad_p)  # (nc,) per-cell const

    facets = mesh.facets_with_tag(surface_tag)
    adj = facet_adjacent_cells(mesh, facets)
    meas = mesh.facet_measures(facets)

    # facet quadrature (degree 4) for the P1 interpolants on the facet
    from ..fem.quadrature import simplex_rule

    lam, wq = simplex_rule(mesh.dim - 1, 4)
    cq = c.values[facets] @ lam.T  # (nf, nq)
    uq = u[facets] @ lam.T
    pq = p_dir.values[facets] @ lam.T
    om2 = omega_dir**2

    i = lattice.l - 1  # outermost radial layer
    derivatives = {}
    for zeta in range(lattice.n):
        derivatives[zeta] = {}
        for phi in range(lattice.m):
            w = lattice.bernstein_weight(i, phi, zeta, mesh.points)  # (nv,)
            wb_q = w[facets] @ lam.T  # (V.n) = Bernstein weight on the facet
            Gq = cq**2 * gradugradp[adj][:, None] - om2 * uq * pq
            val = np.sum(meas * ((wb_q * Gq) @ wq))
            derivatives[zeta][phi] = complex(val)
    return derivatives


def _shape_derivatives_ffd_p2(mesh: Mesh, lattice: FFDCylindrical,
                              surface_tag: int, omega_dir: complex,
                              p_dir: Field, p_adj: Field, c: Field,
                              matrices, flame_matrix=None) -> dict:
    """Degree-2 Hadamard surface integral: G evaluated from the facet's
    adjacent cell with exact P2 values/gradients/laplacians,
      G = c^2 grad(u).grad(p) + u (2 c grad(c).grad(p) + c^2 lap(p)),
    u = conj(p_adj normalized), c kept P1 (like the reference's temperature
    space at degree 2, acoustic_matrices.py:47)."""
    from ..fem.p2 import P2Space, eval_p2_at_points
    from ..fem.quadrature import simplex_rule

    space = getattr(matrices, "space", None) or P2Space.build(mesh)
    p_adj_n = normalize_adjoint(omega_dir, p_dir, p_adj, matrices, flame_matrix)
    u = np.conj(p_adj_n.values)

    facets = mesh.facets_with_tag(surface_tag)
    adj = facet_adjacent_cells(mesh, facets)
    meas = mesh.facet_measures(facets)
    lam, wq = simplex_rule(mesh.dim - 1, 4)
    nf, nq = facets.shape[0], lam.shape[0]

    # physical facet quadrature points, each paired with its adjacent cell
    xq = np.einsum("qa,fad->fqd", lam, mesh.points[facets])  # (nf, nq, gdim)
    pts = xq.reshape(nf * nq, -1)
    cells_flat = np.repeat(adj, nq)

    uv, ug, _ = eval_p2_at_points(space, u, cells_flat, pts)
    pv, pg, plap = eval_p2_at_points(space, p_dir.values, cells_flat, pts)

    cq = (c.values[facets] @ lam.T).reshape(nf * nq)  # P1 on the facet
    gc_cell = np.einsum("fa,fad->fd",
                        c.values[mesh.cells[adj]][:, : mesh.dim + 1],
                        mesh.cell_grads()[adj])
    gc = np.repeat(gc_cell, nq, axis=0)

    G = (cq**2 * np.einsum("pd,pd->p", ug, pg)
         + uv * (2.0 * cq * np.einsum("pd,pd->p", gc, pg) + cq**2 * plap))

    i = lattice.l - 1
    derivatives = {}
    for zeta in range(lattice.n):
        derivatives[zeta] = {}
        for phi in range(lattice.m):
            wb = lattice.bernstein_weight(i, phi, zeta, pts)
            val = np.sum(meas * ((wb * G).reshape(nf, nq) @ wq))
            derivatives[zeta][phi] = complex(val)
    return derivatives


def derivatives_normalize(derivatives: dict) -> dict:
    """Normalize the derivative dict by its largest magnitude (plot/step-size
    helper, reference: shape_derivatives_utils.py:7-36)."""
    mags = [abs(v) for zz in derivatives.values() for v in zz.values()]
    peak = max(mags) if mags else 1.0
    return {z: {p: v / peak for p, v in row.items()}
            for z, row in derivatives.items()}


def nonaxisymmetric_derivatives_normalize(derivatives: dict) -> dict:
    """Normalize a 2D {zeta: {phi: domega}} derivative dict with the real and
    imaginary parts scaled INDEPENDENTLY by their global maxima (reference:
    shape_derivatives_utils.py:38-91 — used by main_shape.py before the
    descent step so the growth-rate component drives the step size)."""
    max_re = max((abs(v.real) for row in derivatives.values()
                  for v in row.values()), default=1.0) or 1.0
    max_im = max((abs(v.imag) for row in derivatives.values()
                  for v in row.values()), default=1.0) or 1.0
    return {z: {p: v.real / max_re + 1j * (v.imag / max_im)
                for p, v in row.items()}
            for z, row in derivatives.items()}
