"""P2 (quadratic Lagrange) elements on simplices.

Used by the shape-derivative pipeline (reference main_shape.py runs the whole
active solve at degree=2; helmholtz_x relies on DOLFINx/basix for this —
here the P2 basis is explicit in barycentric coordinates):

    vertex i :  lambda_i (2 lambda_i - 1)
    edge (a,b): 4 lambda_a lambda_b

All element integrals run on fixed simplex Gauss rules of sufficient degree
(deg-4 volume rules are exact for P2 x P2 with a P1 coefficient's square
handled at deg 4; the Robin facet integral uses a deg-5 triangle rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

import numpy as np

from ..mesh.core import Mesh
from ..ops.csr import CSR, csr_from_coo
from .quadrature import simplex_rule

_EDGE_LOCAL = {
    1: [(0, 1)],
    2: [(0, 1), (0, 2), (1, 2)],
    3: [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
}


def triangle_rule_deg5():
    """7-point degree-5 rule on the triangle (barycentric, weights sum 1)."""
    a = 0.0597158717897698
    b = 0.4701420641051151
    c = 0.7974269853530873
    d = 0.1012865073234563
    pts = np.array([
        [1 / 3, 1 / 3, 1 / 3],
        [a, b, b], [b, a, b], [b, b, a],
        [c, d, d], [d, c, d], [d, d, c],
    ])
    w = np.array([0.225,
                  0.1323941527885062, 0.1323941527885062, 0.1323941527885062,
                  0.1259391805448271, 0.1259391805448271, 0.1259391805448271])
    return pts, w


@dataclass
class P2Space:
    """Vertex + edge-midpoint dof layout over a simplex mesh."""

    mesh: Mesh
    edges: np.ndarray  # (ne, 2) sorted vertex pairs
    cell_edges: np.ndarray  # (nc, n_edge_local)
    cell_dofs: np.ndarray  # (nc, nloc)
    edge_id: dict

    @classmethod
    def build(cls, mesh: Mesh) -> "P2Space":
        d = mesh.dim
        locs = _EDGE_LOCAL[d]
        pairs = np.concatenate(
            [np.sort(mesh.cells[:, loc], axis=1) for loc in locs], axis=0)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        nc = mesh.num_cells
        cell_edges = inv.reshape(len(locs), nc).T  # (nc, nlocs)
        nv = mesh.num_vertices
        cell_dofs = np.concatenate([mesh.cells, nv + cell_edges], axis=1)
        edge_id = {tuple(e): i for i, e in enumerate(uniq)}
        return cls(mesh=mesh, edges=uniq, cell_edges=cell_edges,
                   cell_dofs=cell_dofs.astype(np.int64), edge_id=edge_id)

    @property
    def ndofs(self) -> int:
        return self.mesh.num_vertices + len(self.edges)

    @property
    def nloc(self) -> int:
        return self.cell_dofs.shape[1]

    def dof_coordinates(self) -> np.ndarray:
        mids = self.mesh.points[self.edges].mean(axis=1)
        return np.concatenate([self.mesh.points, mids], axis=0)

    def facet_dofs(self, facets: np.ndarray) -> np.ndarray:
        """Global dofs on facets: facet vertices + facet-edge midpoints."""
        nv = self.mesh.num_vertices
        m = facets.shape[1]
        out = [facets]
        if m >= 2:
            for a, b in combinations(range(m), 2):
                pair = np.sort(facets[:, [a, b]], axis=1)
                ids = np.array([self.edge_id[tuple(p)] for p in pair])
                out.append((nv + ids)[:, None])
        return np.concatenate(out, axis=1)

    def interpolate_p1(self, p1_vals: np.ndarray) -> np.ndarray:
        """P1 nodal field -> its values at all P2 dof points (P1 interp)."""
        mids = p1_vals[self.edges].mean(axis=1)
        return np.concatenate([p1_vals, mids])


def _basis(lam: np.ndarray, d: int):
    """P2 basis values N (nq, nloc) at barycentric points lam (nq, d+1)."""
    verts = lam * (2 * lam - 1)  # (nq, d+1)
    edges = np.stack([4 * lam[:, a] * lam[:, b] for a, b in _EDGE_LOCAL[d]], axis=1)
    return np.concatenate([verts, edges], axis=1)


def _basis_grad_coeff(lam: np.ndarray, d: int):
    """Coefficients c (nq, nloc, d+1) with gradN = sum_a c[...,a] grad(lambda_a)."""
    nq = lam.shape[0]
    nvert = d + 1
    locs = _EDGE_LOCAL[d]
    c = np.zeros((nq, nvert + len(locs), nvert))
    for i in range(nvert):
        c[:, i, i] = 4 * lam[:, i] - 1
    for e, (a, b) in enumerate(locs):
        c[:, nvert + e, a] = 4 * lam[:, b]
        c[:, nvert + e, b] = 4 * lam[:, a]
    return c


def _cell_quad_grads(mesh: Mesh, lam: np.ndarray):
    """gradN per cell per quad point: (nc, nq, nloc, d)."""
    d = mesh.dim
    g = mesh.cell_grads()  # (nc, d+1, d)
    coef = _basis_grad_coeff(lam, d)  # (nq, nloc, d+1)
    return np.einsum("qla,kad->kqld", coef, g)


def assemble_mass_p2(space: P2Space, dirichlet_dofs=None) -> CSR:
    mesh = space.mesh
    d = mesh.dim
    lam, w = simplex_rule(d, 4)
    N = _basis(lam, d)  # (nq, nloc)
    ref = np.einsum("q,qi,qj->ij", w, N, N)  # exact deg-4 reference mass
    elem = mesh.cell_volumes()[:, None, None] * ref[None]
    return _scatter_p2(space, elem, dirichlet_dofs)


def assemble_stiffness_csq_p2(space: P2Space, c_p1: np.ndarray,
                              dirichlet_dofs=None) -> CSR:
    """-int c^2 gradN_i . gradN_j dx with c a P1 field (the reference keeps c
    P1 even at degree 2, acoustic_matrices.py:47 via the temperature space)."""
    mesh = space.mesh
    d = mesh.dim
    lam, w = simplex_rule(d, 4)
    gq = _cell_quad_grads(mesh, lam)  # (nc, nq, nloc, d)
    cq = c_p1[mesh.cells] @ lam.T  # (nc, nq) P1 interp at quad pts
    elem = -np.einsum("kq,q,kqid,kqjd->kij", cq**2, w, gq, gq)
    elem *= mesh.cell_volumes()[:, None, None]
    return _scatter_p2(space, elem, dirichlet_dofs)


def assemble_boundary_mass_p2(space: P2Space, contributions) -> CSR | None:
    """sum coeff * int c N_i N_j ds(tag), c P1 (deg-5 facet quadrature)."""
    if not contributions:
        return None
    mesh = space.mesh
    m = mesh.dim - 1
    if m == 0:
        rows, cols, vre, vim = [], [], [], []
        for tag, coeff, c_vals, _dg0 in contributions:
            facets = mesh.facets_with_tag(tag)
            vals = coeff * c_vals[facets[:, 0]]
            rows.append(facets[:, 0])
            cols.append(facets[:, 0])
            vre.append(vals.real)
            vim.append(vals.imag)
        return csr_from_coo(space.ndofs, np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vre), np.concatenate(vim))
    if m == 1:
        lam, w = simplex_rule(1, 5)
    else:
        lam, w = triangle_rule_deg5()
    Nf = _basis(lam, m)  # facet P2 basis (nq, floc)
    rows, cols, vre, vim = [], [], [], []
    for tag, coeff, c_vals, _dg0 in contributions:
        facets = mesh.facets_with_tag(tag)
        if facets.shape[0] == 0:
            continue
        meas = mesh.facet_measures(facets)
        fdofs = space.facet_dofs(facets)  # (nf, floc)
        cq = c_vals[facets] @ lam.T  # (nf, nq)
        elem = np.einsum("fq,q,qi,qj->fij", cq, w, Nf, Nf)
        elem = coeff * meas[:, None, None] * elem
        nf, nl = fdofs.shape
        r = np.repeat(fdofs, nl, axis=1).reshape(nf, nl, nl)
        cc = np.repeat(fdofs[:, None, :], nl, axis=1)
        rows.append(r.ravel())
        cols.append(cc.ravel())
        vre.append(elem.real.ravel())
        vim.append(elem.imag.ravel())
    return csr_from_coo(space.ndofs, np.concatenate(rows), np.concatenate(cols),
                        np.concatenate(vre), np.concatenate(vim))


def assemble_p1p1_vector_p2(space: P2Space, a_p1, b_p1, scale=1.0) -> np.ndarray:
    """int a b N_j dx with a, b P1 coefficient fields, N_j P2 test functions."""
    mesh = space.mesh
    d = mesh.dim
    lam, w = simplex_rule(d, 4)
    N = _basis(lam, d)
    aq = a_p1[mesh.cells] @ lam.T
    bq = b_p1[mesh.cells] @ lam.T
    elem = scale * mesh.cell_volumes()[:, None] * np.einsum(
        "kq,kq,q,qj->kj", aq, bq, w, N)
    out = np.zeros(space.ndofs, dtype=elem.dtype)
    np.add.at(out, space.cell_dofs, elem)
    return out


def assemble_grad_quotient_vector_p2(space: P2Space, w_p1, rho_p1, n_r) -> np.ndarray:
    """int (n_r . gradN_j) w / rho dx with w, rho P1."""
    mesh = space.mesh
    d = mesh.dim
    lam, wq = simplex_rule(d, 4)
    gq = _cell_quad_grads(mesh, lam)  # (nc, nq, nloc, d)
    wv = w_p1[mesh.cells] @ lam.T
    rv = rho_p1[mesh.cells] @ lam.T
    nr = np.asarray(n_r, dtype=float)[:d]
    gn = np.einsum("kqjd,d->kqj", gq, nr)
    elem = mesh.cell_volumes()[:, None] * np.einsum(
        "kq,q,kqj->kj", wv / rv, wq, gn)
    out = np.zeros(space.ndofs, dtype=elem.dtype)
    np.add.at(out, space.cell_dofs, elem)
    return out


def integrate_pp_p2(space: P2Space, vals: np.ndarray):
    """int f*f dx for a P2 field (unconjugated)."""
    mesh = space.mesh
    d = mesh.dim
    lam, w = simplex_rule(d, 4)
    N = _basis(lam, d)
    fq = vals[space.cell_dofs] @ N.T  # (nc, nq)
    return np.sum(mesh.cell_volumes() * (fq**2 @ w))


def _scatter_p2(space: P2Space, elem: np.ndarray, dirichlet_dofs=None) -> CSR:
    dofs = space.cell_dofs
    nc, nl, _ = elem.shape
    if dirichlet_dofs is not None and len(dirichlet_dofs):
        bc = np.zeros(space.ndofs, dtype=bool)
        bc[np.asarray(dirichlet_dofs)] = True
        mask = bc[dofs]
        keep = ~(mask[:, :, None] | mask[:, None, :])
        elem = np.where(keep, elem, 0.0)
    r = np.repeat(dofs, nl, axis=1).reshape(nc, nl, nl)
    c = np.repeat(dofs[:, None, :], nl, axis=1)
    rows = [r.ravel()]
    cols = [c.ravel()]
    vre = [elem.ravel()]
    if dirichlet_dofs is not None and len(dirichlet_dofs):
        dd = np.asarray(dirichlet_dofs)
        rows.append(dd)
        cols.append(dd)
        vre.append(np.ones(len(dd)))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vre = np.concatenate(vre)
    return csr_from_coo(space.ndofs, rows, cols, vre, np.zeros_like(vre))


def eval_p2_at_points(space: P2Space, vals: np.ndarray, cell_ids: np.ndarray,
                      pts: np.ndarray):
    """Evaluate a P2 dof vector at physical points lying in known cells.

    Returns (value, gradient, laplacian) arrays of shapes (np,), (np, d),
    (np,).  On an affine simplex the P2 basis is quadratic in the barycentric
    coordinates, so the gradient is linear per cell and the laplacian is a
    per-cell constant: lap(N_a) = 4 g_a.g_a (vertex), lap(N_ab) = 8 g_a.g_b
    (edge), with g_a = grad(lambda_a).  Used by the degree-2 shape-derivative
    surface integrals (reference evaluates the same quantities through UFL,
    shape_derivatives.py:19)."""
    mesh = space.mesh
    d = mesh.dim
    g = mesh.cell_grads()[cell_ids]            # (np, d+1, d)
    v0 = mesh.points[mesh.cells[cell_ids, 0], :d]
    dx = pts[:, :d] - v0                       # (np, d)
    lam = np.einsum("pad,pd->pa", g, dx)
    lam[:, 0] += 1.0                           # lambda(v0) = e_0

    dofs = space.cell_dofs[cell_ids]           # (np, nloc)
    fe = vals[dofs]                            # (np, nloc)

    N = _basis(lam, d)                         # (np, nloc)
    value = np.einsum("pl,pl->p", N, fe)

    coef = _basis_grad_coeff(lam, d)           # (np, nloc, d+1)
    gradN = np.einsum("pla,pad->pld", coef, g)
    grad = np.einsum("pld,pl->pd", gradN, fe)

    gg = np.einsum("pad,pbd->pab", g, g)       # (np, d+1, d+1)
    nvert = d + 1
    lapN = np.empty((len(cell_ids), space.nloc))
    for a in range(nvert):
        lapN[:, a] = 4.0 * gg[:, a, a]
    for e, (a, b) in enumerate(_EDGE_LOCAL[d]):
        lapN[:, nvert + e] = 8.0 * gg[:, a, b]
    lap = np.einsum("pl,pl->p", lapN, fe)
    return value, grad, lap
