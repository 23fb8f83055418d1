"""P1 finite-element assembly of the Helmholtz operators.

The four fixed forms of the thermoacoustic Helmholtz problem
(reference: helmholtz_x/acoustic_matrices.py:101-125, flame_matrices.py:199-200)
are assembled from closed-form moments of barycentric monomials on affine
simplices — no symbolic form language needed:

    A  = -int c^2 grad(phi_k).grad(phi_j) dx        (stiffness, c a P1 field)
    B  = sum_tags int (i c / Z) phi_k phi_j ds       (boundary mass)
    C  = int phi_k phi_j dx                          (mass)
    left_j  = int (gamma-1) q0/ub h phi_j dx         (flame heat-release shape)
    right_j = int (n_r . grad phi_j) w / rho dx      (measurement shape)

All element integrals that are polynomial (A, B, C, left) are exact; the
rational 1/rho integrand in `right` uses a simplex Gauss rule of the same
degree FFCx estimates for the reference form (degree 2).

This module is the host (numpy, setup-time) path; the assembled operators are
device-resident CSR matrices.
"""

from __future__ import annotations

from math import factorial

import numpy as np

from ..mesh.core import Mesh
from ..ops.csr import CSR, csr_from_coo
from .quadrature import simplex_rule


def _second_moment(d: int) -> np.ndarray:
    """M2[a,b] = int_S lambda_a lambda_b / |S| on a d-simplex."""
    n = d + 1
    return (np.ones((n, n)) + np.eye(n)) / ((d + 1) * (d + 2))


def _third_moment(d: int) -> np.ndarray:
    """M3[a,b,c] = int_S lambda_a lambda_b lambda_c / |S| on a d-simplex.

    int_S prod lambda_i^{a_i} = |S| d! prod(a_i!) / (d + sum a_i)!.
    """
    n = d + 1
    m3 = np.zeros((n, n, n))
    denom = factorial(d + 3)
    for a in range(n):
        for b in range(n):
            for c in range(n):
                counts = np.bincount([a, b, c], minlength=n)
                num = factorial(d)
                for cnt in counts:
                    num *= factorial(cnt)
                m3[a, b, c] = num / denom
    return m3


def assemble_mass(mesh: Mesh, dirichlet_dofs=None) -> CSR:
    """C = int phi_k phi_j dx (reference: acoustic_matrices.py:121-125)."""
    d = mesh.dim
    vol = mesh.cell_volumes()
    m2 = _second_moment(d)
    elem = vol[:, None, None] * m2[None, :, :]  # (nc, d+1, d+1)
    return _scatter_matrix(mesh, elem, dirichlet_dofs)


def assemble_stiffness_csq(mesh: Mesh, c_vals: np.ndarray, dirichlet_dofs=None,
                           dg0: bool = False) -> CSR:
    """A = -int c^2 grad(phi_k).grad(phi_j) dx, c a P1 field (or per-cell DG0
    with ``dg0=True``) (reference: acoustic_matrices.py:101-105).  Exact:
    grads are constant and int_K c^2 = |K| * c^T M2 c per element (P1) or
    |K| c_K^2 (DG0)."""
    d = mesh.dim
    vol = mesh.cell_volumes()
    g = mesh.cell_grads()  # (nc, d+1, d)
    if dg0:
        w2 = vol * np.asarray(c_vals) ** 2
    else:
        m2 = _second_moment(d)
        ce = c_vals[mesh.cells]  # (nc, d+1)
        w2 = vol * np.einsum("ka,ab,kb->k", ce, m2, ce)  # int_K c^2
    gg = np.einsum("kid,kjd->kij", g, g)
    elem = -w2[:, None, None] * gg
    return _scatter_matrix(mesh, elem, dirichlet_dofs)


def facet_adjacent_cells(mesh: Mesh, facets: np.ndarray) -> np.ndarray:
    """Cell id adjacent to each boundary facet (needed to evaluate DG0
    coefficients on facet integrals, like dolfinx does for exterior facets)."""
    from ..native import facet_adjacency

    native = facet_adjacency(mesh.cells, facets)
    if native is not None:
        return native
    d = mesh.dim
    # enumerate cell faces (vertex subsets of size d)
    import itertools

    combos = list(itertools.combinations(range(d + 1), d))
    face_map = {}
    for combo in combos:
        faces = np.sort(mesh.cells[:, combo], axis=1)
        for ci, fv in enumerate(faces):
            face_map.setdefault(tuple(fv), ci)
    out = np.empty(len(facets), dtype=np.int64)
    for i, f in enumerate(np.sort(facets, axis=1)):
        out[i] = face_map[tuple(f)]
    return out


def assemble_boundary_mass(mesh: Mesh, contributions) -> CSR | None:
    """B = sum over (tag, coeff) of  coeff * int c phi_k phi_j ds(tag)
    with c the P1 sound-speed field or a per-cell DG0 field
    (reference: acoustic_matrices.py:68-97).

    ``contributions``: list of (tag, complex_coeff, c_vals, dg0_flag);
    the 1j/Z factor goes into complex_coeff.
    """
    if not contributions:
        return None
    n = mesh.num_vertices
    rows, cols = [], []
    vre, vim = [], []
    m = mesh.dim - 1
    m3 = _third_moment(m) if m > 0 else None
    m2f = _second_moment(m) if m > 0 else None
    for tag, coeff, c_vals, dg0 in contributions:
        facets = mesh.facets_with_tag(tag)
        if facets.shape[0] == 0:
            continue
        meas = mesh.facet_measures(facets)
        if dg0:
            cf = np.asarray(c_vals)[facet_adjacent_cells(mesh, facets)]  # (nf,)
        else:
            cf = c_vals[facets]  # (nf, m+1)
        if m == 0:
            cfacet = cf if dg0 else cf[:, 0]
            # facet is a single vertex: B += coeff * c(vertex) at the diagonal
            vals = coeff * cfacet * meas
            rows.append(facets[:, 0])
            cols.append(facets[:, 0])
            vre.append(vals.real)
            vim.append(vals.imag)
        else:
            if dg0:
                elem = (meas * cf)[:, None, None] * m2f[None, :, :]
            else:
                elem = meas[:, None, None] * np.einsum("fk,kij->fij", cf, m3)
            vals = coeff * elem
            nf, nl = facets.shape
            r = np.repeat(facets, nl, axis=1).reshape(nf, nl, nl)
            c = np.repeat(facets[:, None, :], nl, axis=1)
            rows.append(r.ravel())
            cols.append(c.ravel())
            vre.append(vals.real.ravel())
            vim.append(vals.imag.ravel())
    if not rows:
        return None
    return csr_from_coo(n, np.concatenate(rows), np.concatenate(cols),
                        np.concatenate(vre), np.concatenate(vim))


def _scatter_matrix(mesh: Mesh, elem: np.ndarray, dirichlet_dofs=None) -> CSR:
    """Scatter element matrices (nc, nl, nl) into CSR, applying Dirichlet bcs
    dolfinx-style: bc rows/cols zeroed at the element level, unit diagonal."""
    nc, nl, _ = elem.shape
    cells = mesh.cells
    if dirichlet_dofs is not None and len(dirichlet_dofs):
        bc = np.zeros(mesh.num_vertices, dtype=bool)
        bc[np.asarray(dirichlet_dofs)] = True
        mask = bc[cells]  # (nc, nl)
        keep = ~(mask[:, :, None] | mask[:, None, :])
        elem = np.where(keep, elem, 0.0)
    r = np.repeat(cells, nl, axis=1).reshape(nc, nl, nl)
    c = np.repeat(cells[:, None, :], nl, axis=1)
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
    return csr_from_coo(mesh.num_vertices, rows, cols, vre, np.zeros_like(vre))


def facet_integral_p1(mesh: Mesh, tag: int, f_vals: np.ndarray | None = None):
    """int_{ds(tag)} f ds for a P1 field (f=1 if None) — used for the choked
    boundary surface averages (reference: acoustic_matrices.py:75-90)."""
    facets = mesh.facets_with_tag(tag)
    meas = mesh.facet_measures(facets)
    if f_vals is None:
        return meas.sum()
    m = facets.shape[1]
    return np.sum(meas / m * f_vals[facets].sum(axis=1)) if m > 1 else np.sum(meas * f_vals[facets[:, 0]])


def assemble_p1p1_vector(mesh: Mesh, a_vals: np.ndarray, b_vals: np.ndarray,
                         scale: float = 1.0, cells: np.ndarray | None = None) -> np.ndarray:
    """vec_j = scale * int a b phi_j dx with a, b P1 fields (exact third moments).
    Used for the flame `left` vector (reference: flame_matrices.py:199)."""
    d = mesh.dim
    cell_ids = np.arange(mesh.num_cells) if cells is None else np.asarray(cells)
    vol = mesh.cell_volumes()[cell_ids]
    conn = mesh.cells[cell_ids]
    m3 = _third_moment(d)
    ae = a_vals[conn]
    be = b_vals[conn]
    elem = scale * vol[:, None] * np.einsum("ka,kb,abi->ki", ae, be, m3)
    out = np.zeros(mesh.num_vertices, dtype=elem.dtype)
    np.add.at(out, conn, elem)
    return out


def assemble_dg0p1_vector(mesh: Mesh, h_cellvals: np.ndarray, g_vals: np.ndarray,
                          scale: float = 1.0, cells: np.ndarray | None = None) -> np.ndarray:
    """vec_j = scale * int h g phi_j dx with h DG0 (per-cell), g P1.
    Used for the pointwise flame left vector with Q_multiple heat release
    (reference: flame_matrices.py:139-141, parameters_utils.py:228-246)."""
    d = mesh.dim
    cell_ids = np.arange(mesh.num_cells) if cells is None else np.asarray(cells)
    vol = mesh.cell_volumes()[cell_ids]
    conn = mesh.cells[cell_ids]
    m2 = _second_moment(d)
    ge = g_vals[conn]
    elem = scale * (vol * h_cellvals[cell_ids])[:, None] * np.einsum("ka,ai->ki", ge, m2)
    out = np.zeros(mesh.num_vertices, dtype=elem.dtype)
    np.add.at(out, conn, elem)
    return out


def assemble_grad_quotient_vector(mesh: Mesh, w_vals: np.ndarray, rho_vals: np.ndarray,
                                  n_r: np.ndarray, quad_degree: int = 2) -> np.ndarray:
    """vec_j = int (n_r . grad phi_j) * w / rho dx  with w, rho P1 fields
    (reference: flame_matrices.py:200).  grad phi_j is constant per cell; the
    rational factor integrates with a simplex Gauss rule."""
    d = mesh.dim
    pts, wts = simplex_rule(d, quad_degree)
    conn = mesh.cells
    vol = mesh.cell_volumes()
    g = mesh.cell_grads()  # (nc, d+1, d)
    we = w_vals[conn] @ pts.T  # (nc, nq) values at quad points
    re = rho_vals[conn] @ pts.T
    s = vol * ((we / re) @ wts)  # (nc,) int w/rho per cell
    nr = np.asarray(n_r, dtype=float)[:d]
    gn = g @ nr  # (nc, d+1)
    elem = s[:, None] * gn
    out = np.zeros(mesh.num_vertices, dtype=elem.dtype)
    np.add.at(out, conn, elem)
    return out


def integrate_p1_squared(mesh: Mesh, vals: np.ndarray):
    """int f*f dx for a P1 field (possibly complex, unconjugated) — the
    eigenvector normalization measure (reference: eigenvectors.py:47-51)."""
    d = mesh.dim
    m2 = _second_moment(d)
    fe = vals[mesh.cells]
    return np.sum(mesh.cell_volumes() * np.einsum("ka,ab,kb->k", fe, m2, fe))
