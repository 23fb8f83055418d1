"""Eigenvector extraction, normalization and adjoint scaling.

Reference: helmholtz_x/eigenvectors.py:11-177 and petsc4py_utils.py:100-112.
"""

from __future__ import annotations

import numpy as np

from .fem.assembly import integrate_p1_squared
from .fem.fields import Field
from .mesh.core import Mesh
from .ops.csr import CSR
from .solvers.arnoldi import EigenResult
from .utils.logging import info


def fix_sign(v: np.ndarray) -> np.ndarray:
    """Divide by the phase of the first global entry so eigenvectors are
    reproducible across solvers/shardings (reference: petsc4py_utils.py:100-112)."""
    x0 = v[0]
    if x0 == 0:
        return v
    return v / (x0 / abs(x0))


def normalize_eigenvector(mesh: Mesh, obj: EigenResult, i: int, absolute: bool = False,
                          degree: int = 1, which: str = "right", BlochRemapper=None,
                          print_eigs: bool = True):
    """Extract eigenpair i and L2-normalize: int p*p dx = 1 (unconjugated,
    complex square root — exactly the reference's measure,
    eigenvectors.py:47-51).  Returns (omega, Field)."""
    eig = obj.getEigenvalue(i)
    omega = np.sqrt(eig) if obj.kind == "eps" else eig
    v = obj.getEigenvector(i) if which == "right" else obj.getLeftEigenvector(i)
    v = np.asarray(v, dtype=np.complex128).copy()

    if BlochRemapper is not None:
        v = np.asarray(BlochRemapper @ v).ravel()

    v = fix_sign(v)
    if degree == 1:
        meas = np.sqrt(integrate_p1_squared(mesh, v))
    else:
        from .fem.p2 import P2Space, integrate_pp_p2

        meas = np.sqrt(integrate_pp_p2(P2Space.build(mesh), v))
    v = v / meas

    if absolute:
        a = np.abs(v)
        v = a / a.max()

    if print_eigs:
        info(f"Eigenvalue-> {omega:.6f} | Eigenfrequency-> {omega/(2*np.pi):.6f}\n ")
    return omega, Field(v, "p")


def velocity_eigenvector(mesh: Mesh, p: Field, omega: complex, rho, degree: int = 1,
                         normalize: bool = True, absolute: bool = False):
    """u = grad(p) / (i omega rho) from the momentum equation, interpolated
    into a (vector) CG space of the given degree (reference:
    eigenvectors.py:66-123).

    grad(p) is discontinuous across cells, so CG interpolation at shared dofs
    is a choice: dofs are written per cell in ASCENDING cell order (NumPy
    setitem keeps the last occurrence), i.e. the highest-indexed adjacent
    cell wins — the deterministic analogue of dolfinx Expression.interpolate,
    which also writes cell-by-cell in cell order."""
    d = mesh.dim
    if degree == 1:
        g = mesh.cell_grads()  # (nc, d+1, d)
        grad_cell = np.einsum("ki,kid->kd", p.values[mesh.cells], g)  # (nc, d)
        vals = np.zeros((mesh.num_vertices, d), dtype=np.complex128)
        vals[mesh.cells.ravel()] = np.repeat(grad_cell, d + 1, axis=0)
        rho_dofs = rho.values if isinstance(rho, Field) else rho
        sq_int = lambda v: integrate_p1_squared(mesh, v)  # noqa: E731
    elif degree == 2:
        from .fem.p2 import P2Space, eval_p2_at_points, integrate_pp_p2

        space = P2Space.build(mesh)
        dofs = space.cell_dofs  # (nc, nloc)
        pts = space.dof_coordinates()[dofs.ravel()]
        cells_flat = np.repeat(np.arange(mesh.num_cells), space.nloc)
        _, grads, _ = eval_p2_at_points(space, p.values.astype(np.complex128),
                                        cells_flat, pts)
        vals = np.zeros((space.ndofs, d), dtype=np.complex128)
        vals[dofs.ravel()] = grads
        rho_dofs = (space.interpolate_p1(rho.values)
                    if isinstance(rho, Field) else rho)
        sq_int = lambda v: integrate_pp_p2(space, v)  # noqa: E731
    else:
        raise NotImplementedError(f"unsupported degree {degree}")

    if isinstance(rho, Field):
        vals = vals / np.asarray(rho_dofs)[:, None]
    else:
        vals = vals / rho
    vals = vals / (1j * omega)
    if normalize:
        # int u . conj(u) dx = 1 (reference uses UFL inner(v,v), which
        # conjugates in complex mode — unlike the pressure's p*p measure)
        meas = np.sqrt(sum(sq_int(vals[:, c].real) + sq_int(vals[:, c].imag)
                           for c in range(d)))
        vals = vals / meas
    if absolute:
        mag = np.abs(np.sqrt(np.sum(vals**2, axis=1)))
        vals = np.abs(vals) / mag.max()
    if d == 1:
        return Field(vals[:, 0], "U")
    return Field(vals, "U")


def vec_mat_vec(y: np.ndarray, Ax: np.ndarray) -> complex:
    """(A x)^H y — the contraction the reference's vector_matrix_vector
    actually computes through PETSc VecDot semantics
    (reference: petsc4py_utils.py:42-89: z = x1.dot-conjugated with y0)."""
    return complex(np.vdot(Ax, y))


def _apply_dl_domega(omega: complex, matrices, D, x: np.ndarray) -> np.ndarray:
    """(B + 2 omega C - D'(omega)) x with B/D optional
    (reference: eigenvectors.py:147-163)."""
    from .ops.csr import spmv
    from .ops.cplx import zarray

    Cx = matrices.C.to_scipy() @ x
    out = 2 * omega * Cx
    if matrices.B is not None:
        out = out + matrices.B.to_scipy() @ x
    if D is not None:
        out = out - D.get_derivative(omega).matvec(x)
    return out


def normalize_adjoint(omega_dir: complex, p_dir: Field, p_adj: Field, matrices,
                      D=None) -> Field:
    """Scale p_adj so <p_adj, dL/domega p_dir> = 1 — the canonical adjoint
    normalization for sensitivity formulas (reference: eigenvectors.py:125-177,
    including the PETSc VecDot conjugation convention)."""
    info("- Normalizing the adjoint eigenvector to calculate shape derivatives..")
    dlp = _apply_dl_domega(omega_dir, matrices, D, p_dir.values)
    meas = vec_mat_vec(p_adj.values, dlp)
    out = Field(p_adj.values / meas, "p_adj")
    check = vec_mat_vec(out.values, dlp)
    info(f"! Normalization Check:  {check}")
    return out
