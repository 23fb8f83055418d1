"""Production multi-chip nonlinear eigensolve: the resolvent-projection FPI
with DISTRIBUTED inner solves over a jax.sharding.Mesh.

The reference runs every case under `mpirun -np {4,8}` with PETSc 'mpiaij'
row-partitioned operators and SLEPc solving the distributed pencil
(reference: eigensolvers.py:43 EPS.create(COMM_WORLD); flame_matrices.py:167
row partition; runAll.sh in every example dir).  The TPU-native equivalent:

  * dofs RCM-reordered (bandwidth locality) and row-partitioned in
    contiguous blocks over a 1-D device mesh,
  * the shifted passive operator P(sigma) solved by block-Jacobi
    preconditioned distributed GMRES — halo-exchange SpMV (two ppermute
    slabs per matvec, parallel/halo.py) + psum reductions, one jitted
    shard_map program per restart,
  * ONE resolvent-Krylov basis built from W = P^{-1}L (solvers/projection.py
    design: the rank-k flame makes the active eigenvector a resolvent of the
    flame columns), Galerkin-projected in exact f64,
  * the reference's Aitken FPI runs on the replicated m x m projected pencil,
  * the converged eigenpair is verified against the exact operator.

Serial == sharded to ~1e-10 by construction (same projected pencil, exact
projections); tests/test_dist_fpi.py gates it at 1e-8.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from jax.sharding import Mesh

from ..solvers.arnoldi import EigenResult
from ..solvers.projection import (ProjectedPencil, _host_block_arnoldi,
                                  _orth_rows, default_m, finalize_projected,
                                  fpi_on_projection, project)
from ..utils.logging import info
from .dist import AXIS, build_block_jacobi, make_dist_gmres_solve, \
    partition_csr, shard_vector
from .halo import make_halo_gmres_solve, partition_halo_csr


class DistShiftedSolver:
    """Distributed P(sigma)^{-1} with restarted, block-Jacobi preconditioned
    GMRES on the halo layout (all_gather fallback for wide bandwidths).

    Vectors enter/leave in the ORIGINAL dof ordering; the RCM permutation
    and padding live entirely inside."""

    def __init__(self, P_scipy, mesh: Mesh, n_devices: int,
                 m_krylov: int = 40, inner_tol: float = 1e-10,
                 max_restarts: int = 100, precond: str | None = "bjacobi"):
        import scipy.sparse as sp

        from ..native import rcm

        n = P_scipy.shape[0]
        a = sp.csr_matrix(P_scipy).astype(np.complex128)
        pattern = sp.csr_matrix((np.ones(a.nnz), a.indices, a.indptr),
                                shape=a.shape)
        sym = ((pattern + pattern.T) > 0).astype(np.float64).tocsr()
        self.perm = rcm(sym.indptr.astype(np.int64),
                        sym.indices.astype(np.int64))
        self.iperm = np.empty(n, dtype=np.int64)
        self.iperm[self.perm] = np.arange(n)
        ap = a[self.perm][:, self.perm].tocsr()

        n_local = -(-n // n_devices)
        n_pad = n_local * n_devices
        pad = sp.lil_matrix((n_pad, n_pad), dtype=np.complex128)
        pad[:n, :n] = ap
        for j in range(n, n_pad):
            pad[j, j] = 1.0
        pad = pad.tocsr()

        self.n = n
        self.n_pad = n_pad
        self.n_devices = n_devices
        self.mesh = mesh
        self.inner_tol = inner_tol
        self.max_restarts = max_restarts
        self._P_perm = ap

        with mesh:
            pc = (build_block_jacobi(pad, n_devices, n_local, mesh)
                  if precond == "bjacobi" else None)
            try:
                self.H_sh, _, self.n_local, self.hw = partition_halo_csr(
                    pad, n_devices, mesh)
                self._solve_fn = make_halo_gmres_solve(
                    mesh, self.H_sh, self.hw, self.n_local, n_devices,
                    m_krylov=m_krylov, pc=pc)
                self.layout = "halo"
            except ValueError:
                self.H_sh, _, self.n_local = partition_csr(pad, n_devices, mesh)
                self.hw = -1
                self._solve_fn = make_dist_gmres_solve(
                    mesh, self.H_sh, self.n_local, n_devices,
                    m_krylov=m_krylov, pc=pc)
                self.layout = "all_gather"

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Restarted GMRES to inner_tol on the TRUE residual (host check)."""
        bp = np.asarray(b, dtype=np.complex128)[self.perm]
        x = np.zeros(self.n, dtype=np.complex128)
        r = bp.copy()
        b_norm = np.linalg.norm(bp)
        for _ in range(self.max_restarts):
            with self.mesh:
                rz = shard_vector(r, self.n_pad, self.n_devices, self.mesh)
                dre, dim_ = self._solve_fn(self.H_sh, rz.re, rz.im)
            dx = (np.asarray(dre) + 1j * np.asarray(dim_)).ravel()[: self.n]
            x = x + dx
            r = bp - self._P_perm @ x
            if np.linalg.norm(r) <= self.inner_tol * b_norm:
                break
        return x[self.iperm]


def dist_projected_fpi(operators, D, target: complex, mesh: Mesh,
                       n_devices: int, nev: int = 2, i: int = 0,
                       tol: float = 1e-8, maxiter: int = 50,
                       problem_type: str = "direct",
                       print_results: bool = False,
                       m: Optional[int] = None, m_krylov: int = 40,
                       inner_tol: float = 1e-10) -> Optional[EigenResult]:
    """Distributed fixed_point_iteration (auto eps/pep dispatch on B, like
    reference eigensolvers.py:261-276).  Same algorithm as the single-chip
    projection path, inner solves sharded over `mesh`."""
    from ..solvers.fpi import _flame_factors, _pick_B

    A, C = operators.A, operators.C
    B = _pick_B(operators, problem_type)
    eps_kind = B is None
    sigma = complex(target) ** 2 if eps_kind else complex(target)
    L, R = _flame_factors(D, problem_type)
    L = np.asarray(L, dtype=np.complex128).reshape(A.n, -1)
    R = np.asarray(R, dtype=np.complex128).reshape(A.n, -1)
    k = L.shape[1]
    if m is None:
        m = default_m(k, nev)
    m = min(m, A.n)

    Asp = A.to_scipy()
    Csp = C.to_scipy()
    Bsp = B.to_scipy() if B is not None else None
    P_scipy = (Asp + sigma * Csp if eps_kind
               else Asp + sigma * Bsp + sigma**2 * Csp)

    info("--> Fixed point iteration started "
         f"(distributed resolvent-projection, {n_devices} shards).\n")
    solver = DistShiftedSolver(P_scipy, mesh, n_devices, m_krylov=m_krylov,
                               inner_tol=inner_tol)
    info(f"- Distributed shifted solver ready ({solver.layout} SpMV layout, "
         f"halo width {solver.hw}).")

    W = np.stack([solver.solve(L[:, j]) for j in range(k)], axis=1)
    relW = float(np.linalg.norm(P_scipy @ W - L)
                 / max(np.linalg.norm(L), 1e-300))
    if not np.isfinite(relW) or relW > 1e-6:
        info(f"! distributed factor health check failed ({relW:.1e}).")
        return None

    depth = max(2, -(-m // k))
    n = A.n
    if eps_kind:
        def apply_fn(v):
            return solver.solve(Csp @ v)

        V = _host_block_arnoldi(apply_fn, W, depth)
    else:
        def apply2n(z):
            v1, v2 = z[:n], z[n:]
            rhs = Bsp @ v1 + Csp @ (v2 + sigma * v1)
            z1 = -solver.solve(rhs)
            return np.concatenate([z1, v1 + sigma * z1])

        start2n = np.concatenate([W, sigma * W], axis=0)
        rows2n = _host_block_arnoldi(apply2n, start2n, depth)
        halves = np.concatenate([rows2n[:, :n], rows2n[:, n:]], axis=0)
        V = _orth_rows(np.concatenate([halves, W.T], axis=0))

    proj = project(V, A, B, C, L, R)
    lam, Y, iters, sc = fpi_on_projection(proj, D, target, nev, i, tol,
                                          maxiter, problem_type, eps_kind)
    return finalize_projected(proj, A, B, C, L, R, lam, Y, iters, sc, sigma,
                              nev, i, eps_kind, print_results)
