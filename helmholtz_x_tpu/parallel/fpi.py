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
    partition_csr, shard_block, shard_vector
from .halo import build_ras, make_halo_gmres_solve, partition_halo_csr


class DistShiftedSolver:
    """Distributed P(sigma)^{-1} with restarted, block-Jacobi preconditioned
    GMRES on the halo layout (all_gather fallback for wide bandwidths).

    Vectors enter/leave in the ORIGINAL dof ordering; the RCM permutation
    and padding live entirely inside."""

    def __init__(self, P_scipy, mesh: Mesh, n_devices: int,
                 m_krylov: int = 40, inner_tol: float = 1e-10,
                 max_restarts: int = 100, precond: str | None = "ras"):
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
            try:
                self.H_sh, _, self.n_local, self.hw = partition_halo_csr(
                    pad, n_devices, mesh)
                if precond == "ras" and self.hw > 0:
                    pc = build_ras(pad, n_devices, n_local, self.hw, mesh)
                    pc_kind = "ras"
                elif precond in ("ras", "bjacobi"):
                    pc = build_block_jacobi(pad, n_devices, n_local, mesh)
                    pc_kind = "bjacobi"
                else:
                    pc, pc_kind = None, "none"
                self._solve_fn = make_halo_gmres_solve(
                    mesh, self.H_sh, self.hw, self.n_local, n_devices,
                    m_krylov=m_krylov, pc=pc, pc_kind=pc_kind)
                self.layout = "halo"
                self.pc_kind = pc_kind
            except ValueError:
                pc = (build_block_jacobi(pad, n_devices, n_local, mesh)
                      if precond in ("ras", "bjacobi") else None)
                self.H_sh, _, self.n_local = partition_csr(pad, n_devices, mesh)
                self.hw = -1
                self._solve_fn = make_dist_gmres_solve(
                    mesh, self.H_sh, self.n_local, n_devices,
                    m_krylov=m_krylov, pc=pc)
                self.layout = "all_gather"
                self.pc_kind = "bjacobi" if pc is not None else "none"

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Restarted GMRES to inner_tol on the TRUE residual (host check)."""
        return self.solve_block(np.asarray(b)[:, None])[:, 0]

    def solve_block(self, B: np.ndarray) -> np.ndarray:
        """Solve P X = B for a (n, k) block of RHS.  On the halo layout all
        k columns advance one restart per DISPATCH (vmapped GMRES inside
        shard_map); restart checks are on the TRUE residual per column."""
        from ..utils.metrics import record

        B = np.asarray(B, dtype=np.complex128).reshape(self.n, -1)
        k = B.shape[1]
        Bp = B[self.perm]
        b_norms = np.maximum(np.linalg.norm(Bp, axis=0), 1e-300)
        X = np.zeros((self.n, k), dtype=np.complex128)
        R = Bp.copy()
        restarts = self.max_restarts
        for it in range(self.max_restarts):
            with self.mesh:
                if self.layout == "halo":
                    rz = shard_block(R, self.n_pad, self.n_devices, self.mesh)
                    dre, dim_ = self._solve_fn(self.H_sh, rz.re, rz.im)
                    dX = (np.asarray(dre) + 1j * np.asarray(dim_))
                    dX = dX.transpose(1, 0, 2).reshape(k, self.n_pad).T[: self.n]
                else:
                    cols = []
                    for j in range(k):
                        rz = shard_vector(R[:, j], self.n_pad,
                                          self.n_devices, self.mesh)
                        dre, dim_ = self._solve_fn(self.H_sh, rz.re, rz.im)
                        cols.append((np.asarray(dre)
                                     + 1j * np.asarray(dim_)).ravel()[: self.n])
                    dX = np.stack(cols, axis=1)
            X = X + dX
            R = Bp - self._P_perm @ X
            if (np.linalg.norm(R, axis=0) <= self.inner_tol * b_norms).all():
                restarts = it + 1
                break
        rels = np.linalg.norm(R, axis=0) / b_norms
        record("dist_solve", restarts=restarts, k=k,
               rel=float(rels.max()))
        return X[self.iperm]


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
    import time as _time

    phases: dict = {}
    t0 = _time.perf_counter()
    solver = DistShiftedSolver(P_scipy, mesh, n_devices, m_krylov=m_krylov,
                               inner_tol=inner_tol)
    phases["setup_s"] = _time.perf_counter() - t0
    info(f"- Distributed shifted solver ready ({solver.layout} SpMV layout, "
         f"halo width {solver.hw}).")

    t0 = _time.perf_counter()
    W = solver.solve_block(L)
    relW = float(np.linalg.norm(P_scipy @ W - L)
                 / max(np.linalg.norm(L), 1e-300))
    if not np.isfinite(relW) or relW > 1e-6:
        info(f"! distributed factor health check failed ({relW:.1e}).")
        return None

    depth = max(2, -(-m // k))
    n = A.n
    if eps_kind:
        def block_apply(rows):
            return solver.solve_block(Csp @ rows.T).T

        V = _host_block_arnoldi(None, W, depth, block_apply=block_apply)
    else:
        def block_apply2n(rows):
            V1 = rows[:, :n].T
            V2 = rows[:, n:].T
            rhs = Bsp @ V1 + Csp @ (V2 + sigma * V1)
            Z1 = -solver.solve_block(rhs)
            return np.concatenate([Z1, V1 + sigma * Z1], axis=0).T

        start2n = np.concatenate([W, sigma * W], axis=0)
        rows2n = _host_block_arnoldi(None, start2n, depth,
                                     block_apply=block_apply2n)
        halves = np.concatenate([rows2n[:, :n], rows2n[:, n:]], axis=0)
        V = _orth_rows(np.concatenate([halves, W.T], axis=0))
    phases["basis_s"] = _time.perf_counter() - t0

    # Galerkin projection with SHARDED SpMMs: the m' basis-column products
    # A V^T / B V^T / C V^T run over the device mesh (halo layout); only
    # the tiny (m', m') recombinations stay on host.
    t0 = _time.perf_counter()
    proj = project_dist(solver, V, A, B, C, L, R)
    phases["project_s"] = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    lam, Y, iters, sc = fpi_on_projection(proj, D, target, nev, i, tol,
                                          maxiter, problem_type, eps_kind,
                                          ops=(A, B, C, L, R))
    phases["fpi_s"] = _time.perf_counter() - t0

    def _solve_at(lam0: complex, ek: bool):
        """Sharded polish solver for Q(lam0) (finalize inverse iteration)."""
        Q = (Asp + lam0 * Csp if ek
             else Asp + lam0 * Bsp + lam0 * lam0 * Csp)
        s2 = DistShiftedSolver(Q, mesh, n_devices, m_krylov=m_krylov,
                               inner_tol=inner_tol)
        return s2.solve_block

    t0 = _time.perf_counter()
    res = finalize_projected(proj, A, B, C, L, R, lam, Y, iters, sc, sigma,
                             nev, i, eps_kind, print_results,
                             solve_at=_solve_at)
    phases["finalize_s"] = _time.perf_counter() - t0
    # solve-phase work (basis solves, projection SpMMs, finalize polish
    # solves) runs sharded; host-side remains the CGS2 re-orthogonalization
    # inside the basis loop, the (m', m') recombinations and the m x m FPI
    dist_s = phases["basis_s"] + phases["project_s"] + phases["finalize_s"]
    total_s = dist_s + phases["fpi_s"]
    phases["distributed_fraction"] = round(dist_s / max(total_s, 1e-9), 3)
    dist_projected_fpi.last_phases = {kk: (round(v, 3) if isinstance(v, float)
                                           else v)
                                      for kk, v in phases.items()}
    from ..utils.metrics import record

    record("dist_fpi_phases", **dist_projected_fpi.last_phases)
    return res


def project_dist(solver: DistShiftedSolver, V: np.ndarray, A, B, C,
                 L: np.ndarray, R: np.ndarray) -> ProjectedPencil:
    """Galerkin projection with the operator SpMMs sharded over the mesh.

    Each of A, B, C is partitioned once onto the solver's halo layout (same
    RCM permutation and padding) and applied to all m' basis columns in one
    dispatch; the (m', m') recombination matmuls are tiny and stay on host.
    Falls back to the host-scipy `project` when the solver runs the
    all_gather layout (bandwidth too wide for halos)."""
    if solver.layout != "halo":
        return project(V, A, B, C, L, R)
    from .halo import make_halo_spmm, partition_halo_csr

    n = A.n
    Vc = np.conj(V)
    Xt = V.T  # (n, m') columns in original ordering

    def mm(Msp):
        import scipy.sparse as sp

        ap = sp.csr_matrix(Msp)[solver.perm][:, solver.perm].tocsr()
        pad = sp.lil_matrix((solver.n_pad, solver.n_pad), dtype=np.complex128)
        pad[:n, :n] = ap
        pad = pad.tocsr()
        with solver.mesh:
            H_sh, _, n_local, hw = partition_halo_csr(
                pad, solver.n_devices, solver.mesh, hw=solver.hw)
            fn = make_halo_spmm(solver.mesh, H_sh, hw, n_local,
                                solver.n_devices)
            Xp = np.zeros((solver.n_pad, Xt.shape[1]), dtype=np.complex128)
            Xp[:n] = Xt[solver.perm]
            rz = shard_block(Xp, solver.n_pad, solver.n_devices, solver.mesh)
            yr, yi = fn(H_sh, rz.re, rz.im)
            Y = (np.asarray(yr) + 1j * np.asarray(yi))
            Y = Y.transpose(1, 0, 2).reshape(Xt.shape[1], solver.n_pad).T
        return Y[: n][solver.iperm]

    Ah = Vc @ mm(A.to_scipy())
    Ch = Vc @ mm(C.to_scipy())
    Bh = Vc @ mm(B.to_scipy()) if B is not None else None
    L = np.asarray(L, dtype=np.complex128).reshape(n, -1)
    R = np.asarray(R, dtype=np.complex128).reshape(n, -1)
    return ProjectedPencil(V=V, Ah=Ah, Bh=Bh, Ch=Ch, Lh=Vc @ L, Rh=V @ R)
