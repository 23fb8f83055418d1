"""Distributed inexact shift-invert eigensolve over a device mesh.

The multi-chip path when one chip cannot hold a factorization: the inner
solve (A + sigma C)^{-1} b runs as restarted distributed GMRES (jitted
shard_map step from dist.py — sharded SpMV via all_gather, psum dots), and a
host-driven Arnoldi wraps it exactly like the single-chip driver.

This is the reference implementation of the scalable path; its gate is
serial-vs-sharded eigenvalue equality (tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh

from .dist import (AXIS, build_block_jacobi, make_dist_gmres_solve,
                   partition_csr, shard_vector)


class DistShiftInvert:
    """(A + sigma C)^{-1} (C x) with restarted distributed GMRES, optionally
    block-Jacobi preconditioned (each shard's diagonal block factored by the
    banded tier; application is communication-free inside the GMRES body)."""

    def __init__(self, A_scipy, C_scipy, sigma: complex, mesh: Mesh,
                 n_devices: int, m_krylov: int = 30, inner_tol: float = 1e-12,
                 max_restarts: int = 200, precond: str | None = "bjacobi"):
        import scipy.sparse as sp

        n = A_scipy.shape[0]
        shifted = (A_scipy + sigma * C_scipy).tocsr()
        n_local = -(-n // n_devices)
        n_pad = n_local * n_devices

        def pad(mat, diag=1.0):
            out = sp.lil_matrix((n_pad, n_pad), dtype=np.complex128)
            out[:n, :n] = mat
            for i in range(n, n_pad):
                out[i, i] = diag
            return out.tocsr()

        self.n = n
        self.n_pad = n_pad
        self.n_devices = n_devices
        self.mesh = mesh
        self.shifted = shifted
        self.C = C_scipy
        self.inner_tol = inner_tol
        self.max_restarts = max_restarts
        shifted_pad = pad(shifted)
        with mesh:
            self.A_sh, _, self.n_local = partition_csr(shifted_pad, n_devices, mesh)
            pc = (build_block_jacobi(shifted_pad, n_devices, self.n_local, mesh)
                  if precond == "bjacobi" else None)
            self.solve_step = make_dist_gmres_solve(mesh, self.A_sh, self.n_local,
                                                    n_devices, m_krylov=m_krylov,
                                                    pc=pc)

    def _gmres_restarted(self, b: np.ndarray) -> np.ndarray:
        """Restarted GMRES: each restart runs the jitted distributed GMRES(m)
        on the current residual (host restart logic, device inner solves)."""
        x = np.zeros(self.n, dtype=np.complex128)
        r = b.copy()
        b_norm = np.linalg.norm(b)
        for _ in range(self.max_restarts):
            with self.mesh:
                rz = shard_vector(r, self.n_pad, self.n_devices, self.mesh)
                dre, dim_ = self.solve_step(self.A_sh, rz.re, rz.im)
            dx = (np.asarray(dre) + 1j * np.asarray(dim_)).reshape(-1)[: self.n]
            x = x + dx
            r = b - self.shifted @ x
            if np.linalg.norm(r) < self.inner_tol * b_norm:
                break
        return x

    def apply(self, v: np.ndarray) -> np.ndarray:
        """op(v) = (A + sigma C)^{-1} (-C v) — the eps shift-invert operator."""
        return self._gmres_restarted(-(self.C @ v))


def dist_eps_solve(A_scipy, C_scipy, target: complex, mesh: Mesh,
                   n_devices: int, nev: int = 1, mmax: int = 60,
                   tol: float = 1e-10, m_krylov: int = 40,
                   precond: str | None = "bjacobi"):
    """Distributed analogue of eps_solver: lambda nearest target^2 of the
    pencil A x = lambda (-C) x, inner solves on the device mesh.

    The inner GMRES is block-Jacobi preconditioned by default: each shard's
    diagonal block is factored once by the banded tier and applied locally
    (zero communication), so restarted GMRES(m) converges at small m even on
    the indefinite shifted Helmholtz operator — the role PETSc's PCBJACOBI
    plays under the reference's SLEPc shift-invert (eigensolvers.py:49-55)."""
    sigma = complex(target) ** 2
    op = DistShiftInvert(A_scipy, C_scipy, sigma, mesh, n_devices,
                         m_krylov=m_krylov, precond=precond)
    n = A_scipy.shape[0]
    rng = np.random.default_rng(7)
    v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v /= np.linalg.norm(v)
    V = np.zeros((mmax + 1, n), dtype=np.complex128)
    V[0] = v
    H = np.zeros((mmax + 1, mmax), dtype=np.complex128)
    for j in range(mmax):
        w = op.apply(V[j])
        h = np.conj(V) @ w
        w = w - V.T @ h
        h2 = np.conj(V) @ w
        w = w - V.T @ h2
        h += h2
        beta = np.linalg.norm(w)
        V[j + 1] = w / beta
        h[j + 1] = beta
        H[:, j] = h
        if j + 1 >= nev + 2:
            nus, ys = np.linalg.eig(H[: j + 1, : j + 1])
            order = np.argsort(-np.abs(nus))
            resid = beta * np.abs(ys[-1, order[:nev]]) / np.abs(nus[order[:nev]])
            if np.all(resid < tol):
                lams = sigma + 1.0 / nus[order]
                vecs = V[: j + 1].T @ ys[:, order]
                return lams[:nev], vecs[:, :nev]
    lams = sigma + 1.0 / nus[order]
    return lams[:nev], V[: j + 1].T @ ys[:, order[:nev]]
