"""Numeric check of projection._resolvent_eigenpair on a small synthetic
rank-k quadratic pencil with a known eigenpair (host, CPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_enable_x64", True)

from helmholtz_x_tpu.ops.csr import csr_from_scipy
from helmholtz_x_tpu.solvers.projection import (_resolvent_eigenpair,
                                                true_rel_residual)

rng = np.random.default_rng(3)
n, k = 400, 3

# banded-ish SPD-ish complex matrices
main = 4.0 + rng.standard_normal(n) * 0.1
off = rng.standard_normal(n - 1) * 0.5
A_s = sp.diags([off, main, off], [-1, 0, 1]).tocsr() * 1e4
C_s = sp.diags([np.full(n - 1, 0.2), np.ones(n), np.full(n - 1, 0.2)],
               [-1, 0, 1]).tocsr() * -1.0
B_s = sp.diags(rng.standard_normal(n) * 1j * 5.0).tocsr()
L = (rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k)))
R = (rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k)))
L[np.abs(L) < 1.2] = 0.0  # sparsify like a flame column
R[np.abs(R) < 1.2] = 0.0
sc = 2.0 + 1.0j

# exact eigenvalue of the full quadratic pencil via companion linearization
Ad = A_s.toarray() - sc * (L @ R.T)
Bd = B_s.toarray()
Cd = C_s.toarray()
comp = np.block([[np.zeros((n, n)), np.eye(n)],
                 [-np.linalg.solve(Cd, Ad), -np.linalg.solve(Cd, Bd)]])
lams, vecs = np.linalg.eig(comp)
target = 150.0
j = int(np.argmin(np.abs(lams - target)))
lam = lams[j]
x_true = vecs[:n, j]
x_true /= np.linalg.norm(x_true)

A = csr_from_scipy(A_s)
B = csr_from_scipy(B_s)
C = csr_from_scipy(C_s)
rel_true = true_rel_residual(A, B, C, L, R, sc, lam, x_true)
print("true eigpair residual:", rel_true)

x_r, _ = _resolvent_eigenpair(A, B, C, L, R, sc, lam, eps_kind=False)
rel_r = true_rel_residual(A, B, C, L, R, sc, lam, x_r)
print("resolvent-recovered residual:", rel_r)
print("alignment |<x_true, x_r>|:", abs(np.vdot(x_true, x_r)))

# perturbed eigenvalue (1e-7 relative, like the projected-FPI output)
lam_p = lam * (1 + 1e-7)
x_p, _ = _resolvent_eigenpair(A, B, C, L, R, sc, lam_p, eps_kind=False)
rel_p = true_rel_residual(A, B, C, L, R, sc, lam_p, x_p)
print("recovered at 1e-7-perturbed lam:", rel_p,
      "align", abs(np.vdot(x_true, x_p)))

# eps_kind check: pencil (A + lam C - sc L R^T) x = 0
Ad2 = A_s.toarray() - sc * (L @ R.T)
lam2, v2 = np.linalg.eig(np.linalg.solve(-Cd, Ad2))
j2 = int(np.argmin(np.abs(lam2 - 9000.0)))
x2 = v2[:, j2] / np.linalg.norm(v2[:, j2])
r2 = true_rel_residual(A, None, C, L, R, sc, lam2[j2], x2)
xr2, _ = _resolvent_eigenpair(A, None, C, L, R, sc, lam2[j2], eps_kind=True)
rr2 = true_rel_residual(A, None, C, L, R, sc, lam2[j2], xr2)
print("eps: true", r2, "recovered", rr2, "align", abs(np.vdot(x2, xr2)))
