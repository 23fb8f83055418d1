"""Dense complex factorization on TPU via the real 2n-embedding + QR.

This TPU backend implements neither LU (f32/f64/c64) nor complex QR, but it
*does* implement f64 Householder QR and f64 triangular solves.  The direct
solver for the shifted operator P = A + sigma*B + sigma^2*C therefore factors
the real embedding  E(P) = [[Re, -Im], [Im, Re]]  with QR and immediately
forms the explicit inverse

    M = R^{-1} Q^T      (one triangular solve with 2n right-hand sides,
                         fully parallel on the MXU)

so that every subsequent solve in the Krylov loop is a single dense matvec
(P x = b  <=>  xe = M be) and conjugate-transpose solves are free
(E(P^H) = E(P)^T  =>  xe = M^T be).  TPU triangular solves are latency-bound
and sequential per right-hand side — paying one batched solve at factor time
instead of one solve per Arnoldi step is a ~10x wall-clock win.

QR is unconditionally stable and the shifted operators here are far from
singular (the shift targets a resolvent point, not an eigenvalue), so the
explicit inverse loses no accuracy that the 1e-8 outer tolerances can see.

Replaces the reference's PETSc LU inside SLEPc's shift-invert ST
(reference: helmholtz_x/eigensolvers.py:49-55).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .cplx import Z, embed_real, embed_vec, unembed_vec


class DenseFactor(NamedTuple):
    """Explicit inverse of the real embedding of a complex matrix."""

    minv: jnp.ndarray  # (2n, 2n) = R^{-1} Q^T
    n: int


# Split into two jits: each compiles (and caches) independently — the fused
# QR+solve graph takes an order of magnitude longer to compile on the remote
# TPU toolchain than the two stages separately.
_qr = jax.jit(jnp.linalg.qr)


@jax.jit
def _tri_inv(r: jnp.ndarray, qt: jnp.ndarray) -> jnp.ndarray:
    return jsl.solve_triangular(r, qt, lower=False)


def factor_dense(P: Z) -> DenseFactor:
    e = embed_real(P)
    q, r = _qr(e)
    return DenseFactor(minv=_tri_inv(r, q.T), n=P.re.shape[0])


@jax.jit
def _solve(minv, be):
    return minv @ be


@jax.jit
def _solve_T(minv, be):
    return minv.T @ be


def dense_solve(f: DenseFactor, b: Z) -> Z:
    """x = P^{-1} b."""
    return unembed_vec(_solve(f.minv, embed_vec(b)))


def dense_solve_H(f: DenseFactor, b: Z) -> Z:
    """x = P^{-H} b."""
    return unembed_vec(_solve_T(f.minv, embed_vec(b)))
