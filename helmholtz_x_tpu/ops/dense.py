"""Dense complex factorization on TPU via the real 2n-embedding + QR.

This TPU backend implements neither LU (f32/f64/c64) nor complex QR, but it
*does* implement f64 Householder QR and f64 triangular solves.  So the direct
solver for the shifted operator P = A + sigma*B + sigma^2*C factors the real
embedding  E(P) = [[Re, -Im], [Im, Re]]  with QR:

    E(P) = Q R,   P x = b  <=>  R xe = Q^T be
    P^H x = b     <=>  E(P)^T xe = be  <=>  xe = Q (R^T \\ be)

(E(P^H) = E(P)^T, so conjugate-transpose solves reuse the same factors.)

QR is unconditionally stable — no pivoting machinery needed — and both the
factorization and the solves run entirely on the MXU/VPU.

Replaces the reference's PETSc LU inside SLEPc's shift-invert ST
(reference: helmholtz_x/eigensolvers.py:49-55).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .cplx import Z, embed_real, embed_vec, unembed_vec


class DenseFactor(NamedTuple):
    """QR factorization of the real embedding of a complex matrix."""

    q: jnp.ndarray  # (2n, 2n)
    r: jnp.ndarray  # (2n, 2n)
    n: int


@partial(jax.jit, static_argnames=())
def _qr(e: jnp.ndarray):
    return jnp.linalg.qr(e)


def factor_dense(P: Z) -> DenseFactor:
    e = embed_real(P)
    q, r = _qr(e)
    return DenseFactor(q=q, r=r, n=P.re.shape[0])


@jax.jit
def _solve(q, r, be):
    return jsl.solve_triangular(r, q.T @ be, lower=False)


@jax.jit
def _solve_T(q, r, be):
    return q @ jsl.solve_triangular(r.T, be, lower=True)


def dense_solve(f: DenseFactor, b: Z) -> Z:
    """x = P^{-1} b."""
    return unembed_vec(_solve(f.q, f.r, embed_vec(b)))


def dense_solve_H(f: DenseFactor, b: Z) -> Z:
    """x = P^{-H} b."""
    return unembed_vec(_solve_T(f.q, f.r, embed_vec(b)))
