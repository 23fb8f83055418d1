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
    """Explicit complex inverse M = P^{-1} as an (re, im) pair.

    Computed via QR of the real embedding; since E(P)^{-1} = E(P^{-1}), the
    complex inverse is read off the first block column of the embedded
    inverse — pair-form matvecs then cost HALF the flops of multiplying by
    the (2n x 2n) embedded inverse (which stores every entry twice)."""

    mre: jnp.ndarray  # (n, n)
    mim: jnp.ndarray


# Split into two jits: each compiles (and caches) independently — the fused
# QR+solve graph takes an order of magnitude longer to compile on the remote
# TPU toolchain than the two stages separately.
_qr = jax.jit(jnp.linalg.qr)


@jax.jit
def _tri_inv(r: jnp.ndarray, qt: jnp.ndarray) -> jnp.ndarray:
    return jsl.solve_triangular(r, qt, lower=False)


def factor_dense(P: Z, dtype=jnp.float64) -> DenseFactor:
    """Factor at `dtype`.  On TPU, f64 QR is software-emulated (~25s at
    n=3000 on v5e) while f32 runs at MXU speed; the callers recover f64
    accuracy with iterative refinement against the exact operator
    (solvers/arnoldi._solve_wb), the classic mixed-precision direct solve."""
    n = P.re.shape[0]
    e = embed_real(P).astype(dtype)
    q, r = _qr(e)
    minv = _tri_inv(r, q.T)
    return DenseFactor(mre=minv[:n, :n], mim=minv[n:, :n])


@jax.jit
def _mv(mre, mim, br, bi):
    """Complex pair matvec/matmat: (mre + i mim)(br + i bi)."""
    return mre @ br - mim @ bi, mre @ bi + mim @ br


@jax.jit
def _mv_H(mre, mim, br, bi):
    """Conjugate-transpose matvec: M^H b."""
    return mre.T @ br + mim.T @ bi, mre.T @ bi - mim.T @ br


def dense_solve(f: DenseFactor, b: Z) -> Z:
    """x = P^{-1} b."""
    return Z(*_mv(f.mre, f.mim, b.re, b.im))


def dense_solve_H(f: DenseFactor, b: Z) -> Z:
    """x = P^{-H} b (inverse of P^H is (P^{-1})^H = M^H)."""
    return Z(*_mv_H(f.mre, f.mim, b.re, b.im))
