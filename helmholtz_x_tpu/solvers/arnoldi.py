"""Shift-invert Arnoldi eigensolvers (the SLEPc EPS/PEP replacement).

Solves the linear pencil  A' x = lambda (-C) x  (EPS path, reference:
helmholtz_x/eigensolvers.py:41-67) and the quadratic pencil
(A' + lambda B + lambda^2 C) x = 0  (PEP path, reference: eigensolvers.py:69-120)
by Arnoldi iteration on the shift-inverted operator:

    EPS:  op(v) = (A' + sigma C)^{-1} (-C v),          sigma = target^2
    PEP:  companion linearization; one quadratic solve
          Q(sigma)^{-1} = (A' + sigma B + sigma^2 C)^{-1} per matvec

with eigenvalues recovered as lambda = sigma + 1/nu.  The Krylov expansion
(CGS2 orthogonalization — two classical Gram-Schmidt passes, MXU-friendly
matmuls instead of MGS's sequential dots) runs fully jitted on device in
chunks; only the tiny (m x m) Hessenberg eigenproblem runs on host, exactly
as SLEPc does.

Two-sided solves (left eigenvectors for Newton/adjoint normalization,
reference: eigensolvers.py:319, eigenvectors.py:30-31) run Arnoldi on the
conjugate-transposed operator reusing the same factorization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..ops.cplx import Z, zzeros
from ..ops.csr import CSR, csr_device, csr_empty, spmv, spmv_H
from ..utils.logging import info
from ..ops.banded import BandedFactor, banded_solve, banded_solve_H
from .linsolve import (
    ShiftedFactor,
    SparseShiftedFactor,
    Woodbury,
    build_shifted_factor,
)

_BREAKDOWN = 1e-290


class SolveOp(NamedTuple):
    """Everything needed to solve (P - s L R^T) x = b on device:
    the (possibly reduced-precision) explicit inverse of P, the exact CSR
    operands of P = A + cb*B + cc*C for iterative refinement, and the
    Woodbury low-rank state."""

    minv: Z  # inverse of P, possibly f32 (mixed precision)
    A: CSR
    B: CSR  # empty CSR when absent
    C: CSR
    cb: Z  # 0-d coefficient of B
    cc: Z  # 0-d coefficient of C
    wb: Woodbury


class BandedSolveOp(NamedTuple):
    """Banded-tier analogue of SolveOp: block-banded LU factors + the exact
    CSR operands for no-pivot iterative refinement + Woodbury state.

    ``ozP`` (optional, accelerator tier): the exact shifted operator
    P = A + cb B + cc C packed as an Ozaki bit-sliced block-band
    (ops/ozaki.OzakiBand) in the factor's RCM geometry — the refinement
    matvecs then run as bf16 MXU SpMMs (~50-80x the gather-based CSR SpMV
    at block-Krylov widths, ~2.5e-10 relative) instead of gather-bound
    f64 CSR products.  None disables (CPU tier, small problems)."""

    fac: BandedFactor
    A: CSR
    B: CSR
    C: CSR
    cb: Z
    cc: Z
    wb: Woodbury
    ozP: object = None


class EpsOp(NamedTuple):
    sv: SolveOp
    C: CSR  # pencil mass (may be a sign-flipped copy)


class PepOp(NamedTuple):
    sv: SolveOp
    B: CSR
    C: CSR
    sig: Z  # 0-d shift


def _k_matvec(M: Z, x: Z) -> Z:
    """(n,k) x (k,) complex matvec on pairs."""
    return Z(M.re @ x.re - M.im @ x.im, M.re @ x.im + M.im @ x.re)


def _kT_matvec(M: Z, x: Z) -> Z:
    """M^T x (unconjugated) for (n,k) M and (n,) x -> (k,)."""
    return Z(M.re.T @ x.re - M.im.T @ x.im, M.re.T @ x.im + M.im.T @ x.re)


def _apply_P_ozaki(sv: "BandedSolveOp", x: Z) -> Z:
    """P x via the f64-accurate Ozaki MXU SpMM in the factor's banded RCM
    layout (pad + permute -> SpMM -> unpermute).  The band packs the
    UNequilibrated exact operator, so no dscale enters."""
    from ..ops.ozaki import ozaki_spmm

    f = sv.fac
    nb, W = f.nb, f.W
    nbkp = f.band_re.shape[0]
    npad = nbkp * nb
    n = sv.A.n
    squeeze = x.re.ndim == 1
    xr = x.re[:, None] if squeeze else x.re
    xi = x.im[:, None] if squeeze else x.im
    k = xr.shape[1]
    pr = jnp.zeros((npad, k)).at[:n].set(xr)[f.perm]
    pi = jnp.zeros((npad, k)).at[:n].set(xi)[f.perm]
    y = ozaki_spmm(sv.ozP, Z(pr, pi), W, nb, nbkp)
    yr = y.re[f.iperm][:n]
    yi = y.im[f.iperm][:n]
    if squeeze:
        return Z(yr[:, 0], yi[:, 0])
    return Z(yr, yi)


def _apply_P(sv: SolveOp, x: Z) -> Z:
    """P x = A x + cb B x + cc C x (exact, f64); the banded accelerator
    tier substitutes the Ozaki MXU SpMM of the pre-packed P when present."""
    if getattr(sv, "ozP", None) is not None:
        return _apply_P_ozaki(sv, x)
    ax = spmv(sv.A, x)
    bx = spmv(sv.B, x)
    cx = spmv(sv.C, x)
    re = ax.re + (sv.cb.re * bx.re - sv.cb.im * bx.im)         + (sv.cc.re * cx.re - sv.cc.im * cx.im)
    im = ax.im + (sv.cb.re * bx.im + sv.cb.im * bx.re)         + (sv.cc.re * cx.im + sv.cc.im * cx.re)
    return Z(re, im)


def _apply_P_H(sv: SolveOp, x: Z) -> Z:
    """P^H x (conjugated coefficients, conjugate-transposed CSRs)."""
    ax = spmv_H(sv.A, x)
    bx = spmv_H(sv.B, x)
    cx = spmv_H(sv.C, x)
    re = ax.re + (sv.cb.re * bx.re + sv.cb.im * bx.im)         + (sv.cc.re * cx.re + sv.cc.im * cx.im)
    im = ax.im + (sv.cb.re * bx.im - sv.cb.im * bx.re)         + (sv.cc.re * cx.im - sv.cc.im * cx.re)
    return Z(re, im)


def _minv_mv(minv: Z, b: Z) -> Z:
    d = minv.re.dtype
    br = b.re.astype(d)
    bi = b.im.astype(d)
    return Z((minv.re @ br - minv.im @ bi).astype(jnp.float64),
             (minv.re @ bi + minv.im @ br).astype(jnp.float64))


def _minv_mv_H(minv: Z, b: Z) -> Z:
    d = minv.re.dtype
    br = b.re.astype(d)
    bi = b.im.astype(d)
    return Z((minv.re.T @ br + minv.im.T @ bi).astype(jnp.float64),
             (minv.re.T @ bi - minv.im.T @ br).astype(jnp.float64))


def _solve_wb(sv: SolveOp, b: Z, nrefine: int) -> Z:
    """(P - s L R^T)^{-1} b: explicit-inverse matvec, `nrefine` steps of
    iterative refinement against the exact f64 operator (recovers f64
    accuracy from an f32 factor — the mixed-precision direct solve), then
    the Woodbury correction."""
    y = _minv_mv(sv.minv, b)
    for _ in range(nrefine):
        py = _apply_P(sv, y)
        r = Z(b.re - py.re, b.im - py.im)
        dy = _minv_mv(sv.minv, r)
        y = Z(y.re + dy.re, y.im + dy.im)
    wb = sv.wb
    t = _kT_matvec(wb.R, y)  # R^T y
    c = _k_matvec(wb.cap, t)
    corr = _k_matvec(wb.W, c)
    return Z(y.re + corr.re, y.im + corr.im)


def _solve_wbb(sv: BandedSolveOp, b: Z, nrefine: int) -> Z:
    """Banded-tier (P - s L R^T)^{-1} b inside jit: banded triangular solves
    + refinement + Woodbury."""
    n = sv.A.n
    y = banded_solve(sv.fac, b, n)
    for _ in range(nrefine):
        py = _apply_P(sv, y)
        r = Z(b.re - py.re, b.im - py.im)
        dy = banded_solve(sv.fac, r, n)
        y = Z(y.re + dy.re, y.im + dy.im)
    wb = sv.wb
    t = _kT_matvec(wb.R, y)
    c = _k_matvec(wb.cap, t)
    corr = _k_matvec(wb.W, c)
    return Z(y.re + corr.re, y.im + corr.im)


def _solve_wbb_T(sv: BandedSolveOp, b: Z, nrefine: int) -> Z:
    """Forward solve THROUGH a Hermitian-reused factor (the 'h' solve
    modes): sv.fac holds the LU of the DIRECT operator P while sv.A/B/C/ozP
    are the ADJOINT pencil's own terms (P_adj = P^H), so the raw solve is
    the H-substitution and refinement/Woodbury use the adjoint factor's
    forward state.  See linsolve.BandedAdjointFactor."""
    n = sv.A.n
    y = banded_solve_H(sv.fac, b, n)
    for _ in range(nrefine):
        py = _apply_P(sv, y)
        r = Z(b.re - py.re, b.im - py.im)
        dy = banded_solve_H(sv.fac, r, n)
        y = Z(y.re + dy.re, y.im + dy.im)
    wb = sv.wb
    t = _kT_matvec(wb.R, y)
    c = _k_matvec(wb.cap, t)
    corr = _k_matvec(wb.W, c)
    return Z(y.re + corr.re, y.im + corr.im)


def _solve_wbb_H(sv: BandedSolveOp, b: Z, nrefine: int) -> Z:
    n = sv.A.n
    y = banded_solve_H(sv.fac, b, n)
    for _ in range(nrefine):
        py = _apply_P_H(sv, y)
        r = Z(b.re - py.re, b.im - py.im)
        dy = banded_solve_H(sv.fac, r, n)
        y = Z(y.re + dy.re, y.im + dy.im)
    wb = sv.wb
    t = _kT_matvec(wb.Lc, y)
    c = _k_matvec(wb.caph, t)
    corr = _k_matvec(wb.Wh, c)
    return Z(y.re + corr.re, y.im + corr.im)


def _solve_wb_H(sv: SolveOp, b: Z, nrefine: int) -> Z:
    """(P - s L R^T)^{-H} b with the same refinement scheme."""
    y = _minv_mv_H(sv.minv, b)
    for _ in range(nrefine):
        py = _apply_P_H(sv, y)
        r = Z(b.re - py.re, b.im - py.im)
        dy = _minv_mv_H(sv.minv, r)
        y = Z(y.re + dy.re, y.im + dy.im)
    wb = sv.wb
    t = _kT_matvec(wb.Lc, y)  # conj(L)^T y
    c = _k_matvec(wb.caph, t)
    corr = _k_matvec(wb.Wh, c)
    return Z(y.re + corr.re, y.im + corr.im)


def _pick_solve(mode: str):
    """The W-solve matching a basis-build mode: '…b' = banded tier,
    '…bh' = banded tier through a Hermitian-reused factor, else dense."""
    if mode.endswith("bh"):
        return _solve_wbb_T
    if mode.endswith("b"):
        return _solve_wbb
    return _solve_wb


def _apply(op, v: Z, mode: str, nrefine: int) -> Z:
    if mode == "epsbh":
        mv = spmv(op.C, v)
        return _solve_wbb_T(op.sv, Z(-mv.re, -mv.im), nrefine)
    if mode == "pepbh":
        n = op.C.n
        v1 = Z(v.re[:n], v.im[:n])
        v2 = Z(v.re[n:], v.im[n:])
        sv1 = Z(op.sig.re * v1.re - op.sig.im * v1.im,
                op.sig.re * v1.im + op.sig.im * v1.re)
        cv = spmv(op.C, Z(v2.re + sv1.re, v2.im + sv1.im))
        bv = spmv(op.B, v1)
        rhs = Z(bv.re + cv.re, bv.im + cv.im)
        z1 = _solve_wbb_T(op.sv, rhs, nrefine)
        z1 = Z(-z1.re, -z1.im)
        sz1 = Z(op.sig.re * z1.re - op.sig.im * z1.im,
                op.sig.re * z1.im + op.sig.im * z1.re)
        z2 = Z(v1.re + sz1.re, v1.im + sz1.im)
        return Z(jnp.concatenate([z1.re, z2.re]), jnp.concatenate([z1.im, z2.im]))
    if mode == "eps":
        mv = spmv(op.C, v)
        return _solve_wb(op.sv, Z(-mv.re, -mv.im), nrefine)
    if mode == "epsH":
        y = _solve_wb_H(op.sv, v, nrefine)
        mv = spmv_H(op.C, y)
        return Z(-mv.re, -mv.im)
    if mode == "epsb":
        mv = spmv(op.C, v)
        return _solve_wbb(op.sv, Z(-mv.re, -mv.im), nrefine)
    if mode == "epsHb":
        y = _solve_wbb_H(op.sv, v, nrefine)
        mv = spmv_H(op.C, y)
        return Z(-mv.re, -mv.im)
    if mode == "pepb":
        n = op.C.n
        v1 = Z(v.re[:n], v.im[:n])
        v2 = Z(v.re[n:], v.im[n:])
        sv1 = Z(op.sig.re * v1.re - op.sig.im * v1.im,
                op.sig.re * v1.im + op.sig.im * v1.re)
        cv = spmv(op.C, Z(v2.re + sv1.re, v2.im + sv1.im))
        bv = spmv(op.B, v1)
        rhs = Z(bv.re + cv.re, bv.im + cv.im)
        z1 = _solve_wbb(op.sv, rhs, nrefine)
        z1 = Z(-z1.re, -z1.im)
        sz1 = Z(op.sig.re * z1.re - op.sig.im * z1.im,
                op.sig.re * z1.im + op.sig.im * z1.re)
        z2 = Z(v1.re + sz1.re, v1.im + sz1.im)
        return Z(jnp.concatenate([z1.re, z2.re]), jnp.concatenate([z1.im, z2.im]))
    if mode == "pep":
        n = op.C.n
        v1 = Z(v.re[:n], v.im[:n])
        v2 = Z(v.re[n:], v.im[n:])
        sv1 = Z(op.sig.re * v1.re - op.sig.im * v1.im,
                op.sig.re * v1.im + op.sig.im * v1.re)
        cv = spmv(op.C, Z(v2.re + sv1.re, v2.im + sv1.im))
        bv = spmv(op.B, v1)
        rhs = Z(bv.re + cv.re, bv.im + cv.im)
        z1 = _solve_wb(op.sv, rhs, nrefine)
        z1 = Z(-z1.re, -z1.im)
        sz1 = Z(op.sig.re * z1.re - op.sig.im * z1.im,
                op.sig.re * z1.im + op.sig.im * z1.re)
        z2 = Z(v1.re + sz1.re, v1.im + sz1.im)
        return Z(jnp.concatenate([z1.re, z2.re]), jnp.concatenate([z1.im, z2.im]))
    raise ValueError(mode)


def _arnoldi_expand(op, V: Z, H: Z, j0, j1, mode: str, nrefine: int = 0):
    """Expand the Arnoldi decomposition from step j0 to j1 (exclusive).

    V: (mmax+1, n) basis rows (rows > current step are zero);
    H: (mmax+1, mmax) Hessenberg.  Plain traceable function so callers
    (the fused fixed-point loop) can inline it inside larger jits.
    """

    def body(j, state):
        V, H = state
        v = Z(V.re[j], V.im[j])
        w = _apply(op, v, mode, nrefine)
        # CGS2: two classical Gram-Schmidt passes against all rows (zero rows
        # contribute nothing).
        h_tot_re = jnp.zeros(V.re.shape[0])
        h_tot_im = jnp.zeros(V.re.shape[0])
        for _ in range(2):
            hre = V.re @ w.re + V.im @ w.im  # conj(V) . w
            him = V.re @ w.im - V.im @ w.re
            wre = w.re - (V.re.T @ hre - V.im.T @ him)
            wim = w.im - (V.re.T @ him + V.im.T @ hre)
            w = Z(wre, wim)
            h_tot_re = h_tot_re + hre
            h_tot_im = h_tot_im + him
        beta = jnp.sqrt(jnp.sum(w.re**2 + w.im**2))
        inv = jnp.where(beta > _BREAKDOWN, 1.0 / beta, 0.0)
        V = Z(V.re.at[j + 1].set(w.re * inv), V.im.at[j + 1].set(w.im * inv))
        hcol_re = h_tot_re.at[j + 1].set(beta)
        hcol_im = h_tot_im.at[j + 1].set(0.0)
        H = Z(H.re.at[:, j].set(hcol_re), H.im.at[:, j].set(hcol_im))
        return V, H

    V, H = jax.lax.fori_loop(j0, j1, body, (V, H))
    return V, H


_arnoldi_chunk = partial(jax.jit, static_argnames=("mode", "nrefine"))(_arnoldi_expand)


def _polar_orth_rows(Wr, Wi):
    """One pass of symmetric (Loewdin) orthonormalization of the k rows:
    Q = G^{-1/2} W with G = W W^H, computed via eigh of the real embedding
    [[Gre, -Gim], [Gim, Gre]] (a function of the embedding of a Hermitian
    matrix is the embedding of the function).  Rank-deficient directions
    (eigenvalue <= tol * max) are ZEROED, not inflated — the analogue of the
    zero-row breakdown convention of `_arnoldi_expand`."""
    k = Wr.shape[0]
    Gre = Wr @ Wr.T + Wi @ Wi.T
    Gim = Wr @ Wi.T - Wi @ Wr.T
    M = jnp.block([[Gre, -Gim], [Gim, Gre]])
    lam, U = jnp.linalg.eigh(M)
    # rank tolerance ~ (1e-14)^2 relative: directions whose singular value is
    # below f64 roundoff of the block are noise, zero them
    inv_sqrt = jnp.where(lam > 1e-28 * jnp.maximum(lam[-1], 1e-300),
                         1.0 / jnp.sqrt(jnp.maximum(lam, 1e-300)), 0.0)
    Mh = (U * inv_sqrt) @ U.T  # embedding of Hermitian G^{-1/2}
    Cre = Mh[:k, :k]
    Cim = Mh[k:, :k]
    return Cre @ Wr - Cim @ Wi, Cre @ Wi + Cim @ Wr


def _block_orth(V: Z, Wr, Wi, k: int):
    """Orthonormalize the k candidate rows (Wr, Wi) against every row of V
    (CGS2 — MXU matmuls) and then against each other (two passes of
    symmetric orthonormalization — matmuls + one tiny 2k x 2k eigh, instead
    of an unrolled MGS whose O(k^2) HLO made large-case compiles exceed the
    remote-TPU tunnel's limits).  Rows spanning a deficient direction come
    out zero (they contribute nothing to later Gram-Schmidt passes, matching
    the zero-row convention of `_arnoldi_expand`)."""
    for _ in range(2):
        hre = V.re @ Wr.T + V.im @ Wi.T  # (rows, k): conj(V) . w_j
        him = V.re @ Wi.T - V.im @ Wr.T
        Wr = Wr - (hre.T @ V.re - him.T @ V.im)
        Wi = Wi - (hre.T @ V.im + him.T @ V.re)
    for _ in range(2):
        Wr, Wi = _polar_orth_rows(Wr, Wi)
    return Wr, Wi


def _block_arnoldi_expand(op, V: Z, b0: int, b1: int, k: int, mode: str,
                          nrefine: int = 0):
    """Block-Krylov expansion: block b (rows [b*k, (b+1)*k)) is applied
    through the shift-inverted operator as ONE multi-RHS solve, then
    orthonormalized into block b+1.  No Hessenberg is kept — this feeds the
    resolvent-projection path (projection.py), which Galerkin-projects the
    exact operators onto the basis.  Replaces the host-driven
    `_host_block_arnoldi` (one device dispatch per COLUMN per step) with a
    single dispatch for the whole expansion."""

    def body(b, V):
        cur = Z(jax.lax.dynamic_slice_in_dim(V.re, b * k, k, 0),
                jax.lax.dynamic_slice_in_dim(V.im, b * k, k, 0))
        w = _apply(op, Z(cur.re.T, cur.im.T), mode, nrefine)  # (n_op, k)
        Wr, Wi = _block_orth(V, w.re.T, w.im.T, k)
        return Z(jax.lax.dynamic_update_slice_in_dim(V.re, Wr, (b + 1) * k, 0),
                 jax.lax.dynamic_update_slice_in_dim(V.im, Wi, (b + 1) * k, 0))

    return jax.lax.fori_loop(b0, b1, body, V)


@dataclass
class EigenResult:
    """Converged eigenpairs, sorted ascending |lambda - sigma| (the SLEPc
    TARGET_MAGNITUDE ordering, reference: eigensolvers.py:54)."""

    kind: str  # 'eps' (lambda = omega^2) or 'pep' (lambda = omega)
    sigma: complex
    eigenvalues: np.ndarray
    vectors: np.ndarray  # (n, nconv) complex
    left_vectors: Optional[np.ndarray] = None
    iterations: int = 0
    residuals: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def getEigenvalue(self, i: int) -> complex:
        return complex(self.eigenvalues[i])

    def getEigenvector(self, i: int) -> np.ndarray:
        return self.vectors[:, i]

    def getLeftEigenvector(self, i: int) -> np.ndarray:
        return self.left_vectors[:, i]

    @property
    def nconv(self) -> int:
        return len(self.eigenvalues)


def _host_expand(apply_fn, Vnp, Hnp, j0, j1):
    """Numpy CGS2 Arnoldi expansion for the host (sparse-LU) backend —
    identical math to the jitted device chunk."""
    for j in range(j0, j1):
        w = apply_fn(Vnp[j])
        h_tot = np.zeros(Vnp.shape[0], dtype=np.complex128)
        for _ in range(2):
            h = np.conj(Vnp) @ w
            w = w - Vnp.T @ h
            h_tot += h
        beta = np.linalg.norm(w)
        Vnp[j + 1] = w / beta if beta > _BREAKDOWN else 0.0
        h_tot[j + 1] = beta
        Hnp[:, j] = h_tot
    return Vnp, Hnp


def _run_arnoldi(op, mode: str, n: int, nev: int, tol: float, mmax: int,
                 chunk: int = 96, seed: int = 7, host_apply=None,
                 nrefine: int = 0):
    """Drive Arnoldi expansion chunks until the nev wanted Ritz pairs
    converge.  Device path: jitted `_arnoldi_chunk` on `op`; host path
    (``host_apply`` given): numpy expansion for the sparse-LU tier.

    Returns (nus, ys, rel, Vnp, j): shift-inverted Ritz values/vectors sorted
    by descending |nu|, residuals, the basis, and the subspace dimension.
    """
    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v0 /= np.linalg.norm(v0)
    if host_apply is not None:
        Vh = np.zeros((mmax + 1, n), dtype=np.complex128)
        Vh[0] = v0
        Hh = np.zeros((mmax + 1, mmax), dtype=np.complex128)
    else:
        V = zzeros((mmax + 1, n))
        V = Z(V.re.at[0].set(jnp.asarray(v0.real)), V.im.at[0].set(jnp.asarray(v0.imag)))
        H = zzeros((mmax + 1, mmax))

    j = 0
    while j < mmax:
        j1 = min(j + chunk, mmax)
        if host_apply is not None:
            Vh, Hh = _host_expand(host_apply, Vh, Hh, j, j1)
            Hnp = Hh[: j1 + 1, :j1]
        else:
            V, H = _arnoldi_chunk(op, V, H, j, j1, mode, nrefine)
            Hnp = np.asarray(H.re)[: j1 + 1, :j1] + 1j * np.asarray(H.im)[: j1 + 1, :j1]
        j = j1
        # happy breakdown -> exact invariant subspace
        sub = np.abs(np.diag(Hnp[1:, :]))
        brk = np.nonzero(sub < 1e-13 * max(1.0, np.abs(Hnp).max()))[0]
        jeff = int(brk[0]) + 1 if len(brk) else j
        nus, ys = np.linalg.eig(Hnp[:jeff, :jeff])
        beta_last = sub[jeff - 1] if jeff == j and jeff >= 1 else 0.0
        resid = beta_last * np.abs(ys[-1, :])
        order = np.argsort(-np.abs(nus))
        wanted = order[: min(nev, len(order))]
        rel = resid[wanted] / np.maximum(np.abs(nus[wanted]), 1e-300)
        if np.all(rel < tol) or jeff < j:
            Vnp = (Vh[:jeff] if host_apply is not None
                   else np.asarray(V.re)[:jeff] + 1j * np.asarray(V.im)[:jeff])
            return nus[order], ys[:, order], rel, Vnp, jeff
    info(f"! Arnoldi hit mmax={mmax} with residuals {rel}; returning best available.")
    Vnp = (Vh[:j] if host_apply is not None
           else np.asarray(V.re)[:j] + 1j * np.asarray(V.im)[:j])
    return nus[order], ys[:, order], rel, Vnp, j


def _default_mmax(n: int, nev: int) -> int:
    return int(min(n, max(70, 10 * nev)))


def eps_solver(A: CSR, C: CSR, target: complex, nev: int = 2,
               two_sided: bool = False, lowrank=None, print_results: bool = False,
               tol: float = 1e-12, mmax: Optional[int] = None,
               factor: Optional[ShiftedFactor] = None) -> EigenResult:
    """Solve  A' x = lambda (-C) x  near lambda = target^2, where
    A' = A - lowrank (reference: eigensolvers.py:41-67; the -C sign and the
    target**2 spectral target match the reference exactly).

    `factor` lets callers (the fixed-point loop) reuse a factorization of
    P = A + sigma C across outer iterations.
    """
    sigma = complex(target) ** 2
    n = C.n
    if factor is None:
        factor = build_shifted_factor([(1.0, A), (sigma, C)], n)
        if lowrank is not None:
            factor.set_lowrank_factors(lowrank.L, lowrank.R, two_sided)
            factor.set_scale(lowrank.scale)
        else:
            factor.set_scale(0)
    backend = getattr(factor, "backend", "dense")
    host = backend == "host"
    mmax = mmax or _default_mmax(n, nev)
    info("- EPS solver started.")
    if host:
        Csp = C.to_scipy()
        apply_fn = lambda v: factor.solve_wb(-(Csp @ v))  # noqa: E731
        op = None
        nus, ys, rel, Vnp, j = _run_arnoldi(None, "eps", n, nev, tol, mmax,
                                            host_apply=apply_fn)
    elif backend == "banded":
        op = EpsOp(sv=factor.solve_op(), C=csr_device(C))
        mode_b = "epsb" + ("h" if getattr(factor, "herm_factor", False) else "")
        nus, ys, rel, Vnp, j = _run_arnoldi(op, mode_b, n, nev, tol, mmax,
                                            nrefine=factor.refine)
    else:
        op = EpsOp(sv=factor.solve_op(), C=csr_device(C))
        nus, ys, rel, Vnp, j = _run_arnoldi(op, "eps", n, nev, tol, mmax,
                                            nrefine=factor.nrefine)
    lams = sigma + 1.0 / nus
    nkeep = min(max(nev, 2), len(lams))
    vecs = (Vnp.T @ ys[:, :nkeep])
    vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
    res = EigenResult(kind="eps", sigma=sigma, eigenvalues=lams[:nkeep],
                      vectors=vecs, iterations=j, residuals=rel)
    if two_sided:
        if host:
            CHsp = Csp.conj().T.tocsr()
            applyH = lambda v: -(CHsp @ factor.solve_wb_H(v))  # noqa: E731
            nusL, ysL, relL, VnpL, jL = _run_arnoldi(None, "epsH", n, nev, tol,
                                                     mmax, seed=11,
                                                     host_apply=applyH)
        elif backend == "banded":
            nusL, ysL, relL, VnpL, jL = _run_arnoldi(op, "epsHb", n, nev, tol,
                                                     mmax, seed=11,
                                                     nrefine=factor.refine)
        else:
            nusL, ysL, relL, VnpL, jL = _run_arnoldi(op, "epsH", n, nev, tol,
                                                     mmax, seed=11,
                                                     nrefine=factor.nrefine)
        # left Ritz values approximate conj(nu); match to the right ones
        left = np.zeros((n, nkeep), dtype=np.complex128)
        for i in range(nkeep):
            m = np.argmin(np.abs(nusL - np.conj(nus[i])))
            u = VnpL.T @ ysL[:, m]
            if host:
                yv = factor.solve_wb_H(u)
            elif backend == "banded":
                y = _solve_wbb_H(op.sv, Z(jnp.asarray(u.real), jnp.asarray(u.imag)),
                                 factor.refine)
                yv = np.asarray(y.re) + 1j * np.asarray(y.im)
            else:
                y = _solve_wb_H(op.sv, Z(jnp.asarray(u.real), jnp.asarray(u.imag)),
                                factor.nrefine)
                yv = np.asarray(y.re) + 1j * np.asarray(y.im)
            left[:, i] = yv / np.linalg.norm(yv)
        res.left_vectors = left
    info("- EPS solver converged. Eigenvalue computed.")
    from ..utils.metrics import record

    record("arnoldi", kind="eps", backend=backend, n=n, steps=j,
           nconv=res.nconv, two_sided=two_sided)
    if print_results:
        _print_results(res)
    return res


def pep_solver(A: CSR, B: CSR, C: CSR, target: complex, nev: int = 2,
               lowrank=None, print_results: bool = False, tol: float = 1e-12,
               mmax: Optional[int] = None,
               factor: Optional[ShiftedFactor] = None) -> EigenResult:
    """Solve the quadratic pencil (A' + lambda B + lambda^2 C) x = 0 near
    lambda = target via companion linearization + shift-invert Arnoldi
    (reference: eigensolvers.py:69-120).  A' = A - lowrank."""
    sigma = complex(target)
    n = C.n
    if factor is None:
        factor = build_shifted_factor([(1.0, A), (sigma, B), (sigma**2, C)], n)
        if lowrank is not None:
            factor.set_lowrank_factors(lowrank.L, lowrank.R, False)
            factor.set_scale(lowrank.scale)
        else:
            factor.set_scale(0)
    mmax = mmax or _default_mmax(2 * n, nev)
    info("- PEP solver started.")
    backend = getattr(factor, "backend", "dense")
    if backend == "host":
        Bsp = B.to_scipy()
        Csp = C.to_scipy()

        def apply_fn(v):
            v1, v2 = v[:n], v[n:]
            rhs = Bsp @ v1 + Csp @ (v2 + sigma * v1)
            z1 = -factor.solve_wb(rhs)
            return np.concatenate([z1, v1 + sigma * z1])

        nus, ys, rel, Vnp, j = _run_arnoldi(None, "pep", 2 * n, nev, tol, mmax,
                                            host_apply=apply_fn)
    elif backend == "banded":
        op = PepOp(sv=factor.solve_op(), B=csr_device(B), C=csr_device(C),
                   sig=Z(jnp.asarray(sigma.real), jnp.asarray(sigma.imag)))
        mode_b = "pepb" + ("h" if getattr(factor, "herm_factor", False) else "")
        nus, ys, rel, Vnp, j = _run_arnoldi(op, mode_b, 2 * n, nev, tol, mmax,
                                            nrefine=factor.refine)
    else:
        op = PepOp(sv=factor.solve_op(), B=csr_device(B), C=csr_device(C),
                   sig=Z(jnp.asarray(sigma.real), jnp.asarray(sigma.imag)))
        nus, ys, rel, Vnp, j = _run_arnoldi(op, "pep", 2 * n, nev, tol, mmax,
                                            nrefine=factor.nrefine)
    lams = sigma + 1.0 / nus
    nkeep = min(max(nev, 2), len(lams))
    vecs2 = (Vnp.T @ ys[:, :nkeep])
    vecs = vecs2[:n, :]
    vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
    info("- PEP solver converged. Eigenvalue computed.")
    res = EigenResult(kind="pep", sigma=sigma, eigenvalues=lams[:nkeep],
                      vectors=vecs, iterations=j, residuals=rel)
    from ..utils.metrics import record

    record("arnoldi", kind="pep", backend=backend, n=n, steps=j,
           nconv=res.nconv, two_sided=False)
    if print_results:
        _print_results(res)
    return res


def _print_results(res: EigenResult):
    info("")
    info("******************************")
    info("***  Solution Results      ***")
    info("******************************")
    info(f"Number of iterations of the method: {res.iterations}")
    info(f"Solution method: shift-invert Arnoldi ({res.kind})")
    info(f"Number of converged eigenpairs {res.nconv}")
    for lam in res.eigenvalues:
        info(f"{lam.real:15f}, {lam.imag:15f}")
    info("")
