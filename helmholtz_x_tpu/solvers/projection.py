"""Resolvent-Krylov projection: the whole nonlinear eigensolve on ONE basis.

The flame operator is rank-k, so the exact eigenvector of

    (A + omega B + omega^2 C - s(omega) L R^T) x = 0

is a resolvent applied to the flame columns:  x = Q(omega)^{-1} L alpha with
Q(omega) = A + omega B + omega^2 C.  A shift-invert Krylov space built ONCE at
the factorization shift sigma, STARTED from W = Q(sigma)^{-1} L, approximates
those resolvents for every omega near sigma (it spans exactly the rational
functions (I + (mu - sigma) P^{-1}C)^{-1} W that the eigenvalue updates need).

So instead of re-running a full Arnoldi eigensolve per outer fixed-point
iteration (reference: helmholtz_x/eigensolvers.py:122-259 re-factors AND
re-solves inside SLEPc every iteration; round-1 fpi_fused re-expanded a
48-step Krylov basis per iteration), we:

  1. factor P(sigma) once (linsolve tiers),
  2. build ONE m-step Krylov basis V from start vector(s) W  (m solves total,
     device-resident for the dense/banded tiers: a single XLA dispatch),
  3. Galerkin-project A, B, C, L, R onto V in exact f64 (m SpMVs + small
     matmuls, one jitted call),
  4. run the reference's Aitken-relaxed fixed-point loop on the PROJECTED
     m x m dense nonlinear eigenproblem — microseconds per iteration,
  5. recover eigenvectors x = V^T y, and verify the winner against the
     EXACT unprojected operator; a failed residual gate falls back to the
     round-1 exact paths (fpi.py keeps them).

Because the projected matrices are computed in f64 from the exact CSR
operators, the eigenvalue accuracy is set by the SUBSPACE quality, not the
inner-solve precision — the basis build tolerates reduced-precision solves.

Reference parity: the printed iteration history and the Aitken update
alpha_k = 1/(1 - (f_k - f_{k-1})/(omega_k - omega_{k-1})) follow
helmholtz_x/eigensolvers.py:122-276 exactly; eigenvalues are ordered by
|lambda - target^(2|1)| like SLEPc's TARGET_MAGNITUDE (eigensolvers.py:54).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from functools import partial

from ..ops.cplx import Z
from ..ops.csr import csr_device
from ..utils.logging import info
from .arnoldi import (EigenResult, EpsOp, PepOp, _apply, _arnoldi_chunk,
                      _arnoldi_expand, _block_arnoldi_expand, _block_orth,
                      _pick_solve, _polar_orth_rows, _solve_wb, _solve_wbb)


def _enabled() -> bool:
    return os.environ.get("HELMHOLTZ_X_TPU_PROJ", "1") not in ("0", "false", "no")


def _solve_np(factor, b: np.ndarray, hermitian: bool = False) -> np.ndarray:
    """Tier-agnostic P^{-1} b (or P^{-H} b) returning numpy complex."""
    from .linsolve import ShiftedFactor

    fn = factor.solve_P_H if hermitian else factor.solve_P
    if isinstance(factor, ShiftedFactor):
        from ..ops.cplx import zarray

        z = fn(zarray(np.asarray(b, dtype=np.complex128)))
        return z.to_numpy()
    return np.asarray(fn(np.asarray(b, dtype=np.complex128)))


@dataclass
class ProjectedPencil:
    """Galerkin projections onto the orthonormal rows of V (m, n)."""

    V: np.ndarray  # (m, n) complex, orthonormal rows
    Ah: np.ndarray  # (m, m)
    Bh: Optional[np.ndarray]
    Ch: np.ndarray
    Lh: np.ndarray  # (m, k)  V^H L
    Rh: np.ndarray  # (m, k)  V^T R   (R enters unconjugated: D = L R^T)


# ---------------------------------------------------------------------------
# basis construction


def _orth_rows(X: np.ndarray, tol: float = 1e-12) -> np.ndarray:
    """Orthonormal rows spanning the row space of X (SVD-based, rank-revealing)."""
    u, s, vh = np.linalg.svd(X, full_matrices=False)
    r = int(np.sum(s > tol * (s[0] if len(s) else 1.0)))
    return vh[:r]


@partial(__import__("jax").jit, static_argnames=("n", "include_w"))
def _fold_impl(V: Z, Wz: Z, n: int, include_w: bool):
    """Stack the companion-basis halves (and optionally W^T) WITHOUT leaving
    the device."""
    import jax.numpy as jnp

    parts_r = [V.re[:, :n], V.re[:, n:]]
    parts_i = [V.im[:, :n], V.im[:, n:]]
    if include_w:
        parts_r.append(Wz.re.T)
        parts_i.append(Wz.im.T)
    return jnp.concatenate(parts_r, axis=0), jnp.concatenate(parts_i, axis=0)


@partial(__import__("jax").jit)
def _gram_impl(Hr, Hi):
    """Hermitian Gram G = H H^H of the rows (device matmuls)."""
    return Hr @ Hr.T + Hi @ Hi.T, Hi @ Hr.T - Hr @ Hi.T


@partial(__import__("jax").jit)
def _recombine_impl(Hr, Hi, Tr, Ti):
    """B = T^H H (the orthonormal-row recombination, device matmuls)."""
    Br = Tr.T @ Hr + Ti.T @ Hi
    Bi = Tr.T @ Hi - Ti.T @ Hr
    return Br, Bi


@partial(__import__("jax").jit)
def _project_out_impl(Hr, Hi, Br, Bi):
    """H := H - <H, B> B for orthonormal rows B (two CGS passes)."""
    for _ in range(2):
        Pre = Hr @ Br.T + Hi @ Bi.T  # <h_j, b_i>
        Pim = Hi @ Br.T - Hr @ Bi.T
        Hr = Hr - (Pre @ Br - Pim @ Bi)
        Hi = Hi - (Pre @ Bi + Pim @ Br)
    return Hr, Hi


def _fold_orth_device(V: Z, W: np.ndarray, n: int, include_w: bool,
                      tol: float = 1e-12, stage_cut: float = 1e-8,
                      max_stages: int = 4) -> np.ndarray:
    """Orthonormal rows spanning [V[:, :n]; V[:, n:]; W^T] for a DEVICE
    companion basis V (rows, 2n), computed WITHOUT reading the (rows, 2n)
    stack back (~150 MB for the 3D cases) or running an O(rows^2 n) host
    SVD.  STAGED rank-revealing Gram orthogonalization:

      per stage: Gram of the current residual rows on device, eigh of the
      tiny (rows x rows) Gram on host, keep eigenpairs above `stage_cut`
      RELATIVE TO THIS STAGE's top (so the 1/sqrt(lam) recombination error
      stays ~eps/stage_cut ~ 2e-8), recombine on device, project the kept
      rows out, recurse on the residual.

    A single-stage Gram cannot resolve directions below sv ~ sqrt(eps) of
    the global scale (the recombination amplifies Gram noise by 1/lam);
    staging resets the scale each round, reaching the SVD-grade global
    cutoff `tol` (sv ratio) in ceil(log(tol)/log(stage_cut^0.5)) stages.
    Only Grams (tiny) and the final (r, n) rows cross the device link."""
    import jax.numpy as jnp

    Wz = Z(jnp.asarray(np.ascontiguousarray(W.real)),
           jnp.asarray(np.ascontiguousarray(W.imag)))
    Hr, Hi = _fold_impl(V, Wz, n, include_w)
    out = []
    top0 = None
    Br = Bi = None
    for _ in range(max_stages):
        if Br is not None:
            Hr, Hi = _project_out_impl(Hr, Hi, Br, Bi)
        Gre, Gim = _gram_impl(Hr, Hi)
        G = np.asarray(Gre) + 1j * np.asarray(Gim)
        lam, U = np.linalg.eigh((G + G.conj().T) / 2)
        top = float(lam[-1]) if len(lam) else 0.0
        if top0 is None:
            top0 = max(top, 1e-300)
        # global floor: stop once the residual is below the sv `tol` ratio
        if top <= tol * tol * top0:
            break
        keep = lam > stage_cut * top
        if not np.any(keep):
            break
        T = U[:, keep] / np.sqrt(lam[keep])
        Br, Bi = _recombine_impl(
            Hr, Hi, jnp.asarray(np.ascontiguousarray(T.real)),
            jnp.asarray(np.ascontiguousarray(T.imag)))
        out.append((Br, Bi))
    if not out:
        return np.zeros((0, n), dtype=np.complex128)
    # FINAL Loewdin polish, TWO passes: the staged recombinations leave the
    # concatenated rows orthonormal only to ~eps/stage_cut (~2e-8) — and
    # near-dependent directions ACROSS stages can push cond(Gram) to ~1e8,
    # so a single G^{-1/2} recombination still carries ~eps*cond ~ 1e-8
    # error (which biased the Galerkin pencil enough to floor |domega| at
    # |omega|*2e-8 and, worse, to leave 1e-2-class eigenvector residuals).
    # Loewdin iteration converges QUADRATICALLY in the orthonormality
    # error: pass 1 clamps the near-dependent directions and reaches
    # ~1e-8; pass 2 starts from a ~perfectly conditioned Gram and lands at
    # ~1e-15.  Four tiny device matmuls + two (r, r) host eighs total.
    import jax.numpy as jnp

    Br = jnp.concatenate([br for br, _ in out], axis=0)
    Bi = jnp.concatenate([bi for _, bi in out], axis=0)
    for cut in (1e-8, 1e-14):
        Gre, Gim = _gram_impl(Br, Bi)
        G = np.asarray(Gre) + 1j * np.asarray(Gim)
        lam, U = np.linalg.eigh((G + G.conj().T) / 2)
        keep = lam > cut * max(float(lam[-1]), 1e-300)
        T = U[:, keep] / np.sqrt(lam[keep])
        Br, Bi = _recombine_impl(Br, Bi,
                                 jnp.asarray(np.ascontiguousarray(T.real)),
                                 jnp.asarray(np.ascontiguousarray(T.imag)))
    return np.asarray(Br) + 1j * np.asarray(Bi)


def _host_block_arnoldi(apply_fn, start: np.ndarray, depth: int,
                        block_apply=None) -> np.ndarray:
    """Block Arnoldi driven from host: start (n, k) columns, `depth` block
    steps of v <- apply_fn(v) with CGS2 against everything built so far.
    Returns (m, n) orthonormal rows.  Used for rank k > 1 and the host tier.
    `block_apply` (rows -> rows, same shape) applies the operator to a whole
    block at once — the distributed path uses it so each block step is one
    multi-RHS dispatch instead of a per-column loop."""
    n, k = start.shape
    V = _orth_rows(start.T.copy())
    blocks = [V]
    cur = V
    for _ in range(depth):
        if block_apply is not None:
            nxt = np.asarray(block_apply(cur))
        else:
            nxt = np.stack([apply_fn(cur[j]) for j in range(cur.shape[0])])
        Vall = np.concatenate(blocks, axis=0)
        for _ in range(2):
            nxt = nxt - (nxt @ np.conj(Vall.T)) @ Vall
        nxt = _orth_rows(nxt)
        if nxt.shape[0] == 0:
            break
        blocks.append(nxt)
        Vall2 = np.concatenate(blocks, axis=0)
        cur = nxt
        if Vall2.shape[0] >= n:
            break
    return np.concatenate(blocks, axis=0)


@partial(__import__("jax").jit,
         static_argnames=("mode", "nrefine", "m", "n_op"))
def _basis_seed_impl(op, Lz: Z, sig: Z, mode: str, nrefine: int, m: int,
                     n_op: int):
    """W = P^{-1} L and the normalized Arnoldi start vector — dispatch 1 of
    the split rank-1 basis build (see _BASIS_SPLIT_N)."""
    import jax.numpy as jnp

    solve = _pick_solve(mode)
    W = solve(op.sv, Lz, nrefine)
    if mode.startswith("eps"):
        v0 = W
    else:
        v0 = Z(jnp.concatenate([W.re, sig.re * W.re - sig.im * W.im]),
               jnp.concatenate([W.im, sig.re * W.im + sig.im * W.re]))
    nrm = jnp.sqrt(jnp.sum(v0.re**2 + v0.im**2))
    v0 = Z(v0.re / nrm, v0.im / nrm)
    V = Z(jnp.zeros((m + 1, n_op)).at[0].set(v0.re),
          jnp.zeros((m + 1, n_op)).at[0].set(v0.im))
    H = Z(jnp.zeros((m + 1, m)), jnp.zeros((m + 1, m)))
    return V, H, W


@partial(__import__("jax").jit,
         static_argnames=("mode", "nrefine", "m", "n_op"))
def _basis_impl(op, Lz: Z, sig: Z, mode: str, nrefine: int, m: int,
                n_op: int):
    """W = P^{-1} L and the m-step Krylov expansion started from W (or
    [W; sigma W] for the companion pencil), fused into ONE dispatch."""
    import jax.numpy as jnp

    solve = _pick_solve(mode)
    W = solve(op.sv, Lz, nrefine)
    if mode.startswith("eps"):
        v0 = W
    else:
        v0 = Z(jnp.concatenate([W.re, sig.re * W.re - sig.im * W.im]),
               jnp.concatenate([W.im, sig.re * W.im + sig.im * W.re]))
    nrm = jnp.sqrt(jnp.sum(v0.re**2 + v0.im**2))
    v0 = Z(v0.re / nrm, v0.im / nrm)
    V = Z(jnp.zeros((m + 1, n_op)).at[0].set(v0.re),
          jnp.zeros((m + 1, n_op)).at[0].set(v0.im))
    H = Z(jnp.zeros((m + 1, m)), jnp.zeros((m + 1, m)))
    V, H = _arnoldi_expand(op, V, H, 0, m, mode, nrefine)
    return V, W


# Above this many operator dofs, split the basis build into several smaller
# dispatches (one W-solve + one jitted program per block step / step chunk)
# instead of one fused program: the remote-TPU tunnel kills compile requests
# at ~280 s, and the fused whole-basis program for 3D cases exceeds that.
# The per-step programs are identical across steps (step index is traced),
# so each compiles once and is served from the persistent cache afterwards.
def _split_basis(n_op: int) -> bool:
    import jax

    limit = int(os.environ.get("HELMHOLTZ_X_TPU_BASIS_SPLIT_N", "20000"))
    if n_op < limit:
        return False
    mode = os.environ.get("HELMHOLTZ_X_TPU_BASIS_SPLIT", "auto")
    if mode in ("0", "never"):
        return False
    if mode in ("1", "always"):
        return True
    return jax.default_backend() != "cpu"


@partial(__import__("jax").jit,
         static_argnames=("mode", "nrefine", "nrows", "n_op", "k"))
def _block_seed_impl(op, Lz: Z, sig: Z, mode: str, nrefine: int, nrows: int,
                     n_op: int, k: int):
    """W = P^{-1} L and the orthonormalized seed block — dispatch 1 of the
    split basis build."""
    import jax.numpy as jnp

    solve = _pick_solve(mode)
    W = solve(op.sv, Lz, nrefine)  # (n, k)
    if mode.startswith("eps"):
        v0r, v0i = W.re, W.im
    else:
        v0r = jnp.concatenate([W.re, sig.re * W.re - sig.im * W.im])
        v0i = jnp.concatenate([W.im, sig.re * W.im + sig.im * W.re])
    V = Z(jnp.zeros((nrows, n_op)), jnp.zeros((nrows, n_op)))
    Wr0, Wi0 = _block_orth(V, v0r.T, v0i.T, k)
    return Z(V.re.at[:k].set(Wr0), V.im.at[:k].set(Wi0)), W


@partial(__import__("jax").jit, static_argnames=("mode", "nrefine", "k"))
def _block_step_impl(op, V: Z, b, mode: str, nrefine: int, k: int):
    """One block-Krylov step (multi-RHS solve + orthonormalization); the
    step index `b` is traced so every step reuses one compiled program.
    Also returns the new block's PRE-orthonormalization CGS2 residual mass:
    the host compares it against the FIRST block's mass to stop at Krylov
    saturation.  (The post-orth mass is useless for this — the polar
    orthonormalization unit-normalizes whatever survives, including
    solver-noise directions at the ~1e-10 level of the Ozaki-refined
    matvecs, which would otherwise flood the basis with junk rows.)"""
    import jax
    from ..ops.cplx import Z as _Z

    cur = _Z(jax.lax.dynamic_slice_in_dim(V.re, b * k, k, 0),
             jax.lax.dynamic_slice_in_dim(V.im, b * k, k, 0))
    w = _apply(op, _Z(cur.re.T, cur.im.T), mode, nrefine)  # (n_op, k)
    Wr, Wi = w.re.T, w.im.T
    for _ in range(2):  # CGS2 against every stored row
        hre = V.re @ Wr.T + V.im @ Wi.T
        him = V.re @ Wi.T - V.im @ Wr.T
        Wr = Wr - (hre.T @ V.re - him.T @ V.im)
        Wi = Wi - (hre.T @ V.im + him.T @ V.re)
    resid_mass = (Wr**2 + Wi**2).sum()
    for _ in range(2):
        Wr, Wi = _polar_orth_rows(Wr, Wi)
    V = Z(jax.lax.dynamic_update_slice_in_dim(V.re, Wr, (b + 1) * k, 0),
          jax.lax.dynamic_update_slice_in_dim(V.im, Wi, (b + 1) * k, 0))
    surv = (Wr**2 + Wi**2).sum()  # number of surviving unit directions
    return V, (resid_mass, surv)


@partial(__import__("jax").jit,
         static_argnames=("mode", "nrefine", "depth", "n_op", "k"))
def _block_basis_impl(op, Lz: Z, sig: Z, mode: str, nrefine: int, depth: int,
                      n_op: int, k: int):
    """W = P^{-1} L (one multi-RHS solve for all k flame columns) and a
    `depth`-step block-Krylov expansion started from W (or [W; sigma W] for
    the companion pencil) — the whole basis in ONE dispatch.  Replaces the
    host-driven per-column loop for rank-k flames (k = #burners, e.g. 16 on
    the MICCA annulus; reference runs a full SLEPc solve per outer FPI
    iteration instead, eigensolvers.py:158-178)."""
    import jax.numpy as jnp

    solve = _pick_solve(mode)
    W = solve(op.sv, Lz, nrefine)  # (n, k)
    if mode.startswith("eps"):
        v0r, v0i = W.re, W.im
    else:
        v0r = jnp.concatenate([W.re, sig.re * W.re - sig.im * W.im])
        v0i = jnp.concatenate([W.im, sig.re * W.im + sig.im * W.re])
    nrows = (depth + 1) * k
    V = Z(jnp.zeros((nrows, n_op)), jnp.zeros((nrows, n_op)))
    Wr0, Wi0 = _block_orth(V, v0r.T, v0i.T, k)
    V = Z(V.re.at[:k].set(Wr0), V.im.at[:k].set(Wi0))
    V = _block_arnoldi_expand(op, V, 0, depth, k, mode, nrefine)
    return V, W


def _device_block_basis(factor, pencil, sigma: complex, mode: str,
                        L: np.ndarray, m: int, nrefine: int):
    """Single-dispatch rank-k basis build on the dense/banded tiers.
    Returns (orthonormal rows (m', n_op), W (n, k) numpy)."""
    import jax.numpy as jnp

    sv = factor.solve_op()
    sig = Z(jnp.asarray(complex(sigma).real), jnp.asarray(complex(sigma).imag))
    if mode.startswith("eps"):
        op = EpsOp(sv=sv, C=csr_device(pencil[0]))
        n_op = pencil[0].n
    else:
        B, C = pencil
        op = PepOp(sv=sv, B=csr_device(B), C=csr_device(C), sig=sig)
        n_op = 2 * C.n
    k = L.shape[1]
    depth = max(2, -(-m // k))
    Lz = Z(jnp.asarray(np.ascontiguousarray(L.real)),
           jnp.asarray(np.ascontiguousarray(L.imag)))
    from ..utils.metrics import record as _record
    import time as _time

    if _split_basis(n_op):
        _t0 = _time.perf_counter()
        V, W = _block_seed_impl(op, Lz, sig, mode, nrefine,
                                (depth + 1) * k, n_op, k)
        import jax as _jax

        _jax.block_until_ready(V.re)
        _record("basis_seed", wall_s=round(_time.perf_counter() - _t0, 3))

        # PIPELINED dispatch: every block step is enqueued back-to-back
        # WITHOUT forcing its (mass, surv) scalars — behind the remote-TPU
        # tunnel a per-step host sync costs 0.4-3 s of pure latency, ~8x
        # per basis (round-4 BENCH_NOTES: "basis 8-60 s, tunnel-latency
        # bound").  The saturation/instability exits become RETROACTIVE
        # row truncation below: junk blocks past an exit are built (cheap,
        # device-side) but never enter the basis.
        _t0 = _time.perf_counter()
        stats = []
        for b in range(depth):
            V, (mass, surv) = _block_step_impl(op, V, b, mode, nrefine, k)
            stats.append((mass, surv))
        masses = [float(m) for m, _ in stats]  # one sync for the whole build
        survs = [float(s) for _, s in stats]
        _record("basis_steps", depth=depth, masses=masses, surviving=survs,
                wall_s=round(_time.perf_counter() - _t0, 3))
        mass0 = None
        rows_keep = (depth + 1) * k
        for b in range(depth):
            # Krylov saturation: the in-step polar orthonormalization zeroed
            # every direction of block b+1 — deeper blocks add nothing.
            # (Moderately INFLATED surv — the polar pass not fully converged
            # on an ill-conditioned block — is deliberately tolerated: the
            # rank-revealing two-pass Loewdin fold clamps those directions,
            # and cutting the block instead starves the subspace — measured
            # 5.7e-2 vs 1.6e-6 eigenvector residual on the MICCA annulus.)
            if survs[b] < 0.5:
                rows_keep = (b + 1) * k
                break
            # Instability: the pre-orth CGS2 residual EXPLODED relative to
            # the running maximum (no-pivot banded LU element growth) or
            # overflowed to NaN outright — block b+1 and everything after
            # are growth junk.
            if not np.isfinite(masses[b]) or (
                    mass0 is not None and masses[b] > 1e12 * mass0):
                rows_keep = (b + 1) * k
                break
            mass0 = masses[b] if mass0 is None else max(mass0, masses[b])
        if rows_keep < (depth + 1) * k:
            V = Z(V.re[:rows_keep], V.im[:rows_keep])
    else:
        V, W = _block_basis_impl(op, Lz, sig, mode, nrefine, depth, n_op, k)
    _t0 = _time.perf_counter()
    Wnp = np.asarray(W.re) + 1j * np.asarray(W.im)
    _record("basis_w_readback", wall_s=round(_time.perf_counter() - _t0, 3))
    return V, Wnp  # V stays device-resident; callers fold/orth there


def _device_basis(factor, pencil, sigma: complex, mode: str, L0: np.ndarray,
                  m: int, nrefine: int):
    """Single-dispatch basis build on the dense/banded tiers.  Returns
    (orthonormal rows (m', n_op), W numpy) — callers verify W against the
    exact operator as the factorization health gate."""
    import jax.numpy as jnp

    sv = factor.solve_op()
    sig = Z(jnp.asarray(complex(sigma).real), jnp.asarray(complex(sigma).imag))
    if mode.startswith("eps"):
        op = EpsOp(sv=sv, C=csr_device(pencil[0]))
        n_op = pencil[0].n
    else:
        B, C = pencil
        op = PepOp(sv=sv, B=csr_device(B), C=csr_device(C), sig=sig)
        n_op = 2 * C.n
    Lz = Z(jnp.asarray(np.ascontiguousarray(L0.real)),
           jnp.asarray(np.ascontiguousarray(L0.imag)))
    if _split_basis(n_op):
        V, H, W = _basis_seed_impl(op, Lz, sig, mode, nrefine, m, n_op)
        step = 16
        j = 0
        while j < m:
            V, H = _arnoldi_chunk(op, V, H, j, min(j + step, m),
                                  mode=mode, nrefine=nrefine)
            j += step
    else:
        V, W = _basis_impl(op, Lz, sig, mode, nrefine, m, n_op)
    Wnp = np.asarray(W.re) + 1j * np.asarray(W.im)
    return V, Wnp  # V stays device-resident; callers fold/orth there


def _fold_basis(Vdev: Z, W: np.ndarray, n: int, include_w: bool) -> np.ndarray:
    """Fold the C^{2n} companion rows into C^n and re-orthonormalize.

    Default (round 5): the device-resident staged-Gram fold — no (rows, 2n)
    readback (~160 MB for a full-depth MICCA basis behind the tunnel), no
    O(rows^2 n) host SVD.  Its round-4 caveat — element-growth junk rows
    surviving as genuine directions — is gone: the static-pivoted banded LU
    (ops/banded.py) bounds the growth at the source and the retroactive
    instability/orthonormalization-failure truncation in
    `_device_block_basis` cuts any junk blocks BEFORE the fold.

    HELMHOLTZ_X_TPU_FOLD=svd restores the round-3 host-SVD pipeline
    (readback + rank-revealing SVD)."""
    if os.environ.get("HELMHOLTZ_X_TPU_FOLD", "staged") == "staged":
        return _fold_orth_device(Vdev, W, n, include_w)
    rows = np.asarray(Vdev.re) + 1j * np.asarray(Vdev.im)
    rows = rows[np.linalg.norm(rows, axis=1) > 1e-14]
    halves = np.concatenate([rows[:, :n], rows[:, n:]], axis=0)
    if include_w:
        halves = np.concatenate([halves, W.T], axis=0)
    return _orth_rows(halves)


def _apply_P_host(factor, x: np.ndarray) -> np.ndarray:
    """Exact P x on host (scipy), tier-agnostic — the factor health check."""
    from .linsolve import ShiftedFactor

    if isinstance(factor, ShiftedFactor):
        return factor._apply_P_np(x)
    return factor._P @ x  # banded and host tiers both store the operator


def _apply_P_host_block(factor, X: np.ndarray) -> np.ndarray:
    from .linsolve import ShiftedFactor

    if isinstance(factor, ShiftedFactor):
        return np.stack([factor._apply_P_np(X[:, j])
                         for j in range(X.shape[1])], axis=1)
    return factor._P @ X


def build_basis(factor, A, B, C, L: np.ndarray, R: np.ndarray,
                sigma: complex, eps_kind: bool, m: int) -> Optional[np.ndarray]:
    """Orthonormal rows (m', n) spanning the resolvent-Krylov space started
    from W = P^{-1} L, or None when the factorization health gate fails
    (callers fall back to the exact paths, whose lazy stability probes then
    repair the factor).  For the quadratic pencil the companion Krylov
    vectors live in C^{2n}; both halves are re-orthonormalized in C^n.
    """
    backend = getattr(factor, "backend", "dense")
    # Basis-build solves shape the subspace only (Ah/Bh/Ch come from the
    # exact f64 CSR operators), but the no-pivot banded LU's RAW solve can
    # be ~1e-5 off (element growth), which shows up linearly in the final
    # eigenvector residual — keep refinement sweeps.  The count is PINNED
    # (not the probe-tuned factor.refine): it is a static jit argument of
    # the basis programs, and letting the probe's run-to-run jitter pick
    # 4 vs 5 sweeps invalidated the persistent compile cache every process
    # (~180 s remote AOT per miss).
    nrefine = 4 if backend == "banded" else (
        factor.nrefine if backend == "dense" else 0)
    L = np.asarray(L, dtype=np.complex128).reshape(A.n, -1)
    R = np.asarray(R, dtype=np.complex128).reshape(A.n, -1)
    k = L.shape[1]

    herm = "h" if getattr(factor, "herm_factor", False) else ""
    if k == 1 and backend in ("dense", "banded"):
        mode = ("eps" if backend == "dense" else "epsb" + herm) if eps_kind \
            else ("pep" if backend == "dense" else "pepb" + herm)
        pencil = (C,) if eps_kind else (B, C)
        Vdev, W = _device_basis(factor, pencil, sigma, mode, L[:, 0], m,
                                nrefine)
        # Health gate: catches divergent/garbage factorizations (f32 no-pivot
        # blowup leaves residual >> 1).  Accuracy is still enforced by the
        # final true-residual gate in projected_fpi; small W residuals only
        # perturb the SUBSPACE, not the projected operators.
        relW = float(np.linalg.norm(_apply_P_host(factor, W) - L[:, 0])
                     / max(np.linalg.norm(L[:, 0]), 1e-300))
        if not np.isfinite(relW) or relW > 1e-3:
            info(f"! factor health check failed (W residual {relW:.1e}).")
            return None
        if eps_kind:
            rows = np.asarray(Vdev.re) + 1j * np.asarray(Vdev.im)
            keep = np.linalg.norm(rows, axis=1) > 1e-14
            return rows[keep]
        return _fold_basis(Vdev, W.reshape(C.n, -1), C.n, include_w=False)

    if backend in ("dense", "banded"):
        # rank k > 1 on a device tier: single-dispatch block-Krylov basis
        mode = ("eps" if backend == "dense" else "epsb" + herm) if eps_kind \
            else ("pep" if backend == "dense" else "pepb" + herm)
        pencil = (C,) if eps_kind else (B, C)
        Vdev, W = _device_block_basis(factor, pencil, sigma, mode, L, m,
                                      nrefine)
        relW = float(np.linalg.norm(_apply_P_host_block(factor, W) - L)
                     / max(np.linalg.norm(L), 1e-300))
        if not np.isfinite(relW) or relW > 1e-3:
            info(f"! factor health check failed (W residual {relW:.1e}).")
            return None
        from ..utils.metrics import timed as _timed

        if eps_kind:
            # SVD cleanup: with redundant flame columns the device block
            # orthonormalization returns rows whose Gram is a projector
            # (rank-deficient), not exact zeros — re-orthonormalize on host.
            rows = np.asarray(Vdev.re) + 1j * np.asarray(Vdev.im)
            return _orth_rows(rows)
        with _timed("basis_fold"):
            return _fold_basis(Vdev, W, C.n, include_w=True)

    W = np.asarray(factor.solve_P(L)) if backend == "host" \
        else np.stack([_solve_np(factor, L[:, j]) for j in range(k)], axis=1)

    # host tier: host-driven block Arnoldi, one multi-RHS sparse-LU solve
    # per block step (SuperLU accepts matrix right-hand sides)
    depth = max(2, -(-m // max(k, 1)))
    if eps_kind:
        Csp = C.to_scipy()

        def apply_fn(v):
            return _solve_np(factor, Csp @ v)

        def apply_block(rows):  # (j, n) -> (j, n)
            return np.asarray(factor.solve_P(Csp @ rows.T)).T

        return _host_block_arnoldi(apply_fn, W, depth,
                                   block_apply=apply_block
                                   if backend == "host" else None)

    Bsp = B.to_scipy()
    Csp = C.to_scipy()
    n = C.n

    def apply2n(z):
        v1, v2 = z[:n], z[n:]
        rhs = Bsp @ v1 + Csp @ (v2 + sigma * v1)
        z1 = -_solve_np(factor, rhs)
        return np.concatenate([z1, v1 + sigma * z1])

    def apply2n_block(rows):  # (j, 2n) -> (j, 2n)
        V1 = rows[:, :n].T
        V2 = rows[:, n:].T
        rhs = Bsp @ V1 + Csp @ (V2 + sigma * V1)
        Z1 = -np.asarray(factor.solve_P(rhs))
        return np.concatenate([Z1, V1 + sigma * Z1], axis=0).T

    start2n = np.concatenate([W, sigma * W], axis=0)
    rows2n = _host_block_arnoldi(apply2n, start2n, depth,
                                 block_apply=apply2n_block
                                 if backend == "host" else None)
    halves = np.concatenate([rows2n[:, :n], rows2n[:, n:]], axis=0)
    halves = np.concatenate([halves, W.T], axis=0)
    return _orth_rows(halves)


def project(V: np.ndarray, A, B, C, L: np.ndarray, R: np.ndarray) -> ProjectedPencil:
    """Galerkin projections in exact f64 via host CSR products (m SpMVs)."""
    Asp = A.to_scipy()
    Csp = C.to_scipy()
    Vc = np.conj(V)
    Ah = Vc @ (Asp @ V.T)
    Ch = Vc @ (Csp @ V.T)
    Bh = None
    if B is not None:
        Bh = Vc @ (B.to_scipy() @ V.T)
    L = np.asarray(L, dtype=np.complex128).reshape(V.shape[1], -1)
    R = np.asarray(R, dtype=np.complex128).reshape(V.shape[1], -1)
    return ProjectedPencil(V=V, Ah=Ah, Bh=Bh, Ch=Ch, Lh=Vc @ L, Rh=V @ R)


# ---------------------------------------------------------------------------
# dense eigen-solves of the projected pencils


def _eig_eps(Sh: np.ndarray, Ch: np.ndarray, target2: complex):
    """S y = lambda (-Ch) y, ordered by |lambda - target2|."""
    lam, Y = np.linalg.eig(np.linalg.solve(-Ch, Sh))
    o = np.argsort(np.abs(lam - target2))
    return lam[o], Y[:, o]


def _eig_pep(Sh: np.ndarray, Bh: np.ndarray, Ch: np.ndarray, target: complex):
    """(Sh + lambda Bh + lambda^2 Ch) y = 0 by companion linearization,
    ordered by |lambda - target|; eigenvectors are the first block."""
    m = Sh.shape[0]
    Cinv_S = np.linalg.solve(Ch, Sh)
    Cinv_B = np.linalg.solve(Ch, Bh)
    comp = np.block([[np.zeros((m, m)), np.eye(m)], [-Cinv_S, -Cinv_B]])
    lam, Y = np.linalg.eig(comp)
    o = np.argsort(np.abs(lam - target))
    return lam[o], Y[:m, o]


def _fmt(tol: float) -> str:
    digits = int("{:.0e}".format(tol)[-2:])
    return "{{:+.{}f}}".format(digits)


def true_rel_residual(A, B, C, L, R, s: complex, lam: complex,
                      x: np.ndarray) -> float:
    """|| (A + lam^(1|2)-weighted pencil - s L R^T) x || normalized by the
    term magnitudes — the exact-operator acceptance gate."""
    Asp = A.to_scipy()
    Csp = C.to_scipy()
    terms = [Asp @ x, lam * (Csp @ x) if B is None else lam**2 * (Csp @ x)]
    if B is not None:
        terms.append(lam * (B.to_scipy() @ x))
    if s != 0:
        Lm = np.asarray(L, dtype=np.complex128).reshape(len(x), -1)
        Rm = np.asarray(R, dtype=np.complex128).reshape(len(x), -1)
        terms.append(-s * (Lm @ (Rm.T @ x)))
    r = np.sum(terms, axis=0)
    scale = max(np.linalg.norm(t) for t in terms)
    return float(np.linalg.norm(r) / max(scale, 1e-300))


# ---------------------------------------------------------------------------
# the projected fixed-point iteration


def _start_index(proj, ops, lam, Y, i: int, max_check: int = 8) -> int:
    """Index of the i-th GENUINE passive mode in the target-ordered
    projected spectrum.  The resolvent-Krylov basis targets the ACTIVE
    modes, so the projected passive solve can surface projection artifacts
    closer to the target than any true mode; starting the FPI there costs
    extra swinging outer iterations (the reference starts from the full
    passive operator's eigenvalue and converges smoothly).  A candidate is
    accepted when its full-space passive residual (a few host SpMVs, once
    per solve) is small."""
    if ops is None:
        return i
    A, B, C, L, R = ops
    good = 0
    for j in range(min(len(lam), max_check)):
        x = proj.V.T @ Y[:, j]
        nrm = np.linalg.norm(x)
        if nrm == 0 or not np.isfinite(nrm):
            continue
        rel = true_rel_residual(A, B, C, L, R, 0.0, complex(lam[j]), x / nrm)
        if np.isfinite(rel) and rel < 3e-2:
            if good == i:
                return j
            good += 1
    return i


def fpi_on_projection(proj: ProjectedPencil, D, target: complex, nev: int,
                      i: int, tol: float, maxiter: int, problem_type: str,
                      eps_kind: bool, ops=None):
    """The reference's Aitken-relaxed FPI on an already-projected pencil.
    Returns (lam, Y, iterations) — eigenvalues/vectors of the projected
    problem at the converged omega, ordered by |lambda - target^(2|1)|.
    ``ops`` = (A, B, C, L, R) enables full-space residual filtering of the
    STARTING mode (see _start_index); the loop itself tracks index i like
    the reference."""
    from .fpi import _flame_scale

    tgt = complex(target) if not eps_kind else complex(target) ** 2
    LRh = proj.Lh @ proj.Rh.T

    def solve_proj(s: complex):
        Sh = proj.Ah - s * LRh
        if eps_kind:
            return _eig_eps(Sh, proj.Ch, tgt)
        return _eig_pep(Sh, proj.Bh, proj.Ch, tgt)

    s_fmt = _fmt(tol)
    lam, Y = solve_proj(0.0)
    i0 = _start_index(proj, ops, lam, Y, i)
    omega = np.zeros(maxiter + 1, dtype=complex)
    f = np.zeros(maxiter, dtype=complex)
    alpha = np.zeros(maxiter, dtype=complex)
    omega[0] = np.sqrt(lam[i0]) if eps_kind else lam[i0]
    info("+ Starting eigenvalue is found: {}  {}j. ".format(
        s_fmt.format(omega[0].real), s_fmt.format(omega[0].imag)))
    info("-> Iterations are starting.\n ")

    domega = 2 * tol
    kk = -1
    while abs(domega) > tol:
        kk += 1
        if kk >= maxiter - 1:
            info("! FPI hit maxiter without converging.")
            break
        info("* iter = {:2d}".format(kk + 1))
        sc = _flame_scale(D, omega[kk], problem_type)
        lam, Y = solve_proj(sc)
        f[kk] = np.sqrt(lam[i]) if eps_kind else lam[i]
        if kk == 0:
            alpha[kk] = 0.5
        else:
            alpha[kk] = 1.0 / (1.0 - (f[kk] - f[kk - 1]) / (omega[kk] - omega[kk - 1]))
        omega[kk + 1] = alpha[kk] * f[kk] + (1 - alpha[kk]) * omega[kk]
        domega = omega[kk + 1] - omega[kk]
        info("+ omega = {}  {}j,  |domega| = {:.2e}\n".format(
            s_fmt.format(omega[kk + 1].real), s_fmt.format(omega[kk + 1].imag),
            abs(domega)))

    # final projected solve at the converged omega for clean eigenpairs
    sc = _flame_scale(D, omega[kk + 1], problem_type)
    lam, Y = solve_proj(sc)
    return lam, Y, kk + 1, sc


def _resolvent_eigenpair(A, B, C, L, R, sc: complex, lam_i: complex,
                         eps_kind: bool):
    """EXACT eigenvector recovery at the converged eigenvalue: for the
    rank-k flame the pencil  (Q(lam) - sc L R^T) x = 0  gives
    x = sc * Q(lam)^{-1} L (R^T x),  so  alpha = R^T x  solves the k x k
    eigenproblem  sc * (R^T Q(lam)^{-1} L) alpha = alpha  and
    x = Q(lam)^{-1} L alpha.  One factorization of the passive operator AT
    the converged eigenvalue + one k-column solve replaces the
    inverse-iteration polish (which cost ~100 host-driven remote solves on
    the 3D annulus); the residual floor is the refined solve accuracy
    (~1e-10), not the Krylov subspace's saturation (~1e-6).

    Returns (x, factor2) where factor2 is the Q(lam) factorization (reused
    by the caller's polish sweeps: inverse iteration with a factor AT the
    converged eigenvalue contracts in one sweep, unlike the distant
    sigma-factor), or (None, None) when sc == 0 (no flame: the pencil is
    linear and the projected vector is already optimal for the subspace)."""
    from .linsolve import ShiftedFactor, build_shifted_factor

    if sc == 0:
        return None, None
    lam = complex(lam_i)
    if eps_kind:
        terms = [(1.0, A), (lam, C)]
    else:
        terms = [(1.0, A), (lam, B), (lam * lam, C)]
    factor2 = build_shifted_factor(terms, A.n)

    if isinstance(factor2, ShiftedFactor):
        W2 = np.stack([_solve_np(factor2, L[:, j]) for j in range(L.shape[1])],
                      axis=1)
    else:
        W2 = np.asarray(factor2.solve_P(L))
    M = sc * (R.T @ W2)  # k x k
    mu, av = np.linalg.eig(M)
    j = int(np.argmin(np.abs(mu - 1.0)))
    x = W2 @ av[:, j]
    nrm = np.linalg.norm(x)
    if not np.isfinite(nrm) or nrm == 0:
        return None, factor2
    return x / nrm, factor2


def _polish_eigenpair(solve_block, A, B, C, L, R, sc: complex, sigma: complex,
                      lam_i: complex, x: np.ndarray, eps_kind: bool,
                      gate: float, rel: float, maxpolish: int = 3):
    """Inverse-iteration + fixed-s Rayleigh polish of one eigenpair of the
    INNER pencil (s frozen at sc, exactly what the residual gate measures).
    Each sweep is one Woodbury-corrected solve with the existing factor —
    recovers machine-accurate eigenpairs when the projection subspace
    saturates below the gate (large 3D cases: the resolvent-Krylov space's
    numerical rank limits the eigenVECTOR residual to ~1e-6 while the
    eigenvalue is already converged).  Mirrors the reference's per-iteration
    SLEPc re-solve accuracy without re-running Arnoldi."""
    Asp = A.to_scipy()
    Csp = C.to_scipy()
    Bsp = B.to_scipy() if B is not None else None
    k = L.shape[1]
    Wl = None
    capm = None
    lam = lam_i
    for _ in range(maxpolish):
        if eps_kind:
            b = Csp @ x
        else:
            b = Bsp @ x + Csp @ (lam * x + sigma * x)
        y = solve_block(b[:, None])[:, 0]
        if sc != 0:
            if Wl is None:
                Wl = solve_block(L)
                capm = np.linalg.inv(np.eye(k) / sc - R.T @ Wl)
            y = y + Wl @ (capm @ (R.T @ y))
        nrm = np.linalg.norm(y)
        if not np.isfinite(nrm) or nrm == 0:
            break
        x = y / nrm
        # sc == 0 (zero flame scale): the low-rank term vanishes entirely —
        # keep lr_x a VECTOR so the vdot below stays well-defined
        lr_x = L @ (R.T @ x) if sc != 0 else np.zeros_like(x)
        if eps_kind:
            lam = -(np.vdot(x, Asp @ x) - sc * np.vdot(x, lr_x)) \
                / np.vdot(x, Csp @ x)
        else:
            rho = np.vdot(x, Asp @ x) + lam * np.vdot(x, Bsp @ x) \
                + lam**2 * np.vdot(x, Csp @ x) - sc * np.vdot(x, lr_x)
            drho = np.vdot(x, Bsp @ x) + 2 * lam * np.vdot(x, Csp @ x)
            lam = lam - rho / drho
        rel = true_rel_residual(A, B, C, L, R, sc, lam, x)
        if rel <= gate:
            break
    return lam, x, rel


def finalize_projected(proj: ProjectedPencil, A, B, C, L, R, lam, Y, iters,
                       sc: complex, sigma: complex, nev: int, i: int,
                       eps_kind: bool, print_results: bool,
                       gate: Optional[float] = None,
                       solve_block=None, solve_at=None) -> Optional[EigenResult]:
    """Recover full-space eigenpairs, verify the wanted one against the EXACT
    operator, and package an EigenResult (None when the gate rejects).
    When the raw projection misses the gate, an inverse-iteration polish
    with a factorization AT the converged eigenvalue runs; ``solve_at``
    (``(lam0, eps_kind) -> (n, j)-block solve of Q(lam0)``) lets the
    distributed path supply a SHARDED solver for it instead of the local
    ``build_shifted_factor`` default."""
    nkeep = min(max(nev, 2), len(lam))
    vecs = proj.V.T @ Y[:, :nkeep]
    vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)

    lam = np.array(lam, dtype=np.complex128)
    # per-pair exact-operator residuals; only pair i gates the solve (and is
    # the only one a polish improves) but each reported residual must belong
    # to its own eigenpair
    residuals = np.array([true_rel_residual(A, B, C, L, R, sc, lam[j],
                                            vecs[:, j])
                          for j in range(nkeep)])
    rel = residuals[i]
    if gate is None:
        gate = float(os.environ.get("HELMHOLTZ_X_TPU_PROJ_GATE", "1e-8"))
    lam_fpi = complex(lam[i])  # the omega that froze sc = s(omega)
    if np.isfinite(rel) and rel > gate and sc != 0:
        # ONE factorization AT the converged eigenvalue serves both polish
        # stages (sharded via `solve_at` on the distributed path):
        #
        # 1. exact rank-k resolvent recovery — x = Q(lam)^{-1} L alpha with
        #    alpha from the k x k fixed point sc (R^T Q^{-1} L) a = a.  One
        #    multi-RHS solve, KEEPS the FPI's eigenvalue (so the nonlinear
        #    consistency check below cannot reject a moved lam), and its
        #    residual floor is the refined solve accuracy (~1e-10), not the
        #    Krylov subspace's saturation.  This is the cheap, robust stage
        #    and almost always suffices.
        # 2. inverse-iteration + Rayleigh polish (may move lam; checked).
        from .linsolve import ShiftedFactor, build_shifted_factor

        info(f"- projection residual {rel:.2e} (m={proj.V.shape[0]}); "
             "recovering the eigenpair at the converged eigenvalue.")
        Lm = np.asarray(L, dtype=np.complex128).reshape(A.n, -1)
        Rm = np.asarray(R, dtype=np.complex128).reshape(A.n, -1)
        lam0 = complex(lam[i])
        if solve_at is not None:
            # distributed path (parallel/fpi.py): the caller supplies the
            # sharded solver factory for Q(lam0) — the polish solves run
            # over the device mesh instead of a local factorization
            _solve2 = solve_at(lam0, eps_kind)
        else:
            if eps_kind:
                terms2 = [(1.0, A), (lam0, C)]
            else:
                terms2 = [(1.0, A), (lam0, B), (lam0 * lam0, C)]
            factor2 = build_shifted_factor(terms2, A.n)

            def _solve2(Bm):
                import jax as _jax

                if (hasattr(factor2, "solve_P_fused")
                        and _jax.default_backend() != "cpu"):
                    # one dispatch for substitution + refinement — the
                    # host-driven path pays ~8-10 tunnel roundtrips here
                    return factor2.solve_P_fused(Bm)
                if isinstance(factor2, ShiftedFactor):
                    return np.stack([_solve_np(factor2, Bm[:, j])
                                     for j in range(Bm.shape[1])], axis=1)
                return np.asarray(factor2.solve_P(Bm))

        W2 = _solve2(Lm)
        M = sc * (Rm.T @ W2)  # k x k
        mu, av = np.linalg.eig(M)
        jbest = int(np.argmin(np.abs(mu - 1.0)))
        x_r = W2 @ av[:, jbest]
        nrm = np.linalg.norm(x_r)
        if np.isfinite(nrm) and nrm > 0:
            x_r = x_r / nrm
            rel_r = true_rel_residual(A, B, C, L, R, sc, lam0, x_r)
            if np.isfinite(rel_r) and rel_r < rel:
                vecs[:, i] = x_r
                rel = rel_r
                residuals[i] = rel_r
        if np.isfinite(rel) and rel > gate:
            info(f"- residual {rel:.2e} after resolvent recovery; "
                 "polishing with inverse iteration.")
            lam_p, x_p, rel_p = _polish_eigenpair(
                _solve2, A, B, C, Lm, Rm, sc, lam0, lam0,
                vecs[:, i].copy(), eps_kind, gate, rel)
            # keep the better of the two recoveries (at an unreachable
            # gate the polish can wander below the solve-accuracy floor)
            if np.isfinite(rel_p) and rel_p < rel:
                lam[i] = lam_p
                vecs[:, i] = x_p
                residuals[i] = rel_p
                rel = rel_p
    if not np.isfinite(rel) or rel > gate:
        info(f"! projection residual {rel:.2e} too large (m={proj.V.shape[0]}); "
             "falling back to the exact path.")
        return None
    # Nonlinear consistency: the residual gate certifies the FROZEN-sc
    # pencil only.  If the polish moved the eigenvalue away from the omega
    # that froze sc (degenerate subspace -> the projected FPI converged to
    # a spurious omega), the pair is self-consistent for the WRONG s(omega)
    # - reject and let the caller run the exact path.
    if abs(complex(lam[i]) - lam_fpi) > 1e-6 * abs(lam_fpi) and sc != 0:
        info(f"! polished eigenvalue moved {abs(complex(lam[i]) - lam_fpi):.2e}"
             f" from the FPI omega (sc frozen there); "
             "falling back to the exact path.")
        return None

    res = EigenResult(kind="eps" if eps_kind else "pep", sigma=sigma,
                      eigenvalues=lam[:nkeep], vectors=vecs,
                      iterations=iters, residuals=residuals)
    if print_results:
        from .arnoldi import _print_results

        _print_results(res)
    return res


def default_m(k: int, nev: int, backend: str = "dense") -> int:
    """Target Krylov dimension.  The host tier pays one sequential sparse-LU
    solve per basis column, so it runs a shallower space and leans on the
    (cheap) converged-eigenvalue polish in finalize.  The BANDED device
    tier matches it: its no-pivot LU's element growth caps the usable
    block-Krylov depth at ~3-4 blocks on hard 3D operators anyway
    (solvers/projection._device_block_basis truncation), so deeper default
    builds burn ~0.7 s/block computing junk that the fold discards; the
    converged-eigenvalue resolvent recovery in finalize supplies the final
    accuracy.  The dense tier keeps the deep default (exact QR solves)."""
    if backend in ("host", "banded"):
        # 3 blocks of k: the MICCA host probe shows the depth-3 space
        # already passes the residual gate with the identical eigenvalue
        # (8.3e-8) and no finalize recovery, ~1 s cheaper than depth 4
        return int(os.environ.get("HELMHOLTZ_X_TPU_PROJ_M",
                                  max(40, 3 * k, 12 * nev)))
    return int(os.environ.get("HELMHOLTZ_X_TPU_PROJ_M",
                              max(40, 8 * k, 16 * nev)))


def projected_fpi(factor, operators, D, target: complex, nev: int, i: int,
                  tol: float, maxiter: int, problem_type: str,
                  print_results: bool, eps_kind: bool,
                  m: Optional[int] = None) -> Optional[EigenResult]:
    """Run the reference FPI on the projected pencil; returns an EigenResult
    or None when the residual gate rejects (callers fall back to the exact
    round-1 paths)."""
    from .fpi import _flame_factors

    A, C = operators.A, operators.C
    B = (operators.B_adj if problem_type == "adjoint" else operators.B) \
        if not eps_kind else None
    L, R = _flame_factors(D, problem_type)
    k = np.asarray(L).reshape(A.n, -1).shape[1]
    sigma = complex(target) if not eps_kind else complex(target) ** 2
    if m is None:
        m = default_m(k, nev, getattr(factor, "backend", "dense"))
    m = min(m, A.n)

    from ..utils.metrics import timed

    info("--> Fixed point iteration started (resolvent-projection).\n")
    with timed("proj_basis", n=A.n, m=m, rank=k):
        V = build_basis(factor, A, B, C, L, R, sigma, eps_kind, m)
    if V is None:
        return None
    from ..utils.debug import check_finite

    check_finite("resolvent-Krylov basis", V)
    with timed("proj_project", m=V.shape[0]):
        proj = project(V, A, B, C, L, R)
    with timed("proj_fpi"):
        lam, Y, iters, sc = fpi_on_projection(proj, D, target, nev, i, tol,
                                              maxiter, problem_type, eps_kind,
                                              ops=(A, B, C, L, R))
    def _factor_solve_block(Bm):
        from .linsolve import BandedShiftedFactor, SparseShiftedFactor

        # Polish solves need full f64 accuracy; the basis-build refinement
        # count is tuned for subspace quality only, so boost it here.  The
        # non-mixed banded factor self-tunes via the lazy stability probe
        # (fired by this very solve), so only the f32 tier needs the boost.
        boost = isinstance(factor, BandedShiftedFactor) and factor.mixed
        if boost:
            saved = factor.refine
            factor.refine = max(saved, 6)
        try:
            if isinstance(factor, (BandedShiftedFactor, SparseShiftedFactor)):
                return np.asarray(factor.solve_P(Bm))  # native multi-RHS
            return np.stack([_solve_np(factor, Bm[:, j])
                             for j in range(Bm.shape[1])], axis=1)
        finally:
            if boost:
                factor.refine = saved

    with timed("proj_finalize"):
        res = finalize_projected(proj, A, B, C, L, R, lam, Y, iters, sc, sigma,
                                 nev, i, eps_kind, print_results,
                                 solve_block=_factor_solve_block)
    if res is not None:
        from ..utils.metrics import record

        record("projection", kind="eps" if eps_kind else "pep", n=A.n,
               basis=V.shape[0] if hasattr(V, "shape") else m,
               outer_iters=int(iters), rank=k)
    return res
