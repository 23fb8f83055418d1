"""Batched spectral-target sweeps: the mode-sweep DP dimension.

The reference's mode sweep (AnnularCombustor/Micca/fullAnnulus/
active_modes.py; Results/Active/Modes/Parallel{1000..11000}.log) runs six
INDEPENDENT nonlinear eigensolves, one per spectral target, each re-running
the full assembly + SLEPc machinery under mpirun.  The targets are an
embarrassingly parallel batch dimension, and on TPU the right shape is a
VMAPPED solve: every P(sigma_t) = A + sigma_t B + sigma_t^2 C shares one
sparsity pattern, hence ONE RCM permutation and ONE block-band geometry, so

  1. the A/B/C bands are scattered onto the device once (nnz-sized
     transfers, ops/banded.build_band_device),
  2. per chunk of targets, one jitted program combines the bands
     (P_t = A + sigma_t B + sigma_t^2 C is an axpy in band storage),
     factors them (vmapped right-looking block LU — the small per-block
     matmuls of several factorizations overlap on the MXU), and expands the
     block-Krylov bases (vmapped `_block_basis_impl`),
  3. the projected m x m nonlinear FPIs run per target on host
     (microseconds each, solvers/projection.fpi_on_projection).

Chunking bounds device memory (each factored band is ~2 * nbkp*(2W+1)*nb^2
f64); `chunk=None` picks the largest chunk fitting a ~6 GB budget.

CPU/host fallback: anything that is not the accelerator banded tier simply
loops `fixed_point_iteration` per target (still sharing assembly and flame
setup — the reference re-runs those too).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np

from ..ops.cplx import Z
from ..ops.csr import csr_device, csr_empty
from ..utils.logging import info
from ..utils.metrics import timed


def _band_mem_bytes(nbkp: int, W: int, nb: int) -> int:
    # band (re+im) + diagonal inverses, f64
    return 2 * 8 * nbkp * ((2 * W + 1) * nb * nb + nb * nb)


@partial(__import__("jax").jit, static_argnames=("W", "nbk", "fast_inv"))
def _combine_factor(bA_re, bB_re, bB_im, bC_re, sig_re, sig_im,
                    W: int, nbk: int, fast_inv: bool):
    """P_t = A + sigma_t B + sigma_t^2 C in band storage (A, C real bands;
    B complex) for a VECTOR of shifts, then the vmapped block LU."""
    import jax
    import jax.numpy as jnp

    from ..ops.banded import _factor_band

    s2_re = sig_re * sig_re - sig_im * sig_im
    s2_im = 2 * sig_re * sig_im

    def combine(sr, si, s2r, s2i):
        re = bA_re + (sr * bB_re - si * bB_im) + s2r * bC_re
        im = (sr * bB_im + si * bB_re) + s2i * bC_re
        return re, im

    bre, bim = jax.vmap(combine)(sig_re, sig_im, s2_re, s2_im)
    return jax.vmap(lambda r, i: _factor_band(r, i, W, nbk,
                                              fast_inv=fast_inv))(bre, bim)


def sweep_targets(operators, D, targets: Sequence[float], nev: int = 4,
                  i: int = 0, tol: float = 1e-8, maxiter: int = 50,
                  problem_type: str = "direct",
                  m: Optional[int] = None,
                  chunk: Optional[int] = None,
                  mem_budget_bytes: int = 6 << 30):
    """Solve the nonlinear eigenproblem at every target; returns
    {target: EigenResult-or-None}.  Accelerator banded tier: vmapped
    factor + basis per chunk of targets; otherwise sequential."""
    import os

    import jax

    from .fpi import fixed_point_iteration

    targets = [complex(t) for t in targets]
    mode = os.environ.get("HELMHOLTZ_X_TPU_SWEEP", "auto")
    if mode != "banded":
        if (mode == "sequential" or jax.default_backend() == "cpu"
                or operators.B is None):  # eps sweep: sequential (rare path)
            return {t: fixed_point_iteration(operators, D, t, nev=nev, i=i,
                                             tol=tol, maxiter=maxiter,
                                             problem_type=problem_type)
                    for t in targets}
        from ..utils.warmup import cold_start_policy, wait_device

        if not wait_device(cold_start_policy()):
            info("! device session not ready; sweeping sequentially on host.")
            return {t: fixed_point_iteration(operators, D, t, nev=nev, i=i,
                                             tol=tol, maxiter=maxiter,
                                             problem_type=problem_type)
                    for t in targets}
    return _sweep_banded(operators, D, targets, nev, i, tol, maxiter,
                         problem_type, m, chunk, mem_budget_bytes)


def _sweep_banded(operators, D, targets, nev, i, tol, maxiter, problem_type,
                  m, chunk, mem_budget_bytes):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ..native import bandwidth, rcm
    from ..ops.banded import BandedFactor, build_band_device
    from ..solvers.arnoldi import BandedSolveOp, PepOp, Woodbury
    from ..solvers.fpi import _flame_factors, _pick_B
    from ..solvers.projection import (_block_basis_impl, _fold_basis,
                                      default_m, finalize_projected,
                                      fpi_on_projection, project)

    A, C = operators.A, operators.C
    B = _pick_B(operators, problem_type)
    L, R = _flame_factors(D, problem_type)
    L = np.asarray(L, dtype=np.complex128).reshape(A.n, -1)
    R = np.asarray(R, dtype=np.complex128).reshape(A.n, -1)
    k = L.shape[1]
    n = A.n
    if m is None:
        m = default_m(k, nev)
    depth = max(2, -(-m // k))

    # shared RCM geometry over the UNION pattern
    with timed("sweep_geometry", n=n, targets=len(targets)):
        Asp, Bsp, Csp = A.to_scipy(), B.to_scipy(), C.to_scipy()
        pat = sp.csr_matrix((np.ones(Asp.nnz), Asp.indices, Asp.indptr),
                            shape=Asp.shape)
        for Msp in (Bsp, Csp):
            pat = pat + sp.csr_matrix(
                (np.ones(Msp.nnz), Msp.indices, Msp.indptr), shape=Msp.shape)
        sym = ((pat + pat.T) > 0).astype(np.float64).tocsr()
        perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
        coo = sym.tocoo()
        bw = int(bandwidth(coo.row.astype(np.int64), coo.col.astype(np.int64),
                           n, perm))
        nb = int(min(256, max(128, 1 << int(np.ceil(np.log2(max(bw, 1)))))))
        # identity padding rows ride on the A band (real)
        bA_re, bA_im, W, nbk, nbkp, npad = build_band_device(
            Asp.astype(np.complex128), perm, nb, np.float64)
        bB_re, bB_im, *_ = build_band_device(
            Bsp.astype(np.complex128), perm, nb, np.float64, W=W)
        bC_re, bC_im, *_ = build_band_device(
            Csp.astype(np.complex128), perm, nb, np.float64, W=W)
        # strip the identity padding that build_band_device adds to EVERY
        # matrix: keep it on A only (B, C scatter ones there too)
        pad_mask = np.zeros((nbkp, 2 * W + 1, nb, nb), dtype=bool)
        for j in range(n, npad):
            pad_mask[j // nb, W, j % nb, j % nb] = True
        pm = jnp.asarray(pad_mask)
        bB_re = jnp.where(pm, 0.0, bB_re)
        bC_re = jnp.where(pm, 0.0, bC_re)

    if chunk is None:
        per = _band_mem_bytes(nbkp, W, nb)
        chunk = max(1, min(len(targets),
                           int(mem_budget_bytes // max(per, 1))))
    info(f"- target sweep: {len(targets)} targets, chunk {chunk}, "
         f"shared band geometry nb={nb} W={W} nbkp={nbkp}.")

    perm_pad = np.concatenate([perm, np.arange(n, npad)])
    iperm = np.empty(npad, dtype=np.int64)
    iperm[perm_pad] = np.arange(npad)
    dpad = np.ones(npad)
    permj = jnp.asarray(perm_pad)
    ipermj = jnp.asarray(iperm)
    dj = jnp.asarray(dpad)

    Adev, Bdev, Cdev = csr_device(A), csr_device(B), csr_device(C)
    Lz = Z(jnp.asarray(np.ascontiguousarray(L.real)),
           jnp.asarray(np.ascontiguousarray(L.imag)))
    zk = Z(jnp.zeros((n, 0)), jnp.zeros((n, 0)))
    zkk = Z(jnp.zeros((0, 0)), jnp.zeros((0, 0)))
    wb0 = Woodbury(zk, zkk, zk, zk, zkk, zk)
    nrefine = 3

    # vmap axes: factor leaves batched, everything else broadcast
    fac_axes = BandedFactor(band_re=0, band_im=0, invd_re=0, invd_im=0,
                            perm=None, iperm=None, dscale=None)
    none_csr = type(Adev)(indptr=None, indices=None, rows=None,
                          data=Z(None, None))
    sv_axes = BandedSolveOp(fac=fac_axes, A=none_csr, B=none_csr, C=none_csr,
                            cb=Z(0, 0), cc=Z(0, 0), wb=None, ozP=None)
    op_axes = PepOp(sv=sv_axes, B=none_csr, C=none_csr, sig=Z(0, 0))

    basis_fn = jax.vmap(
        lambda op, lz, sig: _block_basis_impl(op, lz, sig, "pepb", nrefine,
                                              depth, 2 * n, k),
        in_axes=(op_axes, None, Z(0, 0)))

    P_host = {}
    results = {}
    Vb_all = {}
    for c0 in range(0, len(targets), chunk):
        tchunk = targets[c0:c0 + chunk]
        sig = np.array(tchunk, dtype=np.complex128)
        with timed("sweep_factor", targets=len(tchunk)):
            bre, bim, idr, idi = _combine_factor(
                bA_re, bB_re, bB_im, bC_re,
                jnp.asarray(sig.real), jnp.asarray(sig.imag),
                W, nbk, fast_inv=jax.default_backend() != "cpu")
        fac = BandedFactor(band_re=bre, band_im=bim, invd_re=idr,
                           invd_im=idi, perm=permj, iperm=ipermj, dscale=dj)
        svs = BandedSolveOp(
            fac=fac, A=Adev, B=Bdev, C=Cdev,
            cb=Z(jnp.asarray(sig.real), jnp.asarray(sig.imag)),
            cc=Z(jnp.asarray((sig**2).real), jnp.asarray((sig**2).imag)),
            wb=wb0, ozP=None)
        ops = PepOp(sv=svs, B=Bdev, C=Cdev,
                    sig=Z(jnp.asarray(sig.real), jnp.asarray(sig.imag)))
        with timed("sweep_basis", targets=len(tchunk)):
            Vb, Wb = basis_fn(ops, Lz, Z(jnp.asarray(sig.real),
                                         jnp.asarray(sig.imag)))
        for j, t in enumerate(tchunk):
            Vb_all[t] = (Z(Vb.re[j], Vb.im[j]),
                         np.asarray(Wb.re[j]) + 1j * np.asarray(Wb.im[j]))
            P_host[t] = Asp + t * Bsp + t * t * Csp

    for t in targets:
        Vdev, Wnp = Vb_all[t]
        relW = float(np.linalg.norm(P_host[t] @ Wnp - L)
                     / max(np.linalg.norm(L), 1e-300))
        if not np.isfinite(relW) or relW > 1e-3:
            info(f"! sweep factor health check failed at target {t:.0f} "
                 f"({relW:.1e}); solving this target sequentially.")
            from .fpi import fixed_point_iteration

            results[t] = fixed_point_iteration(
                operators, D, t, nev=nev, i=i, tol=tol, maxiter=maxiter,
                problem_type=problem_type)
            continue
        V = _fold_basis(Vdev, Wnp, n, include_w=True)
        proj = project(V, A, B, C, L, R)
        lam, Y, iters, sc = fpi_on_projection(proj, D, t, nev, i, tol,
                                              maxiter, problem_type,
                                              eps_kind=False,
                                              ops=(A, B, C, L, R))
        results[t] = finalize_projected(proj, A, B, C, L, R, lam, Y, iters,
                                        sc, complex(t), nev, i, False, False)
        if results[t] is None:
            from .fpi import fixed_point_iteration

            info(f"! sweep projection rejected at target {t:.0f}; "
                 "solving sequentially.")
            results[t] = fixed_point_iteration(
                operators, D, t, nev=nev, i=i, tol=tol, maxiter=maxiter,
                problem_type=problem_type)
    return results
