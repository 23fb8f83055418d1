"""Dof-row sharded operators over a jax.sharding.Mesh.

The multi-chip analogue of the reference's MPI domain decomposition
(reference: PETSc 'mpiaij' row partitioning + ghost updates, SURVEY §2.3):
dofs are row-partitioned across a 1-D device mesh, SpMV gathers the global
vector with an XLA all_gather inside shard_map, and reductions (dots/norms)
are local partials + psum over the ICI.

This is the matrix-free scalable path: a distributed GMRES on the shifted
operator replaces the dense factorization when the problem outgrows one chip.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cplx import Z

AXIS = "dof"


class ShardedCSR(NamedTuple):
    """Row-partitioned CSR in padded per-shard COO form.

    All arrays have leading dim = n_devices (sharded over AXIS):
      local_rows (nd, nnz_max) int32 — row id local to the shard
      cols       (nd, nnz_max) int32 — GLOBAL column ids
      vre, vim   (nd, nnz_max) f64   — values (padding = 0)
    """

    local_rows: jnp.ndarray
    cols: jnp.ndarray
    vre: jnp.ndarray
    vim: jnp.ndarray


def partition_csr(sp_mat, n_devices: int, mesh: Mesh):
    """Split a scipy CSR matrix into a ShardedCSR + padded size info.

    Returns (sharded_csr, n_pad, n_local) where n_pad = n_devices * n_local.
    """
    import scipy.sparse as sp

    m = sp.coo_matrix(sp_mat)
    n = m.shape[0]
    n_local = -(-n // n_devices)
    n_pad = n_local * n_devices
    shard_of = m.row // n_local
    local_row = m.row % n_local
    counts = np.bincount(shard_of, minlength=n_devices)
    nnz_max = int(counts.max())
    lr = np.zeros((n_devices, nnz_max), np.int32)
    cc = np.zeros((n_devices, nnz_max), np.int32)
    vr = np.zeros((n_devices, nnz_max))
    vi = np.zeros((n_devices, nnz_max))
    fill = np.zeros(n_devices, np.int64)
    order = np.argsort(shard_of, kind="stable")
    for idx in order:
        s = shard_of[idx]
        j = fill[s]
        lr[s, j] = local_row[idx]
        cc[s, j] = m.col[idx]
        vr[s, j] = m.data[idx].real
        vi[s, j] = m.data[idx].imag if np.iscomplexobj(m.data) else 0.0
        fill[s] += 1
    sh = NamedSharding(mesh, P(AXIS, None))
    return (
        ShardedCSR(
            local_rows=jax.device_put(jnp.asarray(lr), sh),
            cols=jax.device_put(jnp.asarray(cc), sh),
            vre=jax.device_put(jnp.asarray(vr), sh),
            vim=jax.device_put(jnp.asarray(vi), sh),
        ),
        n_pad,
        n_local,
    )


def shard_vector(x: np.ndarray, n_pad: int, n_devices: int, mesh: Mesh) -> Z:
    """Pad and shard a complex vector to (nd, n_local) blocks."""
    n = len(x)
    xp = np.zeros(n_pad, dtype=np.complex128)
    xp[:n] = x
    xp = xp.reshape(n_devices, -1)
    sh = NamedSharding(mesh, P(AXIS, None))
    return Z(jax.device_put(jnp.asarray(xp.real), sh),
             jax.device_put(jnp.asarray(xp.imag), sh))


def shard_block(X: np.ndarray, n_pad: int, n_devices: int, mesh: Mesh) -> Z:
    """Pad and shard a (n, k) block of RHS columns to (nd, k, n_local)."""
    n, k = X.shape
    Xp = np.zeros((n_pad, k), dtype=np.complex128)
    Xp[:n] = X
    Xb = np.ascontiguousarray(
        Xp.T.reshape(k, n_devices, -1).transpose(1, 0, 2))
    sh = NamedSharding(mesh, P(AXIS, None, None))
    return Z(jax.device_put(jnp.asarray(Xb.real), sh),
             jax.device_put(jnp.asarray(Xb.imag), sh))


# ---- shard_map-local kernels (operate on ONE shard's block, with psum) ----

def _local_spmv(A_blk, xg_re, xg_im, n_local):
    """One shard's rows times the (gathered) global vector."""
    lr = A_blk.local_rows[0]
    cols = A_blk.cols[0]
    vre = A_blk.vre[0]
    vim = A_blk.vim[0]
    xr = xg_re[cols]
    xi = xg_im[cols]
    pr = vre * xr - vim * xi
    pi = vre * xi + vim * xr
    return (
        jax.ops.segment_sum(pr, lr, num_segments=n_local),
        jax.ops.segment_sum(pi, lr, num_segments=n_local),
    )


def _pdot_c(ar, ai, br, bi):
    """Distributed conj(a).b -> replicated scalar pair."""
    re = jax.lax.psum(jnp.sum(ar * br + ai * bi), AXIS)
    im = jax.lax.psum(jnp.sum(ar * bi - ai * br), AXIS)
    return re, im


def build_block_jacobi(shifted_pad, n_devices: int, n_local: int, mesh: Mesh,
                       nb: int = 128, dtype=np.float64):
    """Distributed block-Jacobi preconditioner: factor each shard's diagonal
    block (RCM + no-pivot block-banded LU, ops/banded.py) with uniform band
    geometry, stacked along a leading mesh-sharded axis.  Application inside
    shard_map is purely local (no communication) — the TPU-native analogue of
    PETSc's PCBJACOBI under the reference's SLEPc inner solves."""
    import scipy.sparse as sp

    from ..ops.banded import factor_banded_blocks

    a = sp.csr_matrix(shifted_pad)
    blocks = [a[s * n_local:(s + 1) * n_local, s * n_local:(s + 1) * n_local]
              for s in range(n_devices)]
    fac, _ = factor_banded_blocks(blocks, nb=min(nb, max(32, n_local)),
                                  dtype=dtype)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(AXIS))), fac)


def make_dist_gmres_solve(mesh: Mesh, A_sh: ShardedCSR, n_local: int,
                          n_devices: int, m_krylov: int = 30, pc=None):
    """Jitted distributed GMRES(m) solve A x = b from x0 = 0: returns the
    (unnormalized) minimizer over the m-dimensional Krylov space.  Same
    communication pattern as the training step (all_gather SpMV, psum dots);
    restart logic lives on the host.

    With `pc` (a stacked BandedFactor from build_block_jacobi) the iteration
    is LEFT-preconditioned — it minimizes ||M^{-1}(b - A x)|| over the
    preconditioned Krylov space; the host restart loop checks the TRUE
    residual, so the converged answer is unchanged."""
    from ..ops.banded import banded_substitute

    def solve_local(Ar, bre, bim, *pcs):
        bre, bim = bre[0], bim[0]

        def spmv(vr, vi):
            vgr = jax.lax.all_gather(vr, AXIS, tiled=True)
            vgi = jax.lax.all_gather(vi, AXIS, tiled=True)
            return _local_spmv(Ar, vgr, vgi, n_local)

        if pcs:
            fl = jax.tree.map(lambda a: a[0], pcs[0])

            def op(vr, vi):
                wr, wi = spmv(vr, vi)
                z = banded_substitute(fl, wr, wi, False, n_local)
                return z.re, z.im

            z0 = banded_substitute(fl, bre, bim, False, n_local)
            bre, bim = z0.re, z0.im
        else:
            op = spmv

        Vr = jnp.zeros((m_krylov + 1, n_local))
        Vi = jnp.zeros((m_krylov + 1, n_local))
        nrm2 = jax.lax.psum(jnp.sum(bre * bre + bim * bim), AXIS)
        beta = jnp.sqrt(nrm2)
        inv = jnp.where(beta > 0, 1 / beta, 0.0)
        Vr = Vr.at[0].set(bre * inv)
        Vi = Vi.at[0].set(bim * inv)
        H = jnp.zeros((m_krylov + 1, m_krylov, 2))

        def body(j, carry):
            Vr, Vi, H = carry
            wr, wi = op(Vr[j], Vi[j])
            hre = jax.lax.psum(Vr @ wr + Vi @ wi, AXIS)
            him = jax.lax.psum(Vr @ wi - Vi @ wr, AXIS)
            wr = wr - (Vr.T @ hre - Vi.T @ him)
            wi = wi - (Vr.T @ him + Vi.T @ hre)
            b2 = jax.lax.psum(jnp.sum(wr * wr + wi * wi), AXIS)
            bj = jnp.sqrt(b2)
            invj = jnp.where(bj > 1e-300, 1 / bj, 0.0)
            Vr = Vr.at[j + 1].set(wr * invj)
            Vi = Vi.at[j + 1].set(wi * invj)
            hcol = jnp.stack([hre.at[j + 1].set(bj), him.at[j + 1].set(0.0)],
                             axis=-1)
            H = H.at[:, j, :].set(hcol)
            return Vr, Vi, H

        Vr, Vi, H = jax.lax.fori_loop(0, m_krylov, body, (Vr, Vi, H))
        Hr, Hi = H[..., 0], H[..., 1]
        nr = Hr.T @ Hr + Hi.T @ Hi
        ni = Hr.T @ Hi - Hi.T @ Hr
        rhs_r = Hr[0] * beta
        rhs_i = -Hi[0] * beta
        nmat = jnp.block([[nr, -ni], [ni, nr]]) + 1e-300 * jnp.eye(2 * m_krylov)
        y = jnp.linalg.solve(nmat, jnp.concatenate([rhs_r, rhs_i]))
        yr, yi = y[:m_krylov], y[m_krylov:]
        xr = Vr[:m_krylov].T @ yr - Vi[:m_krylov].T @ yi
        xi = Vr[:m_krylov].T @ yi + Vi[:m_krylov].T @ yr
        return xr[None], xi[None]

    from jax import shard_map

    pc_specs = (jax.tree.map(lambda _: P(AXIS), pc),) if pc is not None else ()
    fn = jax.jit(shard_map(
        solve_local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)) + pc_specs,
        out_specs=(P(AXIS, None), P(AXIS, None)),
        check_vma=False,
    ))
    if pc is not None:
        return lambda A, br, bi: fn(A, br, bi, pc)
    return fn


def make_dist_gmres_step(mesh: Mesh, A_sh: ShardedCSR, C_sh: ShardedCSR,
                         n_local: int, n_devices: int, m_krylov: int = 8):
    """Build a jitted distributed 'training step': one inexact shift-invert
    power step  z ~ (A + sigma C)^{-1} (C x)  with the inner solve done by an
    m-step distributed GMRES (fixed iteration count, fully on-device), plus a
    Rayleigh-quotient estimate.  Every SpMV all_gathers the dof vector over
    the mesh axis and every reduction is a psum — the communication pattern
    of the production multi-chip path."""

    def step_local(Ar, Cr, xre, xim):
        # x blocks: (1, n_local) inside shard_map
        xre, xim = xre[0], xim[0]

        def spmv(op, vr, vi):
            vgr = jax.lax.all_gather(vr, AXIS, tiled=True)
            vgi = jax.lax.all_gather(vi, AXIS, tiled=True)
            return _local_spmv(op, vgr, vgi, n_local)

        # rhs = C x
        br, bi = spmv(Cr, xre, xim)

        # GMRES(m) on A z = b (A already shifted), x0 = 0 — matrices are
        # small per shard; basis kept as (m+1, n_local) local blocks.
        Vr = jnp.zeros((m_krylov + 1, n_local))
        Vi = jnp.zeros((m_krylov + 1, n_local))
        nrm2 = jax.lax.psum(jnp.sum(br * br + bi * bi), AXIS)
        beta = jnp.sqrt(nrm2)
        inv = jnp.where(beta > 0, 1 / beta, 0.0)
        Vr = Vr.at[0].set(br * inv)
        Vi = Vi.at[0].set(bi * inv)
        H = jnp.zeros((m_krylov + 1, m_krylov, 2))

        def body(j, carry):
            Vr, Vi, H = carry
            wr, wi = spmv(Ar, Vr[j], Vi[j])
            # CGS orthogonalization with psum'd dots
            hre = jax.lax.psum(Vr @ wr + Vi @ wi, AXIS)
            him = jax.lax.psum(Vr @ wi - Vi @ wr, AXIS)
            wr = wr - (Vr.T @ hre - Vi.T @ him)
            wi = wi - (Vr.T @ him + Vi.T @ hre)
            b2 = jax.lax.psum(jnp.sum(wr * wr + wi * wi), AXIS)
            beta_j = jnp.sqrt(b2)
            inv_j = jnp.where(beta_j > 1e-300, 1 / beta_j, 0.0)
            Vr = Vr.at[j + 1].set(wr * inv_j)
            Vi = Vi.at[j + 1].set(wi * inv_j)
            hcol = jnp.stack([hre.at[j + 1].set(beta_j),
                              him.at[j + 1].set(0.0)], axis=-1)
            H = H.at[:, j, :].set(hcol)
            return Vr, Vi, H

        Vr, Vi, H = jax.lax.fori_loop(0, m_krylov, body, (Vr, Vi, H))

        # least squares min ||beta e1 - H y|| via normal equations on the
        # small (m+1, m) complex Hessenberg (replicated, local compute)
        Hc_re = H[..., 0]
        Hc_im = H[..., 1]
        # normal equations (H^H H) y = H^H (beta e1)
        nr = Hc_re.T @ Hc_re + Hc_im.T @ Hc_im
        ni = Hc_re.T @ Hc_im - Hc_im.T @ Hc_re
        rhs_r = Hc_re[0] * beta
        rhs_i = -Hc_im[0] * beta
        nmat = jnp.block([[nr, -ni], [ni, nr]]) + 1e-30 * jnp.eye(2 * m_krylov)
        rhs = jnp.concatenate([rhs_r, rhs_i])
        y = jnp.linalg.solve(nmat, rhs)
        yr, yi = y[:m_krylov], y[m_krylov:]
        zr = Vr[:m_krylov].T @ yr - Vi[:m_krylov].T @ yi
        zi = Vr[:m_krylov].T @ yi + Vi[:m_krylov].T @ yr

        # Rayleigh quotient <z, A z> / <z, z> and normalization
        azr, azi = spmv(Ar, zr, zi)
        num_r, num_i = _pdot_c(zr, zi, azr, azi)
        den = jax.lax.psum(jnp.sum(zr * zr + zi * zi), AXIS)
        rq_r = num_r / den
        rq_i = num_i / den
        s = jnp.sqrt(den)
        invs = jnp.where(s > 0, 1 / s, 0.0)
        return (zr * invs)[None], (zi * invs)[None], rq_r, rq_i

    from jax import shard_map

    step = shard_map(
        step_local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)
