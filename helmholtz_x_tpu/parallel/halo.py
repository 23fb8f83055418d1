"""Halo-exchange sharded SpMV: O(halo) ICI traffic instead of O(n).

The reference's PETSc 'mpiaij' SpMV ghost-updates only the boundary dof
values each matvec (reference: flame_matrices.py:64-65 VecGhostUpdate;
SURVEY §2.3).  The round-1 sharded SpMV all_gathered the ENTIRE dof vector
per matvec (O(n) bytes per device).  Here the mesh is row-partitioned in
contiguous blocks after a bandwidth-reducing (RCM) ordering, so every
off-block column lies within a fixed halo width `hw` of the block edges;
each SpMV exchanges just two (hw,)-slabs with the two neighbour shards via
`ppermute` — the TPU-native VecGhostUpdate:

    left  halo <- ppermute(x[-hw:], shift +1)   (from shard s-1)
    right halo <- ppermute(x[:hw],  shift -1)   (from shard s+1)
    window = [left | x | right];  local COO columns pre-mapped into window
    coordinates at partition time.

XLA overlaps the two ppermutes with the interior segment-sum automatically
(independent dataflow).  Falls back to the all_gather layout (dist.py) when
the matrix bandwidth exceeds one block (partition_halo_csr raises).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dist import AXIS


class HaloCSR(NamedTuple):
    """Row-partitioned CSR in padded per-shard COO form with WINDOW-local
    column ids (window = [left halo | own block | right halo]).

    Leading dim = n_devices (sharded over AXIS):
      local_rows (nd, nnz_max) int32
      cols_win   (nd, nnz_max) int32 — column id in window coordinates
      vre, vim   (nd, nnz_max) f64
    """

    local_rows: jnp.ndarray
    cols_win: jnp.ndarray
    vre: jnp.ndarray
    vim: jnp.ndarray


def halo_width(sp_mat, n_devices: int) -> int:
    """Max distance of any nonzero from its row's block, i.e. the ghost-layer
    width a contiguous row partition needs (0 when block-diagonal)."""
    import scipy.sparse as sp

    m = sp.coo_matrix(sp_mat)
    n = m.shape[0]
    n_local = -(-n // n_devices)
    blk = m.row // n_local
    lo = blk * n_local
    hi = lo + n_local
    return int(max(np.maximum(lo - m.col, 0).max(initial=0),
                   np.maximum(m.col - (hi - 1), 0).max(initial=0)))


def partition_halo_csr(sp_mat, n_devices: int, mesh: Mesh,
                       hw: int | None = None):
    """Partition into a HaloCSR.  Returns (halo_csr, n_pad, n_local, hw).

    Raises ValueError when the bandwidth needs more than one neighbour block
    (hw > n_local) — callers fall back to the all_gather SpMV.
    """
    import scipy.sparse as sp

    m = sp.coo_matrix(sp_mat)
    n = m.shape[0]
    n_local = -(-n // n_devices)
    n_pad = n_local * n_devices
    need = halo_width(sp_mat, n_devices)
    if hw is None:
        hw = need
    elif hw < need:
        raise ValueError(f"forced hw={hw} < needed {need}")
    if hw > n_local:
        raise ValueError(
            f"halo width {hw} exceeds block size {n_local}; matrix bandwidth "
            "too wide for the 1-neighbour halo layout (use the all_gather "
            "SpMV or fewer shards)")
    shard_of = m.row // n_local
    local_row = m.row % n_local
    # window coordinate: col - (shard*n_local - hw)
    col_win = m.col - (shard_of * n_local - hw)
    counts = np.bincount(shard_of, minlength=n_devices)
    nnz_max = max(int(counts.max()), 1)
    lr = np.zeros((n_devices, nnz_max), np.int32)
    cw = np.zeros((n_devices, nnz_max), np.int32)
    vr = np.zeros((n_devices, nnz_max))
    vi = np.zeros((n_devices, nnz_max))
    # vectorized fill: stable-sort by shard, then position-within-shard =
    # rank minus the shard's start offset (a Python per-nnz loop here cost
    # ~30 s per 3D operator)
    order = np.argsort(shard_of, kind="stable")
    s_sorted = shard_of[order]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(len(order)) - starts[s_sorted]
    lr[s_sorted, pos] = local_row[order]
    cw[s_sorted, pos] = col_win[order]
    vr[s_sorted, pos] = m.data[order].real
    if np.iscomplexobj(m.data):
        vi[s_sorted, pos] = m.data[order].imag
    sh = NamedSharding(mesh, P(AXIS, None))
    return (
        HaloCSR(local_rows=jax.device_put(jnp.asarray(lr), sh),
                cols_win=jax.device_put(jnp.asarray(cw), sh),
                vre=jax.device_put(jnp.asarray(vr), sh),
                vim=jax.device_put(jnp.asarray(vi), sh)),
        n_pad, n_local, hw,
    )


def halo_window(xr, xi, hw: int, n_devices: int):
    """Exchange boundary slabs with both neighbours (inside shard_map) and
    return the local window [left | x | right].  hw = 0 short-circuits."""
    if hw == 0:
        return xr, xi
    perm_fwd = [(i, i + 1) for i in range(n_devices - 1)]
    perm_bwd = [(i + 1, i) for i in range(n_devices - 1)]
    # missing sources leave the halo zero-filled (edge shards)
    lh_r = jax.lax.ppermute(xr[-hw:], AXIS, perm=perm_fwd)
    lh_i = jax.lax.ppermute(xi[-hw:], AXIS, perm=perm_fwd)
    rh_r = jax.lax.ppermute(xr[:hw], AXIS, perm=perm_bwd)
    rh_i = jax.lax.ppermute(xi[:hw], AXIS, perm=perm_bwd)
    return (jnp.concatenate([lh_r, xr, rh_r]),
            jnp.concatenate([lh_i, xi, rh_i]))


def halo_spmv(h_blk: HaloCSR, xr, xi, hw: int, n_local: int, n_devices: int):
    """One shard's rows times the halo window of the dof vector.
    xr, xi: (n_local,) own block (inside shard_map, leading dim stripped)."""
    wr, wi = halo_window(xr, xi, hw, n_devices)
    lr = h_blk.local_rows[0]
    cols = h_blk.cols_win[0]
    vre = h_blk.vre[0]
    vim = h_blk.vim[0]
    xr_g = wr[cols]
    xi_g = wi[cols]
    pr = vre * xr_g - vim * xi_g
    pi = vre * xi_g + vim * xr_g
    return (jax.ops.segment_sum(pr, lr, num_segments=n_local),
            jax.ops.segment_sum(pi, lr, num_segments=n_local))


def make_halo_spmm(mesh: Mesh, H_sh: HaloCSR, hw: int, n_local: int,
                   n_devices: int):
    """Jitted distributed SpMM on the halo layout: one dispatch computes
    M @ X for a block of k dof-vectors (each column = two ppermute slabs +
    local gather/segment-sum, vmapped over k).  Used by the distributed
    Galerkin projection (parallel/fpi.project_dist) so the m' basis-column
    SpMVs of V -> A V^T run sharded instead of as host scipy products.

    Call signature: (H_sh, Bre, Bim) with B* (n_devices, k, n_local)
    sharded P(AXIS, None, None); returns the same layout."""
    from jax import shard_map

    def mm_local(Hb, Bre, Bim):
        Bre, Bim = Bre[0], Bim[0]  # (k, n_local)

        def one(vr, vi):
            return halo_spmv(Hb, vr, vi, hw, n_local, n_devices)

        Yr, Yi = jax.vmap(one)(Bre, Bim)
        return Yr[None], Yi[None]

    return jax.jit(shard_map(
        mm_local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None, None), P(AXIS, None, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None, None)),
        check_vma=False,
    ))


def _lstsq_hessenberg(Hr, Hi, beta, m: int):
    """min ||beta e1 - H y|| for the complex (m+1, m) Hessenberg via QR of
    the real embedding — backward stable (replaces the normal-equations
    solve, which squares the conditioning)."""
    emb = jnp.block([[Hr, -Hi], [Hi, Hr]])  # (2(m+1), 2m)
    rhs = jnp.zeros(2 * (Hr.shape[0]),).at[0].set(beta)
    q, r = jnp.linalg.qr(emb)
    y = jax.scipy.linalg.solve_triangular(r, q.T @ rhs, lower=False)
    return y[:m], y[m:]


def build_ras(shifted_pad, n_devices: int, n_local: int, hw: int, mesh: Mesh,
              nb: int = 128, dtype=np.float64):
    """Restricted additive Schwarz preconditioner with overlap = the halo
    width: factor each shard's OVERLAPPED diagonal block (rows/cols
    [s n_local - hw, (s+1) n_local + hw), identity-padded at the edges) with
    the uniform-geometry block-banded LU so the factors stack over the mesh.
    Application reuses the halo exchange the SpMV already does (the window
    IS the overlapped subdomain) and injects only the owned rows — classic
    RAS, which for the complex-shifted Helmholtz operator converges in far
    fewer GMRES iterations than zero-overlap block-Jacobi."""
    import scipy.sparse as sp

    from ..ops.banded import factor_banded_blocks

    a = sp.csr_matrix(shifted_pad)
    n_pad = n_devices * n_local
    n_win = n_local + 2 * hw
    blocks = []
    for s in range(n_devices):
        lo = s * n_local - hw
        blk = sp.lil_matrix((n_win, n_win), dtype=np.complex128)
        i0 = max(0, -lo)
        g0 = lo + i0
        g1 = min(n_pad, lo + n_win)
        i1 = i0 + (g1 - g0)
        blk[i0:i1, i0:i1] = a[g0:g1, g0:g1]
        for j in list(range(i0)) + list(range(i1, n_win)):
            blk[j, j] = 1.0
        blocks.append(blk.tocsr())
    fac, _ = factor_banded_blocks(blocks, nb=min(nb, max(32, n_win)),
                                  dtype=dtype)
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(AXIS))), fac)


def make_halo_gmres_solve(mesh: Mesh, H_sh: HaloCSR, hw: int, n_local: int,
                          n_devices: int, m_krylov: int = 40, pc=None,
                          pc_kind: str = "bjacobi"):
    """Jitted distributed GMRES(m) on the halo layout for a BLOCK of k RHS:
    SpMV = two ppermute slabs + local segment-sum; dots = psum; the k
    independent GMRES iterations are vmapped (collectives batch cleanly), so
    one dispatch advances every RHS by one restart.  With `pc` the iteration
    is left-preconditioned — `pc_kind` 'bjacobi' (stacked BandedFactor over
    the local diagonal blocks, dist.build_block_jacobi) or 'ras' (overlapped
    factors over the halo window, build_ras).  The host restart loop checks
    the TRUE residual so the answer is unchanged.

    Call signature of the returned fn: (H_sh, Bre, Bim) with B* of shape
    (n_devices, k, n_local) sharded P(AXIS, None, None)."""
    from jax import shard_map

    from ..ops.banded import banded_substitute

    n_win = n_local + 2 * hw

    def solve_local(Hb, Bre, Bim, *pcs):
        Bre, Bim = Bre[0], Bim[0]  # (k, n_local)

        def spmv(vr, vi):
            return halo_spmv(Hb, vr, vi, hw, n_local, n_devices)

        if pcs:
            fl = jax.tree.map(lambda a: a[0], pcs[0])
            if pc_kind == "ras":
                def pc_apply(rr, ri):
                    wr_, wi_ = halo_window(rr, ri, hw, n_devices)
                    z = banded_substitute(fl, wr_, wi_, False, n_win)
                    return z.re[hw:hw + n_local], z.im[hw:hw + n_local]
            else:
                def pc_apply(rr, ri):
                    z = banded_substitute(fl, rr, ri, False, n_local)
                    return z.re, z.im

            def op(vr, vi):
                wr, wi = spmv(vr, vi)
                return pc_apply(wr, wi)
        else:
            pc_apply = None
            op = spmv

        def gmres_one(bre, bim):
            if pc_apply is not None:
                bre, bim = pc_apply(bre, bim)
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
                # CGS2 with psum'd dots
                hre = jnp.zeros(m_krylov + 1)
                him = jnp.zeros(m_krylov + 1)
                for _ in range(2):
                    pr = jax.lax.psum(Vr @ wr + Vi @ wi, AXIS)
                    pi_ = jax.lax.psum(Vr @ wi - Vi @ wr, AXIS)
                    wr = wr - (Vr.T @ pr - Vi.T @ pi_)
                    wi = wi - (Vr.T @ pi_ + Vi.T @ pr)
                    hre = hre + pr
                    him = him + pi_
                b2 = jax.lax.psum(jnp.sum(wr * wr + wi * wi), AXIS)
                bj = jnp.sqrt(b2)
                invj = jnp.where(bj > 1e-300, 1 / bj, 0.0)
                Vr = Vr.at[j + 1].set(wr * invj)
                Vi = Vi.at[j + 1].set(wi * invj)
                hcol = jnp.stack([hre.at[j + 1].set(bj),
                                  him.at[j + 1].set(0.0)], axis=-1)
                H = H.at[:, j, :].set(hcol)
                return Vr, Vi, H

            Vr, Vi, H = jax.lax.fori_loop(0, m_krylov, body, (Vr, Vi, H))
            yr, yi = _lstsq_hessenberg(H[..., 0], H[..., 1], beta, m_krylov)
            xr = Vr[:m_krylov].T @ yr - Vi[:m_krylov].T @ yi
            xi = Vr[:m_krylov].T @ yi + Vi[:m_krylov].T @ yr
            return xr, xi

        Xr, Xi = jax.vmap(gmres_one)(Bre, Bim)
        return Xr[None], Xi[None]

    pc_specs = (jax.tree.map(lambda _: P(AXIS), pc),) if pc is not None else ()
    fn = jax.jit(shard_map(
        solve_local, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None, None), P(AXIS, None, None))
        + pc_specs,
        out_specs=(P(AXIS, None, None), P(AXIS, None, None)),
        check_vma=False,
    ))
    if pc is not None:
        return lambda Hb, br, bi: fn(Hb, br, bi, pc)
    return fn
