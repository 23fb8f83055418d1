"""Complex CSR sparse matrices as (re, im) f64 array pairs.

Replaces the reference's PETSc ``aij``/``mpiaij`` matrices
(reference: helmholtz_x/flame_matrices.py:166-181, acoustic_matrices.py:101-125).

CSR is a pure pytree, so the SAME structure serves two roles:

* **host-resident** (numpy leaves) — what every constructor returns.  All of
  assembly, Galerkin projection, Bloch transforms and I/O stay on the host:
  zero device traffic during setup (the accelerator may sit behind a
  network tunnel where even a trivial first transfer blocks on remote
  session binding).
* **device-resident** (jax leaves) — produced by ONE explicit
  :func:`csr_device` transfer when a solver hands the operator to its jitted
  hot loop; reusing the returned pytree across dispatches avoids re-uploads.

SpMV runs as gather + prefix-sum segment reduction, which XLA fuses well on
TPU; the row index array is precomputed so the hot path has static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Z


class CSR(NamedTuple):
    """Square complex CSR matrix (static sparsity pattern).

    A pure pytree of arrays — `n` is derived from indptr's (static) shape so
    CSR passes through jit/shard_map without non-array leaves.
    """

    indptr: jnp.ndarray  # (n+1,) int32
    indices: jnp.ndarray  # (nnz,) int32
    rows: jnp.ndarray  # (nnz,) int32 — expanded row ids (precomputed)
    data: Z  # (nnz,) complex pair

    @property
    def n(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def to_scipy(self):
        import scipy.sparse as sp

        # free for host-resident CSRs (numpy leaves); a device readback only
        # when called on an explicitly device-placed copy
        return sp.csr_matrix(
            (np.asarray(self.data.re) + 1j * np.asarray(self.data.im),
             np.asarray(self.indices), np.asarray(self.indptr)),
            shape=(self.n, self.n),
        )

    def to_dense(self) -> Z:
        dr = jnp.zeros((self.n, self.n)).at[self.rows, self.indices].add(self.data.re)
        di = jnp.zeros((self.n, self.n)).at[self.rows, self.indices].add(self.data.im)
        return Z(dr, di)


def csr_empty(n: int) -> CSR:
    """All-zero CSR (used as the absent-B placeholder in solver pytrees)."""
    return CSR(
        indptr=np.zeros(n + 1, np.int32),
        indices=np.zeros(0, np.int32),
        rows=np.zeros(0, np.int32),
        data=Z(np.zeros(0), np.zeros(0)),
    )


# Device copies memoized per host CSR object: a nonlinear solve hands the
# SAME A/B/C arrays to several factorizations (sigma factor, finalize
# factor, adjoint) and each re-upload costs ~1 s of tunnel traffic for the
# 3D operators.  Keyed by the identity of the host data buffer, with a
# strong reference kept so the id cannot be recycled; bounded FIFO.
_DEV_CACHE: dict = {}


def csr_device(A: CSR) -> CSR:
    """Host->device transfer of a host-built CSR, memoized per host object.

    Solvers call this per factorization/basis build and thread the returned
    pytree through every jitted dispatch; the memo makes repeated calls on
    the same host operator free."""
    if isinstance(A.data.re, jnp.ndarray) and not isinstance(
            A.data.re, np.ndarray):
        return A  # already device-resident
    key = (id(A.data.re), A.n, A.nnz)
    hit = _DEV_CACHE.get(key)
    if hit is not None:
        return hit[0]
    dev = CSR(
        indptr=jnp.asarray(A.indptr),
        indices=jnp.asarray(A.indices),
        rows=jnp.asarray(A.rows),
        data=Z(jnp.asarray(A.data.re), jnp.asarray(A.data.im)),
    )
    if len(_DEV_CACHE) >= 8:
        _DEV_CACHE.pop(next(iter(_DEV_CACHE)))
    _DEV_CACHE[key] = (dev, A.data.re)
    return dev


def csr_from_scipy(mat) -> CSR:
    import scipy.sparse as sp

    mat = sp.csr_matrix(mat)
    mat.sort_indices()
    n = mat.shape[0]
    indptr = np.asarray(mat.indptr, dtype=np.int32)
    rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
    data = np.asarray(mat.data)
    return CSR(
        indptr=indptr,
        indices=np.asarray(mat.indices, dtype=np.int32),
        rows=rows,
        data=Z(np.ascontiguousarray(data.real, dtype=np.float64),
               np.ascontiguousarray(data.imag, dtype=np.float64)),
    )


def csr_from_coo(n: int, rows, cols, vals_re, vals_im) -> CSR:
    """Build CSR from (possibly duplicated) COO triplets, summing duplicates.

    Host-side (numpy) setup path — the assembly scatter happens once per mesh.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    from ..native import coo_dedup

    native = coo_dedup(n, rows, cols, vals_re, vals_im)
    if native is not None:
        out_rows64, out_cols64, vr_u, vi_u = native
        out_rows = out_rows64.astype(np.int32)
        out_cols = out_cols64.astype(np.int32)
    else:
        key = rows * n + cols
        order = np.argsort(key, kind="stable")
        key = key[order]
        vr = np.asarray(vals_re, dtype=np.float64)[order]
        vi = np.asarray(vals_im, dtype=np.float64)[order]
        uniq, start = np.unique(key, return_index=True)
        seg = np.zeros(len(key), dtype=np.int64)
        seg[start] = 1
        seg = np.cumsum(seg) - 1
        vr_u = np.zeros(len(uniq))
        vi_u = np.zeros(len(uniq))
        np.add.at(vr_u, seg, vr)
        np.add.at(vi_u, seg, vi)
        out_rows = (uniq // n).astype(np.int32)
        out_cols = (uniq % n).astype(np.int32)
    counts = np.bincount(out_rows, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return CSR(
        indptr=indptr,
        indices=out_cols,
        rows=out_rows,
        data=Z(np.asarray(vr_u, dtype=np.float64),
               np.asarray(vi_u, dtype=np.float64)),
    )


def spmv(A: CSR, x: Z) -> Z:
    """y = A x (complex CSR SpMV/SpMM, jittable; x may be (n,) or (n, k)).

    The row ids are sorted by construction, so the row sums are computed as
    prefix-sum differences at the indptr boundaries — XLA's scatter-add (what
    segment_sum lowers to) is element-serial on TPU and ~1000x slower.
    """
    xr = x.re[A.indices]
    xi = x.im[A.indices]
    d_re = A.data.re if x.re.ndim == 1 else A.data.re[:, None]
    d_im = A.data.im if x.re.ndim == 1 else A.data.im[:, None]
    pr = d_re * xr - d_im * xi
    pi = d_re * xi + d_im * xr
    zero = jnp.zeros((1,) + pr.shape[1:], pr.dtype)
    csr_ = jnp.concatenate([zero, jnp.cumsum(pr, axis=0)])
    csi_ = jnp.concatenate([zero, jnp.cumsum(pi, axis=0)])
    lo = A.indptr[:-1]
    hi = A.indptr[1:]
    return Z(csr_[hi] - csr_[lo], csi_[hi] - csi_[lo])


def spmv_H(A: CSR, x: Z) -> Z:
    """y = A^H x (conjugate-transpose SpMV/SpMM; x may be (n,) or (n, k))."""
    xr = x.re[A.rows]
    xi = x.im[A.rows]
    d_re = A.data.re if x.re.ndim == 1 else A.data.re[:, None]
    d_im = A.data.im if x.re.ndim == 1 else A.data.im[:, None]
    # conj(data) * x scattered to column ids
    pr = d_re * xr + d_im * xi
    pi = d_re * xi - d_im * xr
    return Z(
        jax.ops.segment_sum(pr, A.indices, num_segments=A.n),
        jax.ops.segment_sum(pi, A.indices, num_segments=A.n),
    )


def csr_scale(A: CSR, s) -> CSR:
    from .cplx import zscale

    return A._replace(data=zscale(A.data, s))


def csr_add(A: CSR, B: CSR, alpha=1.0, beta=1.0) -> CSR:
    """alpha*A + beta*B on a merged pattern (host-side, setup only)."""
    sa = A.to_scipy() * alpha
    sb = B.to_scipy() * beta
    return csr_from_scipy(sa + sb)


def csr_conj_transpose(A: CSR) -> CSR:
    s = A.to_scipy()
    return csr_from_scipy(s.conj().T.tocsr())
