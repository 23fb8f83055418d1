"""MXU f64-accurate block-banded SpMM via the Ozaki bit-slice scheme.

The f64-accuracy ceiling of the VPU double-single kernel (pallas_band.py) is
the VPU flop rate (~18M nnz/s measured on the MICCA operator).  This kernel
moves the work to the MXU: every (nb x nb) band block of the operator and
every x block of the input are decomposed into K bf16 chunks by FIXED-POINT
bit slicing against a per-block power-of-two exponent,

    A_blk = 2^{eA} * sum_i c_i,     x_blk = 2^{ex} * sum_j d_j,

where slice i holds bits [8i, 8(i+1)) of the fixed-point representation:
every entry of c_i is an integer multiple of 2^{-8(i+1)} bounded by
~2^{-8i-1}, hence bf16-exact.  A chunk-pair MXU product c_i @ d_j sums nb
products of <=16-bit significands sharing one exponent window — EXACT in the
f32 accumulator (16 + log2(nb) <= 24 bits).  Same-magnitude passes (i+j = t)
combine in plain f32 (rounding 2^-24 relative to a 2^-8t-scaled group —
negligible); across groups and band slots the accumulation is double-single
(TwoSum) f32 pairs, recombined to f64 outside the kernel.  Truncation error
is ~2^-8K relative (K = 6 -> ~4e-15): accuracy is set by slicing depth, not
by f32 arithmetic.  Complex = 4 real Ozaki products on (re, im) pairs.

This is the round-2 documented route (docs/BENCH_NOTES.md "Documented path
to >=10x f64-accurate SpMV"): block-Krylov / multi-RHS callers (projection
basis refinement, distributed GMRES) amortize the band traffic over 8-16
columns, which is where the MXU wins land.  Replaces PETSc's CSR SpMV
(reference delegates to PETSc MatMult, helmholtz_x/petsc4py_utils.py:87-96).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Z
from .pallas_band import HAS_PALLAS, _i32, _two_sum

if HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


class OzakiBand(NamedTuple):
    """Chunked compact block-band operand (pure array pytree).

    chunks_re/chunks_im: (nblk, K, nb, nb) bf16 — bit slices per nonzero block
    ea_re/ea_im:         (nblk,) i32 — per-block power-of-two exponents
    rof/sof/first:       (nblk,) i32 — block row, diagonal slot, first-in-row
    """

    chunks_re: jnp.ndarray
    chunks_im: jnp.ndarray
    ea_re: jnp.ndarray
    ea_im: jnp.ndarray
    rof: jnp.ndarray
    sof: jnp.ndarray
    first: jnp.ndarray

    @property
    def K(self) -> int:
        return self.chunks_re.shape[1]

    @property
    def nb(self) -> int:
        return self.chunks_re.shape[2]


def _slice_host(v: np.ndarray, K: int):
    """Host bit-slicing: v (nblk, nb, nb) f64 -> (chunks (nblk, K, nb, nb)
    bf16, exponents (nblk,) i32) with v = 2^e * sum_i chunks_i to 2^-8K."""
    amax = np.max(np.abs(v), axis=(-2, -1))
    e = np.where(amax > 0, np.ceil(np.log2(np.maximum(amax, 1e-300))), 0.0)
    u = v / np.exp2(e)[..., None, None]
    chunks = []
    prev = np.zeros_like(u)
    for i in range(K):
        s_i = np.round(u * 2.0 ** (8 * (i + 1))) / 2.0 ** (8 * (i + 1))
        chunks.append((s_i - prev).astype(jnp.bfloat16))
        prev = s_i
    return np.stack(chunks, axis=1), e.astype(np.int32)


def pack_ozaki_band(band_re: np.ndarray, band_im: np.ndarray, nb: int,
                    K: int = 6) -> OzakiBand:
    """Compact the (nbkp, 2W+1, nb, nb) band arrays to nonzero blocks and
    bit-slice each into K bf16 chunks (host-side, once per operator)."""
    nbkp, ndiag = band_re.shape[0], band_re.shape[1]
    W = (ndiag - 1) // 2
    nz = (np.abs(band_re) + np.abs(band_im)).reshape(nbkp, ndiag, -1).max(2) > 0
    nz[:, W] = True  # keep diagonal blocks so every output row is visited
    rof, sof = np.nonzero(nz)
    first = np.zeros(len(rof), np.int32)
    first[np.unique(rof, return_index=True)[1]] = 1
    cre, ere = _slice_host(np.asarray(band_re[rof, sof], np.float64), K)
    cim, eim = _slice_host(np.asarray(band_im[rof, sof], np.float64), K)
    return OzakiBand(
        chunks_re=jnp.asarray(cre), chunks_im=jnp.asarray(cim),
        ea_re=jnp.asarray(ere), ea_im=jnp.asarray(eim),
        rof=jnp.asarray(rof.astype(np.int32)),
        sof=jnp.asarray(sof.astype(np.int32)),
        first=jnp.asarray(first))


def pack_ozaki_band_device(sp_mat, perm: np.ndarray, nb: int, K: int = 6,
                           nbkp: int | None = None, W: int | None = None):
    """Pack a scipy sparse matrix into an OzakiBand ON DEVICE.

    Only the nnz-sized COO triplets cross the host->device link (~20 bytes
    per nonzero); the compact (nblk, K, nb, nb) bf16 chunk tensor (hundreds
    of MB for 3D operators) is scattered and bit-sliced by one jitted
    program on the accelerator — essential behind a network tunnel, and the
    production build step for wiring the Ozaki SpMM into the banded solve
    tier's iterative refinement (see solvers/arnoldi._apply_P).

    Returns (OzakiBand, W, nbk, nbkp).  Pass nbkp/W from an existing
    BandedFactor so the SpMM layout matches its padded geometry."""
    import scipy.sparse as sp

    n = sp_mat.shape[0]
    a = sp.coo_matrix(sp_mat)
    inv = np.empty(n, dtype=np.int64)
    inv[perm[:n]] = np.arange(n)
    r = inv[a.row]
    c = inv[a.col]
    bw = int(np.abs(r - c).max()) if a.nnz else 0
    W_needed = max(1, -(-bw // nb))
    if W is None:
        W = W_needed
    elif W < W_needed:
        raise ValueError(f"forced W={W} < needed {W_needed}")
    nbk = -(-n // nb)
    if nbkp is None:
        nbkp = nbk + W
    br = (r // nb).astype(np.int64)
    slot = ((c // nb) - (r // nb) + W).astype(np.int64)
    # compact block ids: unique (br, slot) pairs, ordered by (br, slot) so
    # every block row's blocks are contiguous and `first` marks row starts;
    # force the diagonal block of every PADDED block row to exist so each
    # output row is visited (matches pack_ozaki_band's nz[:, W] = True)
    key = br * (2 * W + 1) + slot
    diag_keys = np.arange(nbkp, dtype=np.int64) * (2 * W + 1) + W
    uniq = np.unique(np.concatenate([key, diag_keys]))
    blk = np.searchsorted(uniq, key)
    rof = (uniq // (2 * W + 1)).astype(np.int32)
    sof = (uniq % (2 * W + 1)).astype(np.int32)
    first = np.zeros(len(uniq), np.int32)
    first[np.unique(rof, return_index=True)[1]] = 1
    nblk = len(uniq)
    lr = (r % nb).astype(np.int32)
    lc = (c % nb).astype(np.int32)

    @partial(jax.jit, static_argnames=("nblk", "nb", "K"))
    def _scatter_slice(blk, lr, lc, vre, vim, nblk, nb, K):
        z = jnp.zeros((nblk, nb, nb))
        vr = z.at[blk, lr, lc].add(vre)
        vi = z.at[blk, lr, lc].add(vim)

        def slice_blocks(v):
            amax = jnp.max(jnp.abs(v), axis=(-2, -1))
            e = jnp.where(amax > 0,
                          jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
            u = v / jnp.exp2(e)[..., None, None]
            chunks = []
            prev = jnp.zeros_like(u)
            for i in range(K):
                s_i = (jnp.round(u * 2.0 ** (8 * (i + 1)))
                       / 2.0 ** (8 * (i + 1)))
                chunks.append((s_i - prev).astype(jnp.bfloat16))
                prev = s_i
            return jnp.stack(chunks, axis=1), e.astype(jnp.int32)

        cre, ere = slice_blocks(vr)
        cim, eim = slice_blocks(vi)
        return cre, cim, ere, eim

    cre, cim, ere, eim = _scatter_slice(
        jnp.asarray(blk), jnp.asarray(lr), jnp.asarray(lc),
        jnp.asarray(a.data.real), jnp.asarray(a.data.imag), nblk, nb, K)
    band = OzakiBand(chunks_re=cre, chunks_im=cim, ea_re=ere, ea_im=eim,
                     rof=jnp.asarray(rof), sof=jnp.asarray(sof),
                     first=jnp.asarray(first))
    return band, W, nbk, nbkp


def _slice_x_device(x2: jnp.ndarray, nb: int, nbkp: int, K: int):
    """Device bit-slicing of the dense operand: x2 (npad, ncol) f64 ->
    (chunks (nbkp, K, ncol, nb) bf16, exponents (nbkp,) i32).  Transposed
    (ncol, nb) layout keeps the minor dim = nb for Mosaic tiling."""
    ncol = x2.shape[1]
    xb = x2.reshape(nbkp, nb, ncol)
    amax = jnp.max(jnp.abs(xb), axis=(1, 2))
    e = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
    u = xb / jnp.exp2(e)[:, None, None]
    chunks = []
    prev = jnp.zeros_like(u)
    for i in range(K):
        s_i = jnp.round(u * 2.0 ** (8 * (i + 1))) / 2.0 ** (8 * (i + 1))
        chunks.append((s_i - prev).astype(jnp.bfloat16))
        prev = s_i
    ch = jnp.stack(chunks, axis=1)  # (nbkp, K, nb, ncol)
    return ch.swapaxes(2, 3), e.astype(jnp.int32)


def _x_chunk_windows(ch: jnp.ndarray, ex: jnp.ndarray, W: int):
    """(nbkp, K, ncol, nb) -> windows (nbkp, 2W+1, K, ncol, nb) with zero
    padding outside range, plus matching exponent windows (nbkp, 2W+1)."""
    nbkp, K, ncol, nb = ch.shape
    pad = jnp.zeros((W, K, ncol, nb), ch.dtype)
    padded = jnp.concatenate([pad, ch, pad], axis=0)
    win = jnp.stack([padded[s:s + nbkp] for s in range(2 * W + 1)], axis=1)
    epad = jnp.concatenate([jnp.zeros(W, ex.dtype), ex,
                            jnp.zeros(W, ex.dtype)])
    ewin = jnp.stack([epad[s:s + nbkp] for s in range(2 * W + 1)], axis=1)
    return win, ewin


def _ozaki_products(ach, xch, K: int, nb: int, ncol: int):
    """DS (hi, lo) f32 pair of  y^T = sum_{i+j<K} x_j^T A_i^T  (ncol, nb).
    Chunk values carry their own 2^-8i scale, so passes need no reweighting;
    each MXU dot is exact in f32 (see module docstring)."""
    groups = [jnp.zeros((ncol, nb), jnp.float32) for _ in range(K)]
    for i in range(K):
        for j in range(K - i):
            p = jax.lax.dot_general(
                xch[j], ach[i],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (ncol, nb): x^T A^T
            groups[i + j] = groups[i + j] + p
    hi = groups[0]
    lo = jnp.zeros_like(hi)
    for t in range(1, K):
        hi, e = _two_sum(hi, groups[t])
        lo = lo + e
    return hi, lo


def _kernel_ozaki(rof_ref, sof_ref, first_ref, ear_ref, eai_ref, ex_ref,
                  are_ref, aim_ref, x_ref,
                  yah_ref, yal_ref, ybh_ref, ybl_ref,
                  *, K: int, nb: int, ncol: int):
    """Per compact block: DS-accumulate  Ar @ u  and  Ai @ u  (u = the joint
    [xr | xi] column block) into the block row's output tiles; the complex
    recombination happens outside on the f64 results."""
    k = pl.program_id(0)
    ach_re = are_ref[0]  # (K, nb, nb) bf16
    ach_im = aim_ref[0]
    xch = x_ref[0, 0]    # (K, ncol, nb) bf16
    ex = ex_ref[k].astype(jnp.float32)
    ca = jnp.exp2(ear_ref[k].astype(jnp.float32) + ex)  # scale of Ar * u
    cb = jnp.exp2(eai_ref[k].astype(jnp.float32) + ex)  # scale of Ai * u

    pa_h, pa_l = _ozaki_products(ach_re, xch, K, nb, ncol)
    pb_h, pb_l = _ozaki_products(ach_im, xch, K, nb, ncol)

    @pl.when(first_ref[k] == 1)
    def _init():
        yah_ref[0] = jnp.zeros((ncol, nb), jnp.float32)
        yal_ref[0] = jnp.zeros((ncol, nb), jnp.float32)
        ybh_ref[0] = jnp.zeros((ncol, nb), jnp.float32)
        ybl_ref[0] = jnp.zeros((ncol, nb), jnp.float32)

    ah, e1 = _two_sum(yah_ref[0], pa_h * ca)
    yah_ref[0] = ah
    yal_ref[0] = yal_ref[0] + e1 + pa_l * ca
    bh, e2 = _two_sum(ybh_ref[0], pb_h * cb)
    ybh_ref[0] = bh
    ybl_ref[0] = ybl_ref[0] + e2 + pb_l * cb


@partial(jax.jit, static_argnames=("W", "nb", "nbkp"))
def ozaki_spmm_pallas(band: OzakiBand, xre, xim, W: int, nb: int, nbkp: int):
    """y = A x; x (npad, nrhs) f64 pair -> y (npad, nrhs) f64 pair.

    re and im input columns are sliced JOINTLY (one exponent per x block),
    so ncol = 2*nrhs columns ride each MXU pass."""
    assert nb % 128 == 0
    K = band.chunks_re.shape[1]
    nblk = band.chunks_re.shape[0]
    nrhs = xre.shape[1]
    # pad the column count so the bf16 window tile (ncol, nb) is sublane-
    # aligned (bf16 sublane tile = 16)
    ncol = 2 * nrhs
    pad_to = max(16, -(-ncol // 16) * 16)
    x2 = jnp.concatenate(
        [xre, xim] + ([jnp.zeros((xre.shape[0], pad_to - ncol))]
                      if pad_to > ncol else []), axis=1)
    ncol = pad_to
    xch, ex = _slice_x_device(x2, nb, nbkp, K)
    xwin, ewin = _x_chunk_windows(xch, ex, W)  # (nbkp, 2W+1, K, ncol, nb)

    f32 = jnp.float32
    out_shape = tuple(jax.ShapeDtypeStruct((nbkp, ncol, nb), f32)
                      for _ in range(4))
    band_spec = pl.BlockSpec(
        (1, K, nb, nb),
        lambda k, rof, sof, first, ear, eai, ex_: (k, _i32(0), _i32(0), _i32(0)),
        memory_space=pltpu.VMEM)
    win = pl.BlockSpec(
        (1, 1, K, ncol, nb),
        lambda k, rof, sof, first, ear, eai, ex_: (
            rof[k], sof[k], _i32(0), _i32(0), _i32(0)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, ncol, nb),
        lambda k, rof, sof, first, ear, eai, ex_: (rof[k], _i32(0), _i32(0)),
        memory_space=pltpu.VMEM)
    kern = partial(_kernel_ozaki, K=K, nb=nb, ncol=ncol)
    ex_flat = ewin[band.rof, band.sof]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblk,),
        in_specs=[band_spec, band_spec, win],
        out_specs=(out_spec,) * 4,
    )
    yah, yal, ybh, ybl = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(band.rof, band.sof, band.first, band.ea_re, band.ea_im, ex_flat,
      band.chunks_re, band.chunks_im, xwin)
    Aru = yah.astype(jnp.float64) + yal.astype(jnp.float64)  # (nbkp, ncol, nb)
    Aiu = ybh.astype(jnp.float64) + ybl.astype(jnp.float64)
    Ar_xr = Aru[:, :nrhs]
    Ar_xi = Aru[:, nrhs:2 * nrhs]
    Ai_xr = Aiu[:, :nrhs]
    Ai_xi = Aiu[:, nrhs:2 * nrhs]
    yre = (Ar_xr - Ai_xi).swapaxes(1, 2).reshape(-1, nrhs)
    yim_ = (Ar_xi + Ai_xr).swapaxes(1, 2).reshape(-1, nrhs)
    return yre, yim_


def ozaki_spmm_xla(band: OzakiBand, xre, xim, W: int, nb: int, nbkp: int):
    """XLA reference implementation of the same chunk algebra (f64 dots on
    the recombined chunks) — validates packing/windows on any backend."""
    npad = nbkp * nb
    nrhs = xre.shape[1]
    are = (band.chunks_re.astype(jnp.float64).sum(1)
           * jnp.exp2(band.ea_re.astype(jnp.float64))[:, None, None])
    aim = (band.chunks_im.astype(jnp.float64).sum(1)
           * jnp.exp2(band.ea_im.astype(jnp.float64))[:, None, None])
    xr = xre.reshape(nbkp, nb, nrhs)
    xi = xim.reshape(nbkp, nb, nrhs)
    src = jnp.clip(band.rof + band.sof - W, 0, nbkp - 1)
    valid = ((band.rof + band.sof - W >= 0)
             & (band.rof + band.sof - W < nbkp))[:, None, None]
    xsr = jnp.where(valid, xr[src], 0.0)
    xsi = jnp.where(valid, xi[src], 0.0)
    prr = jnp.einsum("kij,kjr->kir", are, xsr)
    pii = jnp.einsum("kij,kjr->kir", aim, xsi)
    pri = jnp.einsum("kij,kjr->kir", are, xsi)
    pir = jnp.einsum("kij,kjr->kir", aim, xsr)
    yr = jnp.zeros((nbkp, nb, nrhs)).at[band.rof].add(prr - pii)
    yi = jnp.zeros((nbkp, nb, nrhs)).at[band.rof].add(pri + pir)
    return yr.reshape(npad, nrhs), yi.reshape(npad, nrhs)


def ozaki_spmm(band: OzakiBand, x: Z, W: int, nb: int, nbkp: int,
               use_pallas: bool | None = None) -> Z:
    """Dispatching f64-accurate block-banded SpMM; x (npad, nrhs) pair."""
    if use_pallas is None:
        use_pallas = HAS_PALLAS and jax.default_backend() != "cpu"
    fn = ozaki_spmm_pallas if use_pallas else ozaki_spmm_xla
    yr, yi = fn(band, x.re, x.im, W, nb, nbkp)
    return Z(yr, yi)
