"""Pallas TPU kernel: block-banded complex matvec.

SpMV on TPU is gather-hostile — VMEM has no hardware gather, so CSR-style
`x[cols]` indexing either bounces through HBM or burns the MXU on one-hot
matmuls.  After the RCM reordering the FEM operators here are banded, and a
block-banded matvec needs NO gather at all:

    y[r] = sum_s  band[r, s] @ x[r + s - W]

The dof vector fits VMEM whole (35k dofs * 8 B = 280 KB), each grid step
streams one block row of the band through VMEM, and the per-slot products are
(nb x nb)(nb) MXU contractions.  This is the SpMV used by the banded solver
tier for residuals/iterative refinement, and the kernel behind the
`bench_spmv.py` nnz/s microbenchmark.

Complex arithmetic is (re, im) pairs like everywhere else in the framework.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Z

try:  # pallas is optional at import time (CPU test environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _kernel(band_re_ref, band_im_ref, xre_ref, xim_ref, yre_ref, yim_ref,
            *, W: int, nb: int, nbkp: int):
    """One block row per grid step.  The x operand arrives as precomputed
    shifted windows xwin (nbkp, 2W+1, nb) — every kernel access is static, so
    Mosaic never has to prove dynamic-offset alignment."""
    dtype = band_re_ref.dtype
    acc_r = jnp.zeros((1, nb), dtype=dtype)
    acc_i = jnp.zeros((1, nb), dtype=dtype)
    for s in range(2 * W + 1):
        # row-vector formulation: (A_s x_s)^T = x_s^T A_s^T — an (1, nb) x
        # (nb, nb) matmul, which Mosaic lowers on the MXU (its matvec
        # reduction path rejects non-constant accumulators)
        xr = xre_ref[0, s].reshape(1, nb)
        xi = xim_ref[0, s].reshape(1, nb)
        art = band_re_ref[0, s].T
        ait = band_im_ref[0, s].T
        acc_r = acc_r + (jnp.dot(xr, art, preferred_element_type=dtype)
                         - jnp.dot(xi, ait, preferred_element_type=dtype))
        acc_i = acc_i + (jnp.dot(xi, art, preferred_element_type=dtype)
                         + jnp.dot(xr, ait, preferred_element_type=dtype))
    yre_ref[0] = acc_r.reshape(nb // 128, 128)
    yim_ref[0] = acc_i.reshape(nb // 128, 128)


def _x_windows(xv, W: int, nb: int, nbkp: int):
    """(nbkp, 2W+1, nb): window s of row r is x block (r + s - W), zero
    outside range.  Pure XLA (pad + strided slices), negligible bytes next to
    the band itself."""
    xb = xv.reshape(nbkp, nb)
    padded = jnp.concatenate(
        [jnp.zeros((W, nb), xv.dtype), xb, jnp.zeros((W, nb), xv.dtype)], axis=0)
    return jnp.stack([padded[s:s + nbkp] for s in range(2 * W + 1)], axis=1)


def _i32(v):
    """Index-map outputs MUST be i32: under jax_enable_x64 literal block
    offsets trace as i64 and Mosaic rejects the index-map function
    ('func.return'(i32, i64, ...)).  This was misdiagnosed round-1 as a
    Mosaic legalization bug — it is an x64-mode interaction."""
    import jax.numpy as _jnp

    return _jnp.int32(v)


@partial(jax.jit, static_argnames=("W", "nb", "nbkp"))
def band_matvec_pallas(band_re, band_im, xre, xim, W: int, nb: int, nbkp: int):
    """y = A x for block-band storage (nbkp, 2W+1, nb, nb); x flat (nbkp*nb,).

    NOTE: Mosaic does not lower f64 inside Pallas kernels on this backend —
    cast operands to f32 (or bf16) before calling; the f64 path runs through
    band_matvec_xla.  A double-single (f32x2) kernel is the planned f64
    Pallas variant.
    """
    assert nb % 128 == 0, "pallas banded matvec needs nb % 128 == 0 (use the XLA path)"
    kern = partial(_kernel, W=W, nb=nb, nbkp=nbkp)
    xwr = _x_windows(xre, W, nb, nbkp)
    xwi = _x_windows(xim, W, nb, nbkp)
    # output laid out (nbkp, nb/128, 128): the un-partitioned trailing dims
    # equal the overall array dims, satisfying the Mosaic tiling rule
    out_shape = (
        jax.ShapeDtypeStruct((nbkp, nb // 128, 128), band_re.dtype),
        jax.ShapeDtypeStruct((nbkp, nb // 128, 128), band_re.dtype),
    )
    win = pl.BlockSpec((1, 2 * W + 1, nb), lambda r: (r, _i32(0), _i32(0)),
                       memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((1, 2 * W + 1, nb, nb),
                             lambda r: (r, _i32(0), _i32(0), _i32(0)),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nb // 128, 128),
                            lambda r: (r, _i32(0), _i32(0)),
                            memory_space=pltpu.VMEM)
    yre, yim = pl.pallas_call(
        kern,
        grid=(nbkp,),
        in_specs=[band_spec, band_spec, win, win],
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
    )(band_re, band_im, xwr, xwi)
    return yre.reshape(-1), yim.reshape(-1)


def band_matvec_xla(band_re, band_im, xre, xim, W: int, nb: int, nbkp: int):
    """XLA reference implementation (einsum over shifted block diagonals) —
    used on CPU and to validate the Pallas kernel."""
    xr = xre.reshape(nbkp, nb)
    xi = xim.reshape(nbkp, nb)
    acc_r = jnp.zeros_like(xr)
    acc_i = jnp.zeros_like(xi)
    for s in range(2 * W + 1):
        off = s - W
        src0 = max(0, -off)
        src1 = nbkp - max(0, off)
        if src1 <= src0:
            continue
        a_r = band_re[src0:src1, s]
        a_i = band_im[src0:src1, s]
        xs_r = xr[src0 + off:src1 + off]
        xs_i = xi[src0 + off:src1 + off]
        pr = jnp.einsum("kij,kj->ki", a_r, xs_r) - jnp.einsum("kij,kj->ki", a_i, xs_i)
        pi = jnp.einsum("kij,kj->ki", a_r, xs_i) + jnp.einsum("kij,kj->ki", a_i, xs_r)
        acc_r = acc_r.at[src0:src1].add(pr)
        acc_i = acc_i.at[src0:src1].add(pi)
    return acc_r.reshape(-1), acc_i.reshape(-1)


def band_matvec(band_re, band_im, x: Z, W: int, nb: int, nbkp: int,
                use_pallas: bool | None = None) -> Z:
    """Dispatching banded matvec.

    The Mosaic legalization failure seen early in round 1 was an x64-mode
    index-map dtype issue (see _i32); with i32 index maps the Pallas kernel
    compiles and matches the XLA path exactly on this backend.  Auto policy:
    Pallas on accelerators when the operands are f32/bf16 and nb is a
    multiple of 128 (the kernel's tiling constraint); the XLA einsum
    formulation otherwise (CPU, or f64 operands — Mosaic has no f64)."""
    if use_pallas is None:
        import jax

        use_pallas = (HAS_PALLAS and jax.default_backend() != "cpu"
                      and band_re.dtype in (jnp.float32, jnp.bfloat16)
                      and nb % 128 == 0)
    fn = band_matvec_pallas if (use_pallas and HAS_PALLAS) else band_matvec_xla
    yr, yi = fn(band_re, band_im, x.re, x.im, W, nb, nbkp)
    return Z(yr, yi)
