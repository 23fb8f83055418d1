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
    r = pl.program_id(0)
    acc_r = jnp.zeros((nb,), dtype=jnp.float64)
    acc_i = jnp.zeros((nb,), dtype=jnp.float64)
    for s in range(2 * W + 1):
        col = r + s - W
        valid = jnp.logical_and(col >= 0, col < nbkp)
        ccol = jnp.clip(col, 0, nbkp - 1)
        xr = xre_ref[pl.ds(ccol * nb, nb)]
        xi = xim_ref[pl.ds(ccol * nb, nb)]
        xr = jnp.where(valid, xr, 0.0)
        xi = jnp.where(valid, xi, 0.0)
        ar = band_re_ref[0, s]
        ai = band_im_ref[0, s]
        acc_r = acc_r + jnp.dot(ar, xr, preferred_element_type=jnp.float64) \
            - jnp.dot(ai, xi, preferred_element_type=jnp.float64)
        acc_i = acc_i + jnp.dot(ar, xi, preferred_element_type=jnp.float64) \
            + jnp.dot(ai, xr, preferred_element_type=jnp.float64)
    # outputs stay whole in VMEM (TPU tiling forbids (1, nb) blocks);
    # each grid step stores its own row
    yre_ref[pl.ds(r * nb, nb)] = acc_r
    yim_ref[pl.ds(r * nb, nb)] = acc_i


@partial(jax.jit, static_argnames=("W", "nb", "nbkp"))
def band_matvec_pallas(band_re, band_im, xre, xim, W: int, nb: int, nbkp: int):
    """y = A x for block-band storage (nbkp, 2W+1, nb, nb); x flat (nbkp*nb,)."""
    kern = partial(_kernel, W=W, nb=nb, nbkp=nbkp)
    out_shape = (
        jax.ShapeDtypeStruct((nbkp * nb,), jnp.float64),
        jax.ShapeDtypeStruct((nbkp * nb,), jnp.float64),
    )
    yre, yim = pl.pallas_call(
        kern,
        grid=(nbkp,),
        in_specs=[
            pl.BlockSpec((1, 2 * W + 1, nb, nb), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * W + 1, nb, nb), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x whole in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y whole in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
    )(band_re, band_im, xre, xim)
    return yre, yim


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
    """Dispatching banded matvec (Pallas on TPU, XLA elsewhere)."""
    if use_pallas is None:
        use_pallas = HAS_PALLAS and jax.default_backend() not in ("cpu",)
    fn = band_matvec_pallas if use_pallas else band_matvec_xla
    yr, yi = fn(band_re, band_im, x.re, x.im, W, nb, nbkp)
    return Z(yr, yi)
