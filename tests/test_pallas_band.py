"""Banded matvec: XLA reference vs scipy, and the Pallas kernel in
interpreter mode vs the XLA path (the compiled kernel is exercised on real
TPU hardware by bench_spmv.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

from helmholtz_x_tpu.ops.banded import build_band
from helmholtz_x_tpu.ops.cplx import Z, zarray
from helmholtz_x_tpu.ops.pallas_band import (
    HAS_PALLAS,
    band_matvec_xla,
)


def _setup(n=600, nb=64):
    rng = np.random.default_rng(0)
    A = sp.diags([np.full(n, 4 + 1j)], [0]) + sp.random(n, n, density=0.02,
                                                        random_state=1)
    A = (A + A.T).tocsr().astype(np.complex128)
    perm = np.arange(n)
    band_re, band_im, W, nbk, nbkp, npad = build_band(A, perm, nb)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xp = np.zeros(npad, dtype=complex)
    xp[:n] = x
    return A, band_re, band_im, W, nb, nbkp, x, xp, n


def test_band_matvec_xla_matches_scipy():
    A, band_re, band_im, W, nb, nbkp, x, xp, n = _setup()
    import jax.numpy as jnp

    yr, yi = band_matvec_xla(jnp.asarray(band_re), jnp.asarray(band_im),
                             jnp.asarray(xp.real), jnp.asarray(xp.imag),
                             W, nb, nbkp)
    y = (np.asarray(yr) + 1j * np.asarray(yi))[:n]
    assert np.allclose(y, A @ x, atol=1e-12)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_band_matvec_pallas_interpret():
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from helmholtz_x_tpu.ops import pallas_band as pb

    A, band_re, band_im, W, nb, nbkp, x, xp, n = _setup(n=640, nb=128)
    kern = partial(pb._kernel, W=W, nb=nb, nbkp=nbkp)
    xwr = pb._x_windows(jnp.asarray(xp.real), W, nb, nbkp)
    xwi = pb._x_windows(jnp.asarray(xp.imag), W, nb, nbkp)
    win = pl.BlockSpec((1, 2 * W + 1, nb), lambda r: (r, 0, 0))
    yre, yim = pl.pallas_call(
        kern,
        grid=(nbkp,),
        in_specs=[
            pl.BlockSpec((1, 2 * W + 1, nb, nb), lambda r: (r, 0, 0, 0)),
            pl.BlockSpec((1, 2 * W + 1, nb, nb), lambda r: (r, 0, 0, 0)),
            win,
            win,
        ],
        out_specs=(
            pl.BlockSpec((1, nb // 128, 128), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, nb // 128, 128), lambda r: (r, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbkp, nb // 128, 128), jnp.float64),
            jax.ShapeDtypeStruct((nbkp, nb // 128, 128), jnp.float64),
        ),
        interpret=True,
    )(jnp.asarray(band_re), jnp.asarray(band_im), xwr, xwi)
    y = (np.asarray(yre).reshape(-1) + 1j * np.asarray(yim).reshape(-1))[:n]
    assert np.allclose(y, A @ x, atol=1e-10)
