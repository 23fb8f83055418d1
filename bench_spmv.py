"""Secondary microbenchmark: banded SpMV nnz/s per chip (BASELINE.json
north-star metric).  Runs the Pallas block-banded matvec kernel on the MICCA
full-annulus operator pattern.  Prints one JSON line; bench.py remains the
headline benchmark the driver records.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.fem.fields import c_uniform
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.native import rcm
    from helmholtz_x_tpu.ops.banded import build_band
    from helmholtz_x_tpu.ops.pallas_band import band_matvec_pallas, band_matvec_xla

    mesh = XDMFReader(
        "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus/"
        "MeshDir/mesh").mesh
    mat = AcousticMatrices(mesh, {}, c_uniform(mesh, 340.0))
    A = mat.A.to_scipy() + 1j * mat.C.to_scipy()
    nnz = A.nnz
    n = A.shape[0]
    import scipy.sparse as sp

    pattern = sp.csr_matrix((np.ones(A.nnz), A.indices, A.indptr), shape=A.shape)
    sym = ((pattern + pattern.T) > 0).astype(float).tocsr()
    perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
    band_re, band_im, W, nbk, nbkp, npad = build_band(A, perm, nb=128)

    rng = np.random.default_rng(0)
    xp = np.zeros(npad)
    xp[:n] = rng.standard_normal(n)
    xi = np.zeros(npad)

    # the Pallas variant is blocked on a Mosaic legalization bug on this
    # backend (see ops/pallas_band.band_matvec); measure the XLA device kernel
    use_pallas = False
    fn = band_matvec_pallas if use_pallas else band_matvec_xla
    dt = jnp.float32 if use_pallas else jnp.float64
    args = (jnp.asarray(band_re, dt), jnp.asarray(band_im, dt),
            jnp.asarray(xp, dt), jnp.asarray(xi, dt), W, 128, nbkp)
    yr, yi = fn(*args)  # compile + warmup
    np.asarray(yr)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        yr, yi = fn(args[0], args[1], yr, yi, W, 128, nbkp)
    np.asarray(yr)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "banded_spmv_nnz_per_s",
        "value": round(nnz / dt, 1),
        "unit": "nnz/s",
        "vs_baseline": None,
        "detail": {"n": n, "nnz": nnz, "W": W, "nb": 128, "wall_per_spmv_s": round(dt, 6),
                   "backend": jax.default_backend(),
                   "kernel": "pallas" if use_pallas else "xla-banded"},
    }))


if __name__ == "__main__":
    main()
