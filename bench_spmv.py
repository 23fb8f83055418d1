"""Secondary microbenchmark: SpMV nnz/s per chip (BASELINE.json north-star
metric) on the MICCA full-annulus operator — the CSR gather+segment_sum
kernel that drives iterative refinement and distributed GMRES, timed as a
single fused lax.scan dispatch (the dev rig's RPC tunnel makes per-call
timing meaningless).  Prints one JSON line; bench.py remains the headline
benchmark the driver records.
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
    from helmholtz_x_tpu.ops.cplx import Z
    from helmholtz_x_tpu.ops.csr import spmv

    mesh = XDMFReader(
        "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus/"
        "MeshDir/mesh").mesh
    mat = AcousticMatrices(mesh, {}, c_uniform(mesh, 340.0))
    A = mat.A
    nnz = A.nnz
    n = A.n

    rng = np.random.default_rng(0)
    x0 = Z(jnp.asarray(rng.standard_normal(n)), jnp.asarray(rng.standard_normal(n)))

    iters = 100

    @jax.jit
    def chain(Acsr, v):
        def body(carry, _):
            y = spmv(Acsr, carry)
            # keep magnitudes bounded so the chain can't overflow
            s = 1.0 / jnp.sqrt(jnp.sum(y.re**2 + y.im**2))
            return Z(y.re * s, y.im * s), None

        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    out = chain(A, x0)
    np.asarray(out.re)  # compile + warmup
    t0 = time.perf_counter()
    out = chain(A, x0)
    np.asarray(out.re)
    dt = (time.perf_counter() - t0) / iters

    detail = {"n": n, "nnz": nnz, "wall_per_spmv_s": round(dt, 6),
              "backend": jax.default_backend(), "kernel": "csr-segment-sum",
              "note": "timed as one fused scan dispatch"}
    best = nnz / dt

    # Block-banded Pallas kernel (gather-free, f32): the dense-block SpMV
    # used where operators are RCM-banded.  Counts the SAME CSR nnz so the
    # numbers are comparable as "useful nonzeros per second".
    pallas_dt = _bench_pallas_band(A, nnz)
    if pallas_dt is not None:
        detail["pallas_band_wall_per_spmv_s"] = round(pallas_dt, 6)
        detail["pallas_band_nnz_per_s"] = round(nnz / pallas_dt, 1)
        if nnz / pallas_dt > best:
            best = nnz / pallas_dt
            detail["kernel"] = "pallas-block-banded-f32"

    print(json.dumps({
        "metric": "csr_spmv_nnz_per_s",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": None,
        "detail": detail,
    }))


def _bench_pallas_band(A, nnz, iters: int = 100):
    """Time the Pallas block-banded matvec on the RCM-banded form of A.
    Returns seconds per matvec, or None when the kernel is unavailable
    (CPU backend / pallas import failure)."""
    import scipy.sparse as sp

    from helmholtz_x_tpu.native import rcm
    from helmholtz_x_tpu.ops.banded import build_band
    from helmholtz_x_tpu.ops.pallas_band import HAS_PALLAS, band_matvec_pallas

    if jax.default_backend() == "cpu" or not HAS_PALLAS:
        return None
    a = sp.csr_matrix(
        (np.asarray(A.data.re) + 1j * np.asarray(A.data.im),
         np.asarray(A.indices), np.asarray(A.indptr)), shape=(A.n, A.n))
    pattern = sp.csr_matrix((np.ones(a.nnz), a.indices, a.indptr), shape=a.shape)
    sym = ((pattern + pattern.T) > 0).astype(np.float64).tocsr()
    perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
    nb = 128  # pallas kernel tiling constraint (nb % 128 == 0)
    band_re, band_im, W, nbk, nbkp, npad = build_band(a, perm, nb)
    br = jnp.asarray(band_re, jnp.float32)
    bi = jnp.asarray(band_im, jnp.float32)
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal(npad), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(npad), jnp.float32)

    @jax.jit
    def chain(br, bi, xr, xi):
        def body(carry, _):
            cr, ci = carry
            yr, yi = band_matvec_pallas(br, bi, cr, ci, W, nb, nbkp)
            s = (1.0 / jnp.sqrt(jnp.sum(yr * yr + yi * yi))).astype(jnp.float32)
            return (yr * s, yi * s), None

        out, _ = jax.lax.scan(body, (xr, xi), None, length=iters)
        return out

    out = chain(br, bi, xr, xi)
    np.asarray(out[0])  # compile + warmup
    t0 = time.perf_counter()
    out = chain(br, bi, xr, xi)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
