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

    # Block-banded kernels (gather-free): the dense-block SpMV used where
    # operators are RCM-banded.  Counts the SAME CSR nnz so the numbers are
    # comparable as "useful nonzeros per second".  Variants:
    #   pallas f32            — MXU kernel, f32 operands
    #   xla f64               — production-accuracy einsum path
    #   pallas ds (f32x2)     — double-single kernel, f64-class accuracy
    # MFU accounting (VERDICT r4 item: report achieved FLOP/s and % of the
    # bounding peak next to nnz/s) — utils/flops.py carries the v5e peaks
    from helmholtz_x_tpu.utils.flops import (HBM_BW_PEAK, MXU_BF16_PEAK,
                                             VPU_F32_PEAK, csr_spmv_flops)

    csr_fl = csr_spmv_flops(nnz)
    csr_bytes = nnz * (16 + 4 + 4) + 4 * n * 16  # data+idx+rows, x/y pairs
    detail["csr_flops_per_s"] = float(f"{csr_fl / dt:.3g}")
    detail["csr_pct_hbm_peak"] = round(100 * csr_bytes / dt / HBM_BW_PEAK, 2)
    peaks = {"mxu_bf16": MXU_BF16_PEAK, "vpu_f32": VPU_F32_PEAK,
             "hbm": HBM_BW_PEAK}
    for item in _bench_band_variants(A, nnz):
        name, dt, acc = item[0], item[1], item[2]
        extra = item[3] if len(item) > 3 else None
        if dt is None:
            detail[f"{name}_error"] = str(acc)[:200]
            continue
        detail[f"{name}_wall_per_spmv_s"] = round(dt, 6)
        detail[f"{name}_nnz_per_s"] = round(nnz / dt, 1)
        if acc is not None:
            detail[f"{name}_rel_err_vs_f64"] = float(f"{acc:.3e}")
        if extra:
            kind = extra["peak"]
            used = extra.get("bytes", extra.get("flops", 0))
            detail[f"{name}_%s" % ("bytes_per_s" if kind == "hbm"
                                   else "flops_per_s")] = \
                float(f"{used / dt:.3g}")
            detail[f"{name}_pct_{kind}_peak"] = round(
                100 * used / dt / peaks[kind], 2)
        if nnz / dt > best and (acc is None or acc < 1e-11):
            best = nnz / dt
            detail["kernel"] = name

    print(json.dumps({
        "metric": "csr_spmv_nnz_per_s",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": None,
        "detail": detail,
    }))


def _bench_band_variants(A, nnz, iters: int = 100):
    """Time the block-banded matvec variants on the RCM-banded form of A.
    Yields (name, seconds_per_matvec_or_None, rel_err_vs_f64_or_None)."""
    import scipy.sparse as sp

    from helmholtz_x_tpu.native import rcm
    from helmholtz_x_tpu.ops.banded import build_band
    from helmholtz_x_tpu.ops.pallas_band import (
        HAS_PALLAS,
        band_ds_compact,
        band_matvec_pallas,
        band_matvec_pallas_ds,
        band_matvec_pallas_ds_sparse,
        band_matvec_xla,
    )

    if jax.default_backend() == "cpu" or not HAS_PALLAS:
        return
    a = sp.csr_matrix(
        (np.asarray(A.data.re) + 1j * np.asarray(A.data.im),
         np.asarray(A.indices), np.asarray(A.indptr)), shape=(A.n, A.n))
    pattern = sp.csr_matrix((np.ones(a.nnz), a.indices, a.indptr), shape=a.shape)
    sym = ((pattern + pattern.T) > 0).astype(np.float64).tocsr()
    perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
    nb = 128  # pallas kernel tiling constraint (nb % 128 == 0)
    band_re, band_im, W, nbk, nbkp, npad = build_band(a, perm, nb)
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(npad) + 1j * rng.standard_normal(npad)
    x64[A.n:] = 0.0
    # ground truth in permuted space (f64 scipy)
    ap = a[perm][:, perm]
    yref = np.zeros(npad, complex)
    yref[:A.n] = ap @ x64[:A.n]
    nref = np.linalg.norm(yref)

    def timed_chain(fn, mat_args, x_args, dtype):
        # mat_args are passed as jit ARGUMENTS (closing over them would bake
        # hundreds of MB of constants into the HLO and blow the remote
        # tunnel's compile-request size limit)
        @jax.jit
        def chain(mat_args, xr, xi):
            def body(carry, _):
                yr, yi = fn(*mat_args, carry[0], carry[1])
                s = (1.0 / jnp.sqrt(jnp.sum(yr * yr + yi * yi))).astype(dtype)
                return (yr * s, yi * s), None

            out, _ = jax.lax.scan(body, (xr, xi), None, length=iters)
            return out

        out = chain(mat_args, *x_args)
        np.asarray(out[0])  # compile + warmup
        t0 = time.perf_counter()
        out = chain(mat_args, *x_args)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / iters

    def accuracy(fn, mat_args, x_args):
        yr, yi = jax.jit(lambda m, xr, xi: fn(*m, xr, xi))(mat_args, *x_args)
        y = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
        return np.linalg.norm(y - yref) / nref

    br64 = jnp.asarray(band_re)
    bi64 = jnp.asarray(band_im)
    xr64 = jnp.asarray(x64.real)
    xi64 = jnp.asarray(x64.imag)

    fn32 = lambda br, bi, xr, xi: band_matvec_pallas(  # noqa: E731
        br, bi, xr, xi, W, nb, nbkp)
    fn64 = lambda br, bi, xr, xi: band_matvec_xla(  # noqa: E731
        br, bi, xr, xi, W, nb, nbkp)
    fnds = lambda br, bi, xr, xi: band_matvec_pallas_ds(  # noqa: E731
        br, bi, xr, xi, W, nb, nbkp)
    parts, rof, sof, first = band_ds_compact(band_re, band_im, nb)
    fnds_sp = lambda p, r, s, f, xr, xi: band_matvec_pallas_ds_sparse(  # noqa: E731
        p, r, s, f, xr, xi, W, nb, nbkp)
    x64args = (xr64, xi64)
    variants = [
        ("pallas_band_f32", fn32,
         (br64.astype(jnp.float32), bi64.astype(jnp.float32)),
         (xr64.astype(jnp.float32), xi64.astype(jnp.float32)), jnp.float32),
        ("xla_band_f64", fn64, (br64, bi64), x64args, jnp.float64),
        ("pallas_band_ds", fnds, (br64, bi64), x64args, jnp.float64),
        ("pallas_band_ds_sparse", fnds_sp, (parts, rof, sof, first),
         x64args, jnp.float64),
    ]
    # flop/byte models per variant (utils/flops.py conventions): band
    # kernels touch every stored slot (8 real flops per complex MADD);
    # the DS kernels spend ~100 f32 VPU flops per slot element; band
    # memory traffic = slots x bytes/elem x 2 (re+im)
    slot_elems = nbkp * (2 * W + 1) * nb * nb
    ds_sparse_elems = int(parts.shape[0]) * nb * nb // 4  # 4 DS parts/block
    extras = {
        "pallas_band_f32": {"peak": "hbm", "bytes": slot_elems * 4 * 2},
        "xla_band_f64": {"peak": "hbm", "bytes": slot_elems * 8 * 2},
        "pallas_band_ds": {"peak": "vpu_f32", "flops": 100 * slot_elems},
        "pallas_band_ds_sparse": {"peak": "vpu_f32",
                                  "flops": 100 * ds_sparse_elems},
    }
    for name, fn, mat_args, x_args, dtype in variants:
        try:
            yield (name, timed_chain(fn, mat_args, x_args, dtype),
                   accuracy(fn, mat_args, x_args), extras.get(name))
        except Exception as e:  # report, keep benching the other variants
            yield (name, None, f"{type(e).__name__}: {e}")

    # Ozaki bf16 bit-slice MXU SpMM (ops/ozaki.py): f64-class accuracy with
    # the flops on the MXU; nrhs = 1 (matvec) and 16 (the block-Krylov /
    # refinement shape).  nnz/s counts CSR nnz * nrhs per pass.
    from helmholtz_x_tpu.ops.ozaki import ozaki_spmm_pallas, pack_ozaki_band

    band = pack_ozaki_band(band_re, band_im, nb)
    rng2 = np.random.default_rng(3)
    for nrhs in (1, 8, 16):
        Xm = rng2.standard_normal((npad, nrhs)) + 1j * rng2.standard_normal((npad, nrhs))
        Xm[A.n:] = 0.0
        yref_m = np.zeros((npad, nrhs), complex)
        yref_m[:A.n] = ap @ Xm[:A.n]
        xr_m = jnp.asarray(Xm.real)
        xi_m = jnp.asarray(Xm.imag)

        @jax.jit
        def chain_m(band, xr, xi):
            def body(carry, _):
                yr, yi = ozaki_spmm_pallas(band, carry[0], carry[1], W, nb, nbkp)
                s = 1.0 / jnp.sqrt(jnp.sum(yr * yr + yi * yi))
                return (yr * s, yi * s), None

            out, _ = jax.lax.scan(body, (xr, xi), None, length=iters)
            return out

        name = f"ozaki_spmm_rhs{nrhs}"
        try:
            out = chain_m(band, xr_m, xi_m)
            np.asarray(out[0])
            t0 = time.perf_counter()
            out = chain_m(band, xr_m, xi_m)
            np.asarray(out[0])
            dt = (time.perf_counter() - t0) / iters
            yr, yi = jax.jit(lambda b, xr, xi: ozaki_spmm_pallas(
                b, xr, xi, W, nb, nbkp))(band, xr_m, xi_m)
            y = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
            acc = np.linalg.norm(y - yref_m) / np.linalg.norm(yref_m)
            # dt covers nrhs simultaneous matvecs
            from helmholtz_x_tpu.utils.flops import ozaki_spmm_flops

            nblk = int(band.chunks_re.shape[0])
            ncol = max(16, -(-2 * nrhs // 16) * 16)  # kernel column padding
            # the reported wall is per-RHS; scale the whole-dispatch flops
            # to per-RHS so flops/s stays consistent
            fl = ozaki_spmm_flops(nblk, band.K, nb, ncol)
            yield (name, dt / nrhs, acc,
                   {"peak": "mxu_bf16", "flops": fl / nrhs})
        except Exception as e:
            yield (name, None, f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
