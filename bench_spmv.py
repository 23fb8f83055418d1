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

    print(json.dumps({
        "metric": "csr_spmv_nnz_per_s",
        "value": round(nnz / dt, 1),
        "unit": "nnz/s",
        "vs_baseline": None,
        "detail": {"n": n, "nnz": nnz, "wall_per_spmv_s": round(dt, 6),
                   "backend": jax.default_backend(), "kernel": "csr-segment-sum",
                   "note": "timed as one fused scan dispatch"},
    }))


if __name__ == "__main__":
    main()
