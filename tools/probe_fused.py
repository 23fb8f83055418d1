"""Characterize the fused-FPI failure envelope on the current backend.

Round-1 shipped two hacks in solvers/fpi.py: an empirical 150k-element basis
budget and a sleep(60) after a remote-worker crash.  This probe reproduces
the failure directly (no fallback wrapping) across a grid of
(basis size mmax, loop bound maxiter) to separate the candidate causes:

  * crashes at large mmax even with maxiter=2  -> program/memory-size limit
  * crashes only at large mmax AND large maxiter -> single-dispatch duration
    (the remote-TPU tunnel kills long-running dispatches)

Run ALONE (one TPU behind the tunnel):  python tools/probe_fused.py
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def ping(deadline_s=180.0):
    """Wait until the device answers a trivial dispatch again."""
    t0 = time.time()
    while True:
        try:
            jax.block_until_ready(jax.numpy.zeros(8) + 1.0)
            return time.time() - t0
        except Exception:
            if time.time() - t0 > deadline_s:
                raise
            time.sleep(5)


def main():
    from bench import build
    from helmholtz_x_tpu.solvers.fpi_fused import ftf_params_device, fused_fpi_run
    from helmholtz_x_tpu.solvers.linsolve import build_shifted_factor

    mesh, matrices, D = build()
    A, C = matrices.A, matrices.C
    n = C.n
    sigma = complex(200 * 2 * np.pi) ** 2
    factor = build_shifted_factor([(1.0, A), (sigma, C)], n)
    L, R = D.factors
    factor.set_lowrank_factors(L, R, False)
    backend = getattr(factor, "backend", "dense")
    mode = "epsb" if backend == "banded" else "eps"
    nrefine = factor.refine if backend == "banded" else factor.nrefine
    sv_base = factor.solve_op()
    W, Rf, G = factor.lowrank_state()
    kind, p = ftf_params_device(D.FTF)
    rng = np.random.default_rng(7)
    v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v0 /= np.linalg.norm(v0)
    log(f"n={n} backend={backend} mode={mode}")

    import ast

    grid = ast.literal_eval(os.environ.get(
        "PROBE_GRID",
        "[(48,50),(99,2),(99,50),(199,2),(199,50)]"))
    results = []
    for mmax, maxiter in grid:
        elems = (mmax + 1) * n
        log(f"--- mmax={mmax} ({elems} elems) maxiter={maxiter}")
        rec = {"mmax": mmax, "elems": elems, "maxiter": maxiter}
        try:
            t0 = time.time()
            out = fused_fpi_run(sv_base, (C,), W, Rf, G, kind, p, sigma, v0,
                                1e-8, mode, nrefine, maxiter, 0, False, True,
                                mmax)
            jax.block_until_ready(out[1].re)
            wall = time.time() - t0
            it = int(out[0])
            om = complex(np.asarray(out[1].re), 0) + 1j * complex(np.asarray(out[1].im))
            rec.update(ok=True, wall=round(wall, 2), iters=it,
                       omega=[om.real, om.imag])
            log(f"ok in {wall:.1f}s, {it} iters, omega={om:.6f}")
        except Exception as e:
            wall = time.time() - t0
            msg = str(e).splitlines()[0][:300]
            rec.update(ok=False, wall=round(wall, 2),
                       error=type(e).__name__, msg=msg)
            log(f"FAILED after {wall:.1f}s: {type(e).__name__}: {msg}")
            try:
                back = ping()
                rec["worker_recovery_s"] = round(back, 1)
                log(f"worker answering again after {back:.1f}s")
            except Exception as e2:
                rec["worker_recovery_s"] = None
                log(f"worker did not recover: {e2}")
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open("docs/fused_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
