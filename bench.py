"""Benchmark: wall-clock to converged omega on the Rijke-tube active case.

Headline north-star metric (BASELINE.json): wall-clock to a converged
nonlinear eigenvalue.  Baseline: the reference's serial FPI on the same
3000-element case takes 2.78 s (Longitudinal/NetworkCode/RijkeTube1D/
Results/Active/active.log) and refactors inside SLEPc every outer iteration;
this framework factors once and Woodbury-updates the rank-1 flame operator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = baseline_seconds / our_seconds (>1 means faster than reference).
"""

import json
import os
import time

import jax

# Persistent compile cache: the remote-TPU compile path costs minutes per
# kernel cold; cached executables make subsequent runs compile-free.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


BASELINE_S = 2.78  # reference serial wall (active.log)


def build():
    from helmholtz_x_tpu.mesh import one_dimensional_setup
    from helmholtz_x_tpu.fem.fields import (
        gaussian_function,
        rho_step,
        temperature_step,
    )
    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.flame import DistributedFlameMatrix

    r_gas, gamma = 287.0, 1.4
    p_amb, rho_u, rho_d = 1e5, 1.22, 0.85
    c_u = np.sqrt(gamma * p_amb / rho_u)
    c_d = np.sqrt(gamma * p_amb / rho_d)
    T_u = c_u**2 / (gamma * r_gas)
    T_d = c_d**2 / (gamma * r_gas)
    x_f = np.array([[0.25, 0.0, 0.0]])
    x_r = np.array([[0.20, 0.0, 0.0]])
    mesh = one_dimensional_setup(3000)
    T = temperature_step(mesh, x_f, T_u, T_d)
    matrices = AcousticMatrices(mesh, {1: {"Neumann"}, 2: {"Neumann"}}, T)
    FTF = nTau(0.1 / (np.pi * 0.047**2 / 4), 0.0015)
    rho = rho_step(mesh, x_f, 0.025, rho_d, rho_u)
    w = gaussian_function(mesh, x_r, 0.025)
    h = gaussian_function(mesh, x_f, 0.025)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, -27.008910380099735,
                               0.10066660027273297, FTF)
    D.assemble_submatrices()
    return mesh, matrices, D


def run_fpi(matrices, D):
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    target = 200 * 2 * np.pi
    return fixed_point_iteration(matrices, D, target, nev=2, i=0)


def main():
    import contextlib
    import io
    import sys

    import jax

    jax.config.update("jax_enable_x64", True)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    log("building problem")
    mesh, matrices, D = build()
    silent = io.StringIO()
    # warmup run: trigger all compiles (cached on disk for future runs);
    # its convergence prints go to stderr so progress is visible while the
    # driver still sees exactly one JSON line on stdout
    log("warmup FPI (compiles)")
    with contextlib.redirect_stdout(sys.stderr):
        E = run_fpi(matrices, D)
    log("timed FPI")
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(silent):
        E = run_fpi(matrices, D)
    wall = time.perf_counter() - t0
    log(f"done in {wall:.3f}s")

    omega = np.sqrt(E.getEigenvalue(0))
    expected = 1242.185123 + 6.683160j
    rel_err = abs(omega - expected) / abs(expected)
    assert rel_err < 1e-6, f"eigenvalue off: {omega} (rel {rel_err:.2e})"

    print(json.dumps({
        "metric": "rijke1d_active_fpi_wall_clock",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
