"""Probe: MICCA full-annulus FPI on the real TPU (the BASELINE north-star).

Times every phase (assembly, RCM+factor, block basis, projection, FPI,
residual gate) of the direct solve via HELMHOLTZ_X_TPU_METRICS=stderr and
prints the converged eigenvalue against the reference
(3253.754657+472.569066j, fullAnnulus/Results/Active/FPI/active.log;
serial wall 2m05.6s, 8-rank 16.4s).

RUN ALONE — one TPU job at a time through the tunnel.
    python tools/probe_micca_tpu.py [adjoint]
"""

import os
import sys
import time

os.environ.setdefault("HELMHOLTZ_X_TPU_METRICS", "stderr")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_enable_x64", True)

import numpy as np
from scipy.io import loadmat

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    problem_type = sys.argv[1] if len(sys.argv) > 1 else "direct"
    from tests_micca_common import axial_sound_speed_dg0, cyl2cart

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
    from helmholtz_x_tpu.fem.fields import q_multiple
    from helmholtz_x_tpu.flame import PointwiseFlameMatrix
    from helmholtz_x_tpu.ftf import stateSpace
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus"
    t0 = time.perf_counter()
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed_dg0(mesh, 1.4, 287.0, 300.0, 1521.0, 1200.0, 0.2)
    matrices = AcousticMatrices(mesh, {11: {"Robin": -0.875 - 0.2j}}, c)
    mat = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
    h = q_multiple(mesh, 16)
    x_r = np.array([cyl2cart(0.175, i * np.deg2rad(22.5), -0.02)
                    for i in range(16)])
    D = PointwiseFlameMatrix(mesh, None, x_r, h, 101325.0 / (287.0 * 300.0),
                             2080.0, 0.66, FTF)
    D.assemble_submatrices(problem_type)
    print(f"[probe] assembly {time.perf_counter() - t0:.2f}s  backend="
          f"{jax.default_backend()}", file=sys.stderr, flush=True)

    sign = 1 if problem_type == "direct" else -1
    target = 3225.120 + sign * 481.0j
    t1 = time.perf_counter()
    E = fixed_point_iteration(matrices, D, target, i=0, nev=4, tol=1e-8,
                              problem_type=problem_type)
    wall = time.perf_counter() - t1
    om1, _ = normalize_eigenvector(mesh, E, 0)
    om2, _ = normalize_eigenvector(mesh, E, 1)
    e1 = 3253.754657 + sign * 472.569066j
    got = sorted([om1, om2], key=lambda z: -sign * z.imag)
    print(f"[probe] FPI wall {wall:.2f}s  omega1={got[0]:.6f} "
          f"rel={abs(got[0] - e1) / abs(e1):.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
