"""MICCA full annulus — mode sweep: FPI at several spectral targets.

Mirrors numerical_examples/AnnularCombustor/Micca/fullAnnulus/active_modes.py
(reference Results/Active/Modes/Parallel*.log: modes at 147.8, 291.3, 720.5,
1314.4, 1617.8, 1722.2 Hz).

Run:  python examples/micca/active_modes.py [-target 5000]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np
import params

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.fem.fields import q_multiple
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

# reference parses `-target <value>` by hand (active_modes.py:41-45)
targets = [1000.0, 2000.0, 5000.0, 9000.0, 10000.0, 11000.0]
if "-target" in sys.argv:
    targets = [float(sys.argv[sys.argv.index("-target") + 1])]

start = start_time()

reader = XDMFReader(params.CASE + "/MeshDir/mesh")
mesh = reader.mesh
reader.getInfo()

matrices = AcousticMatrices(mesh, params.boundary_conditions, params.c(mesh))
h = q_multiple(mesh, params.N_sector)
D = PointwiseFlameMatrix(mesh, None, params.measurement_points(), h,
                         params.rho_amb, params.q_0, params.u_b, params.ftf())
D.assemble_submatrices("direct")

modes = {}
if "-batched" in sys.argv or len(targets) > 1:
    # batched sweep: ONE shared band geometry, vmapped factorizations and
    # block-Krylov bases for all targets (solvers/sweep.py) — the
    # embarrassingly-parallel target dimension the reference spreads over
    # mpirun jobs rides the accelerator's batch axis instead
    from helmholtz_x_tpu.solvers.sweep import sweep_targets

    res = sweep_targets(matrices, D, targets, nev=4, i=0, tol=1e-8)
    for target in targets:
        E = res[complex(target)]
        omega, _ = normalize_eigenvector(mesh, E, 0, print_eigs=False)
        modes[target] = omega
        info(f"target {target:8.1f} rad/s -> omega = {omega:.6f} "
             f"({omega.real / (2 * np.pi):.1f} Hz)")
else:
    for target in targets:
        E = fixed_point_iteration(matrices, D, target, i=0, nev=4, tol=1e-8)
        omega, _ = normalize_eigenvector(mesh, E, 0, print_eigs=False)
        modes[target] = omega
        info(f"target {target:8.1f} rad/s -> omega = {omega:.6f} "
             f"({omega.real / (2 * np.pi):.1f} Hz)")

dict_writer(RESULTS + "/modes", modes)
execution_time(start)
