"""PRF nondimensional Rijke tube 3D — direct + adjoint active eigensolve
with Robin boundaries (quadratic/PEP pencil) on the committed tet mesh.

Mirrors the reference script numerical_examples/Longitudinal/PRF/RijkeTube3D/
active.py.  Expected (reference Results/Active/active.log):
direct omega = 3.420690+0.002667j, adjoint conjugate.

Run:  python examples/prf_rijke_tube/3d/active.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np
import params

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.fem.fields import (
    Field,
    c_step,
    density_step,
    gaussian_function,
    temperature_step,
)
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

start = start_time()

mesh = XDMFReader(params.MESH).mesh
c = c_step(mesh, params.x_f, params.c_u, params.c_d)
matrices = AcousticMatrices(mesh, params.boundary_conditions, c)

FTF = nTau(params.n_ftf, params.tau)
rho = Field(density_step(mesh.points[:, 2], params.x_f[0][2], params.a_f,
                         params.rho_d, params.rho_u), "rho")
T = temperature_step(mesh, params.x_f, params.T_u, params.T_d)
w = gaussian_function(mesh, params.x_r, params.a_r)
h = gaussian_function(mesh, params.x_f, params.a_f)

results = {}
for problem_type in ("direct", "adjoint"):
    D = DistributedFlameMatrix(mesh, w, h, rho, T, params.q_0, params.u_b,
                               FTF, gamma=params.gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, params.target, nev=2,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0)
    results[problem_type] = omega
    info(f"{problem_type} eigenvalue-> {omega:.6f}")
    if problem_type == "direct":
        write_function_xdmf(RESULTS + "/p", mesh, p.values)

dict_writer(RESULTS + "/eigenvalues", results)
execution_time(start)
