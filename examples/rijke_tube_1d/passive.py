"""Rijke tube 1D — passive eigensolve (no flame).

Mirrors numerical_examples/Longitudinal/NetworkCode/RijkeTube1D/passive.py.
Expected eigenvalue (reference Results/Passive/passive.log, 300 elements):
1064.231133.

Run:  python examples/rijke_tube_1d/passive.py
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
from helmholtz_x_tpu.fem.fields import c_step
from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.mesh.xdmf import write_function_xdmf
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.utils.logging import execution_time, start_time

start = start_time()

mesh = one_dimensional_setup(300)
c = c_step(mesh, params.x_f, params.c_u, params.c_u)
matrices = AcousticMatrices(mesh, params.boundary_conditions, c)

target = 200 * 2 * np.pi
E = eps_solver(matrices.A, matrices.C, target, nev=2)
omega, p_passive = normalize_eigenvector(mesh, E, 0)

write_function_xdmf(RESULTS + "/p_passive", mesh, p_passive.values)
execution_time(start)
