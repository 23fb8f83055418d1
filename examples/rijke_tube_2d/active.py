"""Rijke tube 2D — active eigensolve with the n-tau flame model on the
committed triangle mesh (1,234 cells).

Mirrors the reference script numerical_examples/Longitudinal/NetworkCode/
RijkeTube2D/active.py.  Expected eigenvalue (reference Results/Active/
active.log): 1242.578179+6.668631j.

Run:  python examples/rijke_tube_2d/active.py
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
from helmholtz_x_tpu.fem.fields import gaussian_function, rho_step, temperature_step
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

start = start_time()

mesh = XDMFReader(params.MESH).mesh
boundary_conditions = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}

T = temperature_step(mesh, params.x_f, params.T_u, params.T_d)
matrices = AcousticMatrices(mesh, boundary_conditions, T)

FTF = nTau(params.n_ftf, params.tau)
rho = rho_step(mesh, params.x_f, params.a_f, params.rho_d, params.rho_u)
w = gaussian_function(mesh, params.x_r, params.a_r)
h = gaussian_function(mesh, params.x_f, params.a_f)
D = DistributedFlameMatrix(mesh, w, h, rho, T, params.q_0, params.u_b, FTF)
D.assemble_submatrices()

E = fixed_point_iteration(matrices, D, params.target, nev=2, i=0)
omega, p_active = normalize_eigenvector(mesh, E, 0)
info(f"Eigenvalue-> {omega:.6f} | Eigenfrequency-> {omega / (2 * np.pi):.6f}")

write_function_xdmf(RESULTS + "/p", mesh, p_active.values)
dict_writer(RESULTS + "/eigenvalues", {"direct": omega})
execution_time(start)
