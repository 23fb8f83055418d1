"""Rijke tube 3D — passive eigensolve on the committed tet mesh.

Mirrors the reference script numerical_examples/Longitudinal/NetworkCode/
RijkeTube3D/passive.py.  Expected eigenvalue (reference Results/Passive/
passive.log): 1064.648163.

Run:  python examples/rijke_tube_3d/passive.py
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
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

start = start_time()

mesh = XDMFReader(params.MESH).mesh
boundary_conditions = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}

# uniform sound speed upstream value (reference passive.py uses c = c_u)
c = c_step(mesh, params.x_f, params.c_u, params.c_u)
matrices = AcousticMatrices(mesh, boundary_conditions, c)

E = eps_solver(matrices.A, matrices.C, params.target, nev=2, print_results=True)
omega, p_passive = normalize_eigenvector(mesh, E, 0)
info(f"Eigenvalue-> {omega:.6f} | Eigenfrequency-> {omega / (2 * np.pi):.6f}")

write_function_xdmf(RESULTS + "/p_passive", mesh, p_passive.values)
dict_writer(RESULTS + "/eigenvalues_passive", {"passive": omega})
execution_time(start)
