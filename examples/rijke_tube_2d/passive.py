"""Rijke tube 2D — passive eigensolve on the committed triangle mesh
(1,234 cells), all-Neumann boundaries.

Mirrors the reference script numerical_examples/Longitudinal/NetworkCode/
RijkeTube2D/passive.py (c_step speed of sound with c_d = c_u, EPS solver at
200 Hz, L2-normalized mode written to XDMF).

Run:  python examples/rijke_tube_2d/passive.py
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
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

start = start_time()

mesh = XDMFReader(params.MESH).mesh
boundary_conditions = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}

# reference passive.py:27 uses c_step(mesh, x_f, c_u, c_u) — uniform c_u
c = c_step(mesh, params.x_f, params.c_u, params.c_u)
matrices = AcousticMatrices(mesh, boundary_conditions, c)

E = eps_solver(matrices.A, matrices.C, params.target, nev=2,
               print_results=True)
omega, p = normalize_eigenvector(mesh, E, 0)
info(f"Eigenvalue-> {omega:.6f} | Eigenfrequency-> {omega / (2 * np.pi):.6f}")

write_function_xdmf(RESULTS + "/p_passive", mesh, p.values)
execution_time(start)
