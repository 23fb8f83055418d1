"""FlamedDuct — passive eigensolve with choked inlet/outlet boundary
conditions (uniform 1000 K temperature, variable gamma).

Mirrors numerical_examples/Longitudinal/NetworkCode/FlamedDuct/passive.py.
Expected eigenvalue (reference Results/Passive/passive.log):
1644.923520-11.921369j.

Run:  python examples/flamed_duct/passive.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.fem.fields import temperature_uniform
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.arnoldi import pep_solver
from helmholtz_x_tpu.utils.logging import execution_time, start_time

CASE = "/root/reference/numerical_examples/Longitudinal/NetworkCode/FlamedDuct"

start = start_time()

T_passive = 1000.0
M_inlet, M_outlet = 9.2224960671405849e-3, 1.1408306741423997e-2

mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
boundary_conditions = {3: {"ChokedInlet": M_inlet},
                       8: {"ChokedOutlet": M_outlet}}

T = temperature_uniform(mesh, T_passive)
matrices = AcousticMatrices(mesh, boundary_conditions, T)

E = pep_solver(matrices.A, matrices.B, matrices.C, 262 * 2 * np.pi, nev=10)
omega, p = normalize_eigenvector(mesh, E, 0)

write_function_xdmf(RESULTS + "/p_passive", mesh, p.values)
execution_time(start)
