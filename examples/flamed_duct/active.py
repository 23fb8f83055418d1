"""FlamedDuct — active eigensolve with choked inlet/outlet boundary
conditions and variable gamma(T).

Mirrors the reference script numerical_examples/Longitudinal/NetworkCode/
FlamedDuct/active.py on this framework's API (177,771-tet mesh, 33,855 dofs).
Expected eigenvalue (reference Results/Active/active.log):
1649.695869-43.234201j.

Run:  python examples/flamed_duct/active.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.fem.fields import (
    gaussian_function,
    half_gaussian_function,
    rho_ideal,
    temperature_step,
)
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, start_time

CASE = "/root/reference/numerical_examples/Longitudinal/NetworkCode/FlamedDuct"

start = start_time()

# physics (reference FlamedDuct/params.py)
p_gas, r_gas = 100000.0, 287.1
T_passive, T_flame = 1000.0, 1500.0
x_flame = np.array([[0.0, 0.0, 0.50]])
x_ref = np.array([[0.0, 0.0, 0.35]])
a_flame = a_ref = 0.025
n_ftf, tau = 1.0, 0.2e-3
q_0, u_b = -57015.232012607579, 11.485465769828917
M_inlet, M_outlet = 9.2224960671405849e-3, 1.1408306741423997e-2

mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
boundary_conditions = {3: {"ChokedInlet": M_inlet},
                       8: {"ChokedOutlet": M_outlet}}

T = temperature_step(mesh, x_flame, T_passive, T_flame)
matrices = AcousticMatrices(mesh, boundary_conditions, T)

FTF = nTau(n_ftf, tau)
rho = rho_ideal(T, p_gas, r_gas)
w = gaussian_function(mesh, x_ref, a_ref)
h = half_gaussian_function(mesh, x_flame, a_flame)
D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF)
D.assemble_submatrices()

E = fixed_point_iteration(matrices, D, 250 * 2 * np.pi, nev=2)
omega, p = normalize_eigenvector(mesh, E, 0)

write_function_xdmf(RESULTS + "/p", mesh, p.values)
dict_writer(RESULTS + "/eigenvalues", {"direct": omega})
execution_time(start)
