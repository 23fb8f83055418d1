"""RijkeFFD shape-sensitivity case meshes (original + FFD-optimized
cylinder), P1 path — exercises Robin-both-ends PEP FPI on gmsh-generated 3D
meshes and validates the optimized-mesh eigenvalue shift that the FFD
pipeline is meant to produce.

Gates (reference ShapeSensitivities/RijkeFFD/Results):
    Original/eigenvalues.txt:  direct 1156.7908405+0.8669193j, adjoint conj
    Optimized/eigenvalue.txt:  direct 1270.2836303-2.2301313j
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import (
    Field,
    density_step,
    gaussian_function,
    temperature_step,
)
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"

r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
T_in = p_amb / (r_gas * rho_u)
T_out = p_amb / (r_gas * rho_d)
R_in = R_out = -0.975 - 0.05j
q_0, u_b, n_ftf, tau = 200.0, 0.1, 0.014, 0.0015
x_f = np.array([[0.0, 0.0, 0.25]])
x_r = np.array([[0.0, 0.0, 0.20]])
a_f = a_r = 0.025


def _solve(mesh_path, problem_type="direct"):
    mesh = XDMFReader(mesh_path).mesh
    bcs = {1: {"Neumann"}, 2: {"Robin": R_out}, 3: {"Robin": R_in}}
    T = temperature_step(mesh, x_f, T_in, T_out)
    matrices = AcousticMatrices(mesh, bcs, T)
    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 2], x_f[0][2], a_f, rho_d, rho_u), "rho")
    w = gaussian_function(mesh, x_r, a_r)
    h = gaussian_function(mesh, x_f, a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF, gamma=gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, 180 * 2 * np.pi, nev=2, i=0,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0)
    return omega


# Im-sign convention: BASELINE.md prints the ShapeDerivatives LOG's
# -0.866919j, but the committed machine-readable result
# (Results/Original/eigenvalues.txt, loaded verbatim below) stores the
# DIRECT eigenvalue as +0.8669193j with the adjoint as its conjugate — the
# log line is the adjoint's.  We gate on the committed txt values.
@pytest.mark.slow
@pytest.mark.parametrize("problem_type,expected", [
    ("direct", 1156.7908405380945 + 0.8669193409110441j),
    ("adjoint", 1156.7908405385717 - 0.8669193408994331j),
])
def test_rijkeffd_original(problem_type, expected):
    omega = _solve(CASE + "/MeshDir/Original/mesh", problem_type)
    assert abs(omega - expected) / abs(expected) < 1e-6, omega


@pytest.mark.slow
def test_rijkeffd_optimized():
    omega = _solve(CASE + "/MeshDir/Optimized/mesh")
    expected = 1270.2836302695284 - 2.2301313471620294j
    assert abs(omega - expected) / abs(expected) < 1e-6, omega
