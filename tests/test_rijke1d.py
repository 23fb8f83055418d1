"""End-to-end gates against the reference's committed results
(reference: numerical_examples/Longitudinal/NetworkCode/RijkeTube1D/Results):

    passive (300 elems):  omega = 1064.231133
    active  (3000 elems): omega = 1242.185123 + 6.683160j
    adjoint:              omega = 1242.185123 - 6.683160j
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh import one_dimensional_setup
from helmholtz_x_tpu.fem.fields import (
    c_step,
    gaussian_function,
    rho_step,
    temperature_step,
)
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector

import params_rijke1d as params


def test_passive():
    mesh = one_dimensional_setup(300)
    bcs = {1: {"Neumann"}, 2: {"Neumann"}}
    c = c_step(mesh, params.x_f, params.c_u, params.c_u)
    matrices = AcousticMatrices(mesh, bcs, c)
    target = 200 * 2 * np.pi
    E = eps_solver(matrices.A, matrices.C, target, nev=2)
    omega, p = normalize_eigenvector(mesh, E, 0)
    assert abs(omega - 1064.231133) / 1064.231133 < 1e-6


@pytest.mark.parametrize("problem_type,expected", [
    ("direct", 1242.185123 + 6.683160j),
    ("adjoint", 1242.185123 - 6.683160j),
])
def test_active(problem_type, expected):
    mesh = one_dimensional_setup(3000)
    bcs = {1: {"Neumann"}, 2: {"Neumann"}}
    T = temperature_step(mesh, params.x_f, params.T_u, params.T_d)
    matrices = AcousticMatrices(mesh, bcs, T)
    FTF = nTau(params.n, params.tau)
    rho = rho_step(mesh, params.x_f, params.a_f, params.rho_d, params.rho_u)
    w = gaussian_function(mesh, params.x_r, params.a_r)
    h = gaussian_function(mesh, params.x_f, params.a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, params.q_0, params.u_b, FTF)
    D.assemble_submatrices(problem_type)

    target = 200 * 2 * np.pi
    E = fixed_point_iteration(matrices, D, target, nev=2, i=0,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0)
    assert abs(omega - expected) / abs(expected) < 1e-6
