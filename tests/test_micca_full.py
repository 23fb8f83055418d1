"""MICCA full annulus (163,141 tets, 34,787 dofs) — the headline annular
case: 16 pointwise flames, stateSpace FTF, Robin outlet, sparse solver tier.

Gates (reference AnnularCombustor/Micca/fullAnnulus/Results/Active/FPI):
    direct:  omega_1 = 3253.754657+472.569066j, omega_2 = 3248.702502+452.115564j
    adjoint: conjugates
"""

import numpy as np
import pytest
from scipy.io import loadmat

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import q_multiple
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import stateSpace
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from tests_micca_common import axial_sound_speed_dg0, cyl2cart

CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus"

l_cc = 0.2
r_f = 0.14 + 0.035
theta = np.deg2rad(22.5)
z_r = -0.02
r_gas, gamma = 287.0, 1.4
p_amb, T_amb = 101325.0, 300.0
rho_amb = p_amb / (r_gas * T_amb)
T_a, T_b = 1521.0, 1200.0
q_0, u_b = 2080.0, 0.66
R_outlet = -0.875 - 0.2j
N_sector = 16


def _build(problem_type):
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed_dg0(mesh, gamma, r_gas, T_amb, T_a, T_b, l_cc)
    matrices = AcousticMatrices(mesh, {11: {"Robin": R_outlet}}, c)
    mat = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])
    h = q_multiple(mesh, N_sector)
    x_r = np.array([cyl2cart(r_f, i * theta, z_r) for i in range(N_sector)])
    D = PointwiseFlameMatrix(mesh, None, x_r, h, rho_amb, q_0, u_b, FTF)
    D.assemble_submatrices(problem_type)
    return mesh, matrices, D


@pytest.mark.slow
def test_micca_full_fpi_direct():
    mesh, matrices, D = _build("direct")
    E = fixed_point_iteration(matrices, D, 3225.120 + 481.0j, i=0, nev=4, tol=1e-8)
    om1, _ = normalize_eigenvector(mesh, E, 0)
    om2, _ = normalize_eigenvector(mesh, E, 1)
    e1 = 3253.754657 + 472.569066j
    e2 = 3248.702502 + 452.115564j
    got = sorted([om1, om2], key=lambda z: -z.imag)
    assert abs(got[0] - e1) / abs(e1) < 1e-6, got
    assert abs(got[1] - e2) / abs(e2) < 1e-6, got


@pytest.mark.slow
def test_micca_full_fpi_adjoint():
    mesh, matrices, D = _build("adjoint")
    E = fixed_point_iteration(matrices, D, 3225.120 - 481.0j, i=0, nev=4,
                              tol=1e-8, problem_type="adjoint")
    om1, _ = normalize_eigenvector(mesh, E, 0)
    e1 = 3253.754657 - 472.569066j
    assert abs(om1 - e1) / abs(e1) < 1e-6, om1
