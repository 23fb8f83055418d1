"""2D and 3D Rijke tube cases on the reference's committed XDMF meshes —
exercises the XDMF/HDF5 reader, triangle/tet P1 assembly, and the 3D
z-oriented flame reference direction.

Gates (reference Results logs):
    2D active (1,234 tri):  1242.578179+6.668631j
    3D passive (8,530 tet): 1064.648163
    3D active:              1247.436923+6.827640j
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
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

REF = "/root/reference/numerical_examples/Longitudinal/NetworkCode"

r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
c_u = np.sqrt(gamma * p_amb / rho_u)
c_d = np.sqrt(gamma * p_amb / rho_d)
T_u = c_u**2 / (gamma * r_gas)
T_d = c_d**2 / (gamma * r_gas)
q_0, u_b, tau, d_tube = -27.008910380099735, 0.10066660027273297, 0.0015, 0.047


def _active(mesh, x_f, x_r, n_ftf, target, passive_param="T"):
    bcs = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}
    T = temperature_step(mesh, x_f, T_u, T_d)
    # the 2D script drives the passive matrices with T (variable gamma), the
    # 3D script with c_step (reference RijkeTube3D/active.py:27-30)
    param = T if passive_param == "T" else c_step(mesh, x_f, c_u, c_d)
    matrices = AcousticMatrices(mesh, bcs, param)
    FTF = nTau(n_ftf, tau)
    rho = rho_step(mesh, x_f, 0.025, rho_d, rho_u)
    w = gaussian_function(mesh, x_r, 0.025)
    h = gaussian_function(mesh, x_f, 0.025)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF)
    D.assemble_submatrices()
    E = fixed_point_iteration(matrices, D, target, nev=2, i=0)
    omega, _ = normalize_eigenvector(mesh, E, 0)
    return omega


def test_2d_active():
    mesh = XDMFReader(REF + "/RijkeTube2D/MeshDir/mesh").mesh
    assert mesh.dim == 2 and mesh.num_cells == 1234
    n_ftf = 0.1 / (np.pi * d_tube / 4)
    omega = _active(mesh, np.array([[0.25, 0.0, 0.0]]), np.array([[0.20, 0.0, 0.0]]),
                    n_ftf, 200 * 2 * np.pi)
    expected = 1242.578179 + 6.668631j
    assert abs(omega - expected) / abs(expected) < 1e-6


def test_3d_passive():
    mesh = XDMFReader(REF + "/RijkeTube3D/MeshDir/mesh").mesh
    assert mesh.dim == 3
    bcs = {t: {"Neumann"} for t in np.unique(mesh.facet_tag_values)}
    c = c_step(mesh, np.array([[0.0, 0.0, 0.25]]), c_u, c_u)
    matrices = AcousticMatrices(mesh, bcs, c)
    E = eps_solver(matrices.A, matrices.C, 200 * 2 * np.pi, nev=2)
    omega, _ = normalize_eigenvector(mesh, E, 0)
    assert abs(omega - 1064.648163) / 1064.648163 < 1e-6


def test_3d_active():
    mesh = XDMFReader(REF + "/RijkeTube3D/MeshDir/mesh").mesh
    n_ftf = 0.1  # no cross-section scaling in 3D (true volumetric case)
    omega = _active(mesh, np.array([[0.0, 0.0, 0.25]]), np.array([[0.0, 0.0, 0.20]]),
                    n_ftf, 200 * 2 * np.pi, passive_param="c")
    expected = 1247.436923 + 6.827640j
    assert abs(omega - expected) / abs(expected) < 1e-6
