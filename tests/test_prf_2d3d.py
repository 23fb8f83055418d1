"""PRF nondimensional Rijke tube 2D and 3D — Robin BCs + PEP FPI on the
committed gmsh meshes (cross-dimensional consistency of the PRF family).

Gates (reference Longitudinal/PRF/RijkeTube{2D,3D}/Results/Active/active.log):
    2D: 3.422663+0.002180j        3D: 3.420690+0.002667j
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.fem.fields import (
    Field,
    c_step,
    density_step,
    gaussian_function,
    temperature_step,
)
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.ftf import nTau
from helmholtz_x_tpu.flame import DistributedFlameMatrix
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector

import test_prf1d as prf  # shared nondimensional constants

PRF = "/root/reference/numerical_examples/Longitudinal/PRF"


def _solve(mesh, bcs, n_ftf, axis3d):
    x_f = np.array([[0.0, 0.0, 0.25]]) if axis3d else np.array([[0.25, 0.0, 0.0]])
    x_r = np.array([[0.0, 0.0, 0.20]]) if axis3d else np.array([[0.20, 0.0, 0.0]])
    c = c_step(mesh, x_f, prf.c_u, prf.c_d)
    matrices = AcousticMatrices(mesh, bcs, c)
    FTF = nTau(n_ftf, prf.tau)
    coord = mesh.points[:, 2] if axis3d else mesh.points[:, 0]
    pos = 0.25
    rho = Field(density_step(coord, pos, prf.a_f, prf.rho_d, prf.rho_u), "rho")
    T = temperature_step(mesh, x_f, prf.T_u, prf.T_d)
    w = gaussian_function(mesh, x_r, prf.a_r)
    h = gaussian_function(mesh, x_f, prf.a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, prf.q_0, prf.u_b, FTF,
                               gamma=prf.gamma)
    D.assemble_submatrices()
    E = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0)
    omega, _ = normalize_eigenvector(mesh, E, 0)
    return omega


def test_prf_2d():
    mesh = XDMFReader(PRF + "/RijkeTube2D/MeshDir/mesh").mesh
    n_ftf = 0.014 / (np.pi / 4 * 0.047) / (prf.p_ref * prf.L_ref**2)
    bcs = {4: {"Robin": prf.R_out}, 1: {"Robin": prf.R_in}}
    omega = _solve(mesh, bcs, n_ftf, axis3d=False)
    expected = 3.422663 + 0.002180j
    assert abs(omega - expected) / abs(expected) < 1e-5, omega


@pytest.mark.slow
def test_prf_3d():
    mesh = XDMFReader(PRF + "/RijkeTube3D/MeshDir/mesh").mesh
    # no cross-section scaling in 3D (reference PRF/RijkeTube3D/params.py)
    n_ftf = 0.014 / (prf.p_ref * prf.L_ref**2)
    bcs = {1: {"Neumann"}, 2: {"Robin": prf.R_out}, 3: {"Robin": prf.R_in}}
    omega = _solve(mesh, bcs, n_ftf, axis3d=True)
    expected = 3.420690 + 0.002667j
    assert abs(omega - expected) / abs(expected) < 1e-5, omega
