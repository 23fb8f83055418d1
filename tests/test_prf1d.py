"""PRF nondimensional Rijke tube — exercises Robin BCs, the quadratic (PEP)
pencil via companion linearization, and the adjoint path with B_adj.

Reference gate (numerical_examples/Longitudinal/PRF/RijkeTube1D/Results/
Active/active.log): direct omega = 3.42271328+0.00219526j, adjoint conjugate.
"""

import numpy as np
import pytest

from helmholtz_x_tpu.mesh import one_dimensional_setup
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

# nondimensional parameters (reference: Longitudinal/PRF/RijkeTube1D/params.py)
r_gas, gamma = 287.0, 1.4
p_amb, rho_amb, c_amb = 1e5, 1.22, 339.0
rho_in_dim, rho_out_dim = rho_amb, 0.85
c_in_dim = np.sqrt(gamma * p_amb / rho_in_dim)
c_out_dim = np.sqrt(gamma * p_amb / rho_out_dim)
T_in_dim = p_amb / (r_gas * rho_in_dim)
T_out_dim = p_amb / (r_gas * rho_out_dim)
R_in = -0.975 - 0.05j
R_out = -0.975 - 0.05j
n_ftf = 0.014
q_0, u_b = 200.0, 0.1
d_tube = 0.047
S_c = np.pi * d_tube**2 / 4
n_ftf /= S_c
tau_dim = 0.0015
L_ref, U_ref, p_ref = 1.0, c_amb, p_amb
rho_u = rho_in_dim * U_ref**2 / p_ref
rho_d = rho_out_dim * U_ref**2 / p_ref
c_u, c_d = c_in_dim / U_ref, c_out_dim / U_ref
T_u = T_in_dim * r_gas / U_ref**2
T_d = T_out_dim * r_gas / U_ref**2
n_ftf = n_ftf / (p_ref * L_ref**2)
tau = tau_dim * U_ref / L_ref
x_f = np.array([[0.25, 0.0, 0.0]])
x_r = np.array([[0.20, 0.0, 0.0]])
a_f = a_r = 0.025


@pytest.mark.parametrize("problem_type,expected", [
    ("direct", 3.42271328 + 0.00219526j),
    ("adjoint", 3.42271328 - 0.00219526j),
])
def test_prf_active(problem_type, expected):
    mesh = one_dimensional_setup(300)
    bcs = {1: {"Robin": R_in}, 2: {"Robin": R_out}}
    c = c_step(mesh, x_f, c_u, c_d)
    matrices = AcousticMatrices(mesh, bcs, c)
    assert matrices.B is not None  # Robin BCs -> quadratic pencil

    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 0], x_f[0][0], a_f, rho_d, rho_u), "rho")
    T = temperature_step(mesh, x_f, T_u, T_d)
    w = gaussian_function(mesh, x_r, a_r)
    h = gaussian_function(mesh, x_f, a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF, gamma=gamma)
    D.assemble_submatrices(problem_type)

    E = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0,
                              problem_type=problem_type)
    omega, p = normalize_eigenvector(mesh, E, 0)
    assert abs(omega - expected) / abs(expected) < 1e-6


PRF_CASE = "/root/reference/numerical_examples/Longitudinal/PRF/RijkeTube1D"


@pytest.mark.parametrize("problem_type,mat_file,mat_key,mat_idx", [
    ("direct", "direct_data.mat", "emode_FEW_DA_nonlin", 3),
    ("adjoint", "adjoint_data.mat", "emode_FEW_DA", 4),
])
def test_prf_mode_shape_vs_matlab(problem_type, mat_file, mat_key, mat_idx):
    """EigenVECTOR validation against the reference's committed MATLAB data
    (PRF/RijkeTube1D/data/*.mat; the reference overlays them in the plot at
    active.py:70-94, with the MATLAB modes CONJUGATED — it plots -imag).
    After phase/scale alignment the P1 mode must match the 101-point MATLAB
    mode to 5e-3 relative L2 (measured mismatch 1.1e-3 direct / 1.5e-3
    adjoint — pure discretization difference between the two methods; the
    unconjugated pairing is 20x worse, so this also locks the convention)."""
    from scipy.io import loadmat

    mesh = one_dimensional_setup(300)
    bcs = {1: {"Robin": R_in}, 2: {"Robin": R_out}}
    c = c_step(mesh, x_f, c_u, c_d)
    matrices = AcousticMatrices(mesh, bcs, c)
    FTF = nTau(n_ftf, tau)
    rho = Field(density_step(mesh.points[:, 0], x_f[0][0], a_f, rho_d, rho_u),
                "rho")
    T = temperature_step(mesh, x_f, T_u, T_d)
    w = gaussian_function(mesh, x_r, a_r)
    h = gaussian_function(mesh, x_f, a_f)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, q_0, u_b, FTF, gamma=gamma)
    D.assemble_submatrices(problem_type)
    E = fixed_point_iteration(matrices, D, np.pi, nev=2, i=0,
                              problem_type=problem_type)
    _, p = normalize_eigenvector(mesh, E, 0)
    pv = np.asarray(p.values)

    m = loadmat(f"{PRF_CASE}/data/{mat_file}")[mat_key][0][0]
    xm = m[1].ravel()
    pm = np.conj(m[mat_idx].ravel())
    ours = (np.interp(xm, mesh.points[:, 0], pv.real)
            + 1j * np.interp(xm, mesh.points[:, 0], pv.imag))
    a = np.vdot(pm, ours) / np.vdot(pm, pm)  # lsq phase/scale alignment
    rel = np.linalg.norm(ours - a * pm) / np.linalg.norm(ours)
    assert rel < 5e-3, (problem_type, rel)
    # and the conjugate-swapped pairing must be clearly WORSE (convention)
    a2 = np.vdot(np.conj(pm), ours) / np.vdot(pm, pm)
    rel2 = np.linalg.norm(ours - a2 * np.conj(pm)) / np.linalg.norm(ours)
    assert rel2 > 3 * rel, (problem_type, rel, rel2)
