"""MICCA full-annulus case constants and field builders (reference:
numerical_examples/AnnularCombustor/Micca/fullAnnulus/params.py)."""

import numpy as np
from scipy.io import loadmat

from helmholtz_x_tpu.fem.fields import DGField

CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus"
BLOCH_CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/bloch"

l_cc = 0.2
r_p, d_2 = 0.14, 0.035
r_f = r_p + d_2
theta = np.deg2rad(22.5)
z_r = -0.02
r_gas, gamma = 287.0, 1.4
p_amb, T_amb = 101325.0, 300.0
rho_amb = p_amb / (r_gas * T_amb)
T_a, T_b = 1521.0, 1200.0
q_0, u_b = 2080.0, 0.66
R_outlet = -0.875 - 0.2j
N_sector = 16

boundary_conditions = {11: {"Robin": R_outlet}}


def c(mesh) -> DGField:
    """DG0 axial speed-of-sound profile: plenum at T_amb, quadratic blend in
    the chamber, T_b beyond (reference params.py:52-68)."""
    z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
    T = np.where(z < 0, T_amb,
                 np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
    return DGField(np.sqrt(gamma * r_gas * T), "soundspeed")


def ftf(case=CASE):
    """State-space FTF fitted from the measured flame response (ftf.mat)."""
    from helmholtz_x_tpu.ftf import stateSpace

    mat = loadmat(case + "/ftf.mat")
    return stateSpace(mat["A"], mat["b"], mat["c"], mat["d"])


def measurement_points(n=N_sector):
    return np.array([(r_f * np.cos(i * theta), r_f * np.sin(i * theta), z_r)
                     for i in range(n)])
