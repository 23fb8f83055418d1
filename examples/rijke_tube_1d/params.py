"""Rijke tube 1D case constants (reference: numerical_examples/Longitudinal/
NetworkCode/RijkeTube1D/params.py)."""

import numpy as np

r_gas, gamma = 287.0, 1.4
p_amb, rho_amb = 1e5, 1.22
rho_u, rho_d = rho_amb, 0.85
c_u = np.sqrt(gamma * p_amb / rho_u)
c_d = np.sqrt(gamma * p_amb / rho_d)
T_u, T_d = c_u**2 / (gamma * r_gas), c_d**2 / (gamma * r_gas)

# flame
n_ftf = 0.1 / (np.pi * 0.047**2 / 4)
q_0 = -27.008910380099735
u_b = 0.10066660027273297
tau = 0.0015
x_f = np.array([[0.25, 0.0, 0.0]])
x_r = np.array([[0.20, 0.0, 0.0]])
a_f = a_r = 0.025

n_elem = 3000
boundary_conditions = {1: {"Neumann"}, 2: {"Neumann"}}
