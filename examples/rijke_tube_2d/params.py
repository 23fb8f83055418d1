"""Rijke tube 2D parameters (reference numerical_examples/Longitudinal/
NetworkCode/RijkeTube2D/params.py).  Mesh generation (gmsh rectangle) is
offline preprocessing; this case consumes the committed XDMF mesh from the
reference tree."""

import numpy as np

MESH = ("/root/reference/numerical_examples/Longitudinal/NetworkCode/"
        "RijkeTube2D/MeshDir/mesh")

r_gas, gamma = 287.0, 1.4
p_amb = 1e5
rho_u, rho_d = 1.22, 0.85
c_u = np.sqrt(gamma * p_amb / rho_u)
c_d = np.sqrt(gamma * p_amb / rho_d)
T_u = c_u**2 / (gamma * r_gas)
T_d = c_d**2 / (gamma * r_gas)

q_0 = -27.008910380099735
u_b = 0.10066660027273297
tau = 0.0015
d_tube = 0.047
n_ftf = 0.1 / (np.pi * d_tube / 4)  # per unit depth in 2D

x_f = np.array([[0.25, 0.0, 0.0]])
x_r = np.array([[0.20, 0.0, 0.0]])
a_f = a_r = 0.025

target = 200 * 2 * np.pi
