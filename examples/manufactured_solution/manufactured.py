"""Manufactured solution — impedance sweep on a 2D rectangle, validated
against the analytic dispersion relation.

Mirrors the reference script numerical_examples/manufacturedSolution/
manufacturedHelmholtz.py (there validated against MATLAB fsolve roots; here
the same dispersion relation is solved directly by complex Newton).

Run:  python examples/manufactured_solution/manufactured.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import numpy as np

from helmholtz_x_tpu.mesh import rectangle_setup
from helmholtz_x_tpu.fem.fields import c_uniform
from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.solvers.arnoldi import pep_solver
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.utils.io import dict_writer
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

L, H, C0 = 0.4, 0.1, 450.0


def dispersion_root(Z, omega0, m=1):
    om = complex(omega0)
    kx = m * np.pi / L

    def f(om):
        beta = np.sqrt((om / C0) ** 2 - kx**2 + 0j)
        return -beta * np.sin(beta * H) * C0 * Z - 1j * om * np.cos(beta * H)

    for _ in range(100):
        h = 1e-6 * max(1.0, abs(om))
        df = (f(om + h) - f(om - h)) / (2 * h)
        step = f(om) / df
        om -= step
        if abs(step) < 1e-10 * abs(om):
            break
    return om


start = start_time()
results = {}
for Z in (4.0 + 0j, -6.0 + 0j, 5j, 2 + 3j):
    mesh = rectangle_setup(160, 40, L, H)
    c = c_uniform(mesh, C0)
    matrices = AcousticMatrices(mesh, {4: {"Robin": (Z - 1) / (Z + 1)}}, c)
    E = pep_solver(matrices.A, matrices.B, matrices.C, 600 * 2 * np.pi, nev=2)
    omega, _ = normalize_eigenvector(mesh, E, 0, print_eigs=False)
    om_ref = dispersion_root(Z, 600 * 2 * np.pi)
    info(f"Z = {Z}:  FEM omega = {omega:.4f},  analytic = {om_ref:.4f},  "
         f"rel err = {abs(omega - om_ref) / abs(om_ref):.2e}")
    results[str(Z)] = omega

dict_writer(RESULTS + "/eigenvalues", results)
execution_time(start)
