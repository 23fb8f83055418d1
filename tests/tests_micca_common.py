"""Shared helpers for the MICCA annular-combustor tests."""

import numpy as np

from helmholtz_x_tpu.fem.fields import DGField


def cyl2cart(rho, phi, zeta):
    return rho * np.cos(phi), rho * np.sin(phi), zeta


def axial_sound_speed_dg0(mesh, gamma, r_gas, T_amb, T_a, T_b, l_cc) -> DGField:
    """DG0 axial speed-of-sound profile (reference Micca params.py c(mesh)):
    plenum (z<0) at T_amb, quadratic blend in the chamber, T_b beyond."""
    z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
    T = np.where(z < 0, T_amb,
                 np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
    return DGField(np.sqrt(gamma * r_gas * T), "soundspeed")
