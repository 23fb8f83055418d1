"""Material / input field builders on P1 nodal values.

Functional equivalents of the reference's parameters_utils
(reference: helmholtz_x/parameters_utils.py:8-246), with identical nodal
semantics: fields are defined by their values at mesh vertices and
interpolated linearly, normalization integrals use the exact P1 quadrature.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mesh.core import Mesh

R_GAS = 287.1  # [J/kg/K] (reference: parameters_utils.py:64)


@dataclass
class Field:
    """A P1 (vertex-valued) scalar field."""

    values: np.ndarray  # (nv,) float64 or complex128
    name: str = ""

    def copy(self, name=None):
        return Field(self.values.copy(), self.name if name is None else name)


def integrate_p1(mesh: Mesh, values: np.ndarray):
    """Exact integral of a P1 field: sum_K |K|/(d+1) * sum_i f_i."""
    vol = mesh.cell_volumes()
    return np.sum(vol / (mesh.dim + 1) * values[mesh.cells].sum(axis=1))


def normalize(mesh: Mesh, f: Field) -> Field:
    """Scale so the field integrates to 1 (reference: dolfinx_utils.py:32-48)."""
    f.values = f.values / integrate_p1(mesh, f.values)
    return f


def gaussian(x: np.ndarray, x_ref, sigma: float, n: int) -> np.ndarray:
    """Normalized isotropic Gaussian evaluated at points x (gdim, npts)
    (reference: parameters_utils.py:8-34)."""
    x_ref = np.asarray(x_ref, dtype=float).ravel()
    spatial = np.zeros(x.shape[1])
    for k in range(n):
        spatial += (x[k] - x_ref[k]) ** 2
    amplitude = 1.0 / (sigma ** n * (2 * np.pi) ** (n / 2))
    return amplitude * np.exp(-spatial / (2 * sigma ** 2))


def gaussian_function(mesh: Mesh, x_r, a_r, degree: int = 1) -> Field:
    vals = gaussian(mesh.points.T, np.asarray(x_r), a_r, mesh.gdim)
    return normalize(mesh, Field(vals, "gaussian"))


def half_gaussian_function(mesh: Mesh, x_flame, a_flame, degree: int = 1) -> Field:
    """Gaussian truncated below z = x_flame[2] (reference: parameters_utils.py:45-60)."""
    h = gaussian_function(mesh, x_flame, a_flame)
    xf = np.asarray(x_flame, dtype=float).ravel()
    h.values = np.where(mesh.points[:, 2] < xf[2], 0.0, h.values)
    return normalize(mesh, h)


def gamma_function(temperature):
    """Variable specific-heat ratio gamma(T) with the reference's cp(T) fit
    (reference: parameters_utils.py:62-78).

    Preserves the representation of the input: a P1 ``Field`` yields a P1
    gamma, a per-cell ``DGField`` yields a per-cell gamma (so downstream
    facet integrals index it with cell ids, not vertex ids)."""
    t = temperature.values if hasattr(temperature, "values") else np.asarray(temperature)
    cp = 973.60091 + 0.1333 * t
    cv = cp - R_GAS
    g = cp / cv
    if isinstance(temperature, Field):
        return Field(g, "gamma")
    if hasattr(temperature, "values"):  # DGField
        return type(temperature)(g, "gamma")
    return g


def sound_speed_variable_gamma(mesh: Mesh, temperature, degree: int = 1):
    g = gamma_function(temperature)
    gv = g.values if hasattr(g, "values") else g
    c = np.sqrt(gv * R_GAS * temperature.values)
    if isinstance(temperature, Field):
        return Field(c, "soundspeed")
    return type(temperature)(c, "soundspeed")


def sound_speed(temperature: Field) -> Field:
    return Field(20.05 * np.sqrt(temperature.values), "soundspeed")


def density_step(x, x_f, sigma, rho_d, rho_u):
    return rho_u + (rho_d - rho_u) / 2 * (1 + np.tanh((x - x_f) / sigma))


def rho_step(mesh: Mesh, x_f, a_f, rho_d, rho_u, degree: int = 1) -> Field:
    """tanh density step across the flame (reference: parameters_utils.py:106-121);
    axis x for 1D/2D, z for 3D."""
    x_f = np.asarray(x_f, dtype=float).reshape(-1)
    axis, pos = (0, x_f[0]) if mesh.gdim in (1, 2) else (2, x_f[2])
    return Field(density_step(mesh.points[:, axis], pos, a_f, rho_d, rho_u), "rho")


def rho_ideal(temperature: Field, p_0: float, r_gas: float) -> Field:
    return Field(p_0 / (r_gas * temperature.values), "rho")


def c_step(mesh: Mesh, x_f, c_u, c_d) -> Field:
    """Sharp nodal speed-of-sound step: c_u where coord < x_f else c_d
    (reference: parameters_utils.py:129-153)."""
    x_f = np.asarray(x_f, dtype=float).reshape(-1)
    axis, pos = (0, x_f[0]) if mesh.gdim in (1, 2) else (2, x_f[2])
    vals = np.where(mesh.points[:, axis] < pos, c_u, c_d).astype(float)
    return Field(vals, "soundspeed")


def c_uniform(mesh: Mesh, sos, degree: int = 1) -> Field:
    return Field(np.full(mesh.num_vertices, float(sos)), "soundspeed")


def temperature(mesh: Mesh, sound_speed_val) -> Field:
    """T = c^2 / (gamma r) with fixed gamma=1.4 (reference: parameters_utils.py:163-175)."""
    c = sound_speed_val.values if isinstance(sound_speed_val, Field) else sound_speed_val
    return Field(np.square(c) / (R_GAS * 1.4), "temperature")


def temperature_uniform(mesh: Mesh, temp) -> Field:
    return Field(np.full(mesh.num_vertices, float(temp)), "temperature")


def temperature_step(mesh: Mesh, x_f, t_u, t_d, degree: int = 1) -> Field:
    x_f = np.asarray(x_f, dtype=float).reshape(-1)
    axis, pos = (0, x_f[0]) if mesh.gdim in (1, 2) else (2, x_f[2])
    vals = np.where(mesh.points[:, axis] < pos, t_u, t_d).astype(float)
    return Field(vals, "temperature")


@dataclass
class DGField:
    """A piecewise-constant (DG0, per-cell) field."""

    values: np.ndarray  # (nc,)
    name: str = ""


def q_volumetric(mesh: Mesh, q_total: float, flame_tag: int = 0) -> DGField:
    """DG0 heat-release indicator normalized so it integrates to Q_total over
    the flame subdomain (reference: parameters_utils.py:210-226)."""
    q = np.zeros(mesh.num_cells)
    cells = mesh.cells_with_tag(flame_tag)
    v_flame = mesh.cell_volumes()[cells].sum()
    q[cells] = q_total / v_flame
    return DGField(q, "q")


def q_multiple(mesh: Mesh, n_sector: int) -> DGField:
    """Per-sector unit-integral DG0 indicators (reference: parameters_utils.py:228-246)."""
    q = np.zeros(mesh.num_cells)
    vols = mesh.cell_volumes()
    for flame in range(n_sector):
        cells = mesh.cells_with_tag(flame)
        q[cells] = 1.0 / vols[cells].sum()
    return DGField(q, "q")


def absolute(mesh: Mesh, f: Field) -> Field:
    a = np.abs(f.values)
    return Field(a / a.max(), f.name)


def phase(f: Field, deg: bool = True) -> Field:
    return Field(np.angle(f.values, deg=deg), "P_angle")
