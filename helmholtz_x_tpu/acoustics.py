"""Passive acoustic operator assembly: A, B, B_adj, C.

TPU-native equivalent of the reference's AcousticMatrices
(reference: helmholtz_x/acoustic_matrices.py:10-138).  The boundary-condition
dictionary follows the same schema:

    {tag: {'Neumann'}}                  - natural (no-op)
    {tag: {'Dirichlet'}}                - p = 0, symmetric row/col elimination
    {tag: {'Robin': R}}                 - impedance Z = (1+R)/(1-R),
                                          B += int (i c / Z) phi phi ds(tag)
    {tag: {'ChokedInlet': M}}           - effective R from Mach number and the
    {tag: {'ChokedOutlet': M}}            surface-averaged gamma
    {tag: 'Master'} / {tag: 'Slave'}    - Bloch pair, handled by Blochifier

Passes either a temperature field (variable gamma(T), c = sqrt(gamma r T)) or
a sound-speed field (gamma = 1.4), dispatched on the field name exactly like
the reference (acoustic_matrices.py:46-55).
"""

from __future__ import annotations

import numpy as np

from .fem.assembly import (
    assemble_boundary_mass,
    assemble_mass,
    assemble_stiffness_csq,
    facet_integral_p1,
)
from .fem.fields import DGField, Field, gamma_function, sound_speed_variable_gamma
from .mesh.core import Mesh, locate_dofs_on_facets
from .ops.csr import CSR, csr_conj_transpose
from .utils.logging import info


class AcousticMatrices:
    def __init__(self, mesh: Mesh, boundary_conditions: dict, parameter: Field,
                 degree: int = 1):
        if degree not in (1, 2):
            raise NotImplementedError(f"unsupported degree {degree}")
        self.mesh = mesh
        self.boundary_conditions = boundary_conditions
        self.degree = degree

        self.dg0 = isinstance(parameter, DGField)
        if parameter.name == "temperature":
            self.T = parameter
            self.c = sound_speed_variable_gamma(mesh, parameter)
            self.gamma = gamma_function(parameter)
            info("/\\ Temperature function is used for passive flame matrices.")
        else:
            self.c = parameter
            ng = mesh.num_cells if self.dg0 else mesh.num_vertices
            self.gamma = Field(np.full(ng, 1.4), "gamma")
            info("\\/ Speed of sound function is used for passive flame matrices.")

        dirichlet_dofs = []
        robin_contribs = []  # (tag, 1j/Z, c_vals)
        for tag, bc in boundary_conditions.items():
            if isinstance(bc, str):  # 'Master' / 'Slave' Bloch markers
                continue
            if "Neumann" in bc:
                info(f"- Neumann boundaries on boundary {tag}")
            if "Dirichlet" in bc:
                dirichlet_dofs.append(locate_dofs_on_facets(mesh, tag))
                info(f"- Dirichlet boundary on boundary {tag}")
            if "Robin" in bc:
                R = bc["Robin"]
                Z = (1 + R) / (1 - R)
                robin_contribs.append((tag, 1j / Z, self.c.values, self.dg0))
                info(f"- Robin boundary on boundary {tag}")
            if "ChokedInlet" in bc:
                mach = bc["ChokedInlet"]
                g = self._surface_avg_gamma(tag)
                q = g * mach / (1 + (g - 1) * mach**2)
                R = (1 - q) / (1 + q)
                Z = (1 + R) / (1 - R)
                robin_contribs.append((tag, 1j / Z, self.c.values, self.dg0))
                info(f"- Choked inlet boundary on boundary {tag}")
            if "ChokedOutlet" in bc:
                mach = bc["ChokedOutlet"]
                g = self._surface_avg_gamma(tag)
                q = 0.5 * (g - 1) * mach
                R = (1 - q) / (1 + q)
                Z = (1 + R) / (1 - R)
                robin_contribs.append((tag, 1j / Z, self.c.values, self.dg0))
                info(f"- Choked outlet boundary on boundary {tag}")

        info("- Passive matrices are assembling..")
        if degree == 1:
            self.space = None
            self.dirichlet_dofs = (
                np.unique(np.concatenate(dirichlet_dofs)) if dirichlet_dofs
                else np.zeros(0, np.int32)
            )
            self._A = assemble_stiffness_csq(mesh, self.c.values, self.dirichlet_dofs,
                                             dg0=self.dg0)
            info("- Matrix A is assembled.")
            self._B = assemble_boundary_mass(mesh, robin_contribs)
            self._C = assemble_mass(mesh, self.dirichlet_dofs)
        else:
            from .fem.p2 import (
                P2Space,
                assemble_boundary_mass_p2,
                assemble_mass_p2,
                assemble_stiffness_csq_p2,
            )

            self.space = P2Space.build(mesh)
            if dirichlet_dofs:
                dd = [self.space.facet_dofs(mesh.facets_with_tag(t)).ravel()
                      for t, bc in boundary_conditions.items()
                      if not isinstance(bc, str) and "Dirichlet" in bc]
                self.dirichlet_dofs = np.unique(np.concatenate(dd))
            else:
                self.dirichlet_dofs = np.zeros(0, np.int32)
            self._A = assemble_stiffness_csq_p2(self.space, self.c.values,
                                                self.dirichlet_dofs)
            info("- Matrix A is assembled.")
            self._B = assemble_boundary_mass_p2(self.space, robin_contribs)
            self._C = assemble_mass_p2(self.space, self.dirichlet_dofs)
        self._B_adj = csr_conj_transpose(self._B) if self._B is not None else None
        if self._B is not None:
            info("- Matrix B is assembled.")
        info("- Matrix C is assembled.\n")

    def _surface_avg_gamma(self, tag: int) -> float:
        """Surface-averaged gamma over ds(tag) (reference:
        acoustic_matrices.py:75-90).  For a DG0 (per-cell) temperature the
        gamma values live on cells, so they must be evaluated on the facet's
        adjacent cell — indexing them with facet vertex ids would silently
        average the wrong entries."""
        if self.dg0:
            from .fem.assembly import facet_adjacent_cells

            facets = self.mesh.facets_with_tag(tag)
            meas = self.mesh.facet_measures(facets)
            gf = self.gamma.values[facet_adjacent_cells(self.mesh, facets)]
            return float(np.sum(meas * gf) / meas.sum())
        area = facet_integral_p1(self.mesh, tag)
        return facet_integral_p1(self.mesh, tag, self.gamma.values) / area

    @property
    def A(self) -> CSR:
        return self._A

    @property
    def B(self) -> CSR | None:
        return self._B

    @property
    def B_adj(self) -> CSR | None:
        return self._B_adj

    @property
    def C(self) -> CSR:
        return self._C
