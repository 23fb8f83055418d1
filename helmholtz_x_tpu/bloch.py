"""Bloch-periodic reduction of an annular sector (reference:
helmholtz_x/bloch_operator.py:6-123).

A 1/N sector with a Master/Slave boundary pair reduces to a Bloch-periodic
problem: the prolongation BN maps reduced dofs (all non-master dofs) to the
full sector with phase f_b = exp(i b 2 pi / N) on master dofs, and the
restriction NB folds master rows into their slave partners with 1/f_b.

BN/NB have at most two entries per row — they are a permutation + phase, so
the reduced operators are gathers with phase scaling (built host-side with
scipy, setup only) and the low-rank flame factors map through two thin
matvecs (flame.FlameMatrixBase.blochify) instead of the reference's CSR
triple product.

Master/slave dofs are paired GEOMETRICALLY (slave coordinates rotated by the
sector angle about z must coincide with master coordinates) rather than by
index order, which makes the pairing robust to any mesh numbering.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .mesh.core import Mesh, locate_dofs_on_facets
from .ops.csr import CSR, csr_from_scipy
from .utils.logging import info


class Blochifier:
    def __init__(self, geometry, boundary_conditions: dict, N: int,
                 passive_matrices, b: float = 1.0,
                 ordering: str = "geometric", dof_key=None):
        """``ordering`` selects the master/slave pairing rule:

        * ``"geometric"`` (default): each master dof is paired with the slave
          dof that is its rotation image about z — the mathematically correct
          Bloch map, proven exact against a stitched full annulus
          (tests/test_bloch_stitched.py).
        * ``"index"``: master and slave dof arrays are each sorted by dof
          index and paired positionally — reproducing the REFERENCE's pairing
          (reference bloch_operator.py:29-44, locate_dofs_topological returns
          sorted arrays and boundary_map_points pairs them by position).
          On meshes where index order is not the rotation map this produces a
          perturbed reduced operator; kept for the falsification experiment
          quantifying the reference's committed Bloch eigenvalues.
          ``dof_key`` (optional, len n) sorts by an alternative dof
          numbering (e.g. an emulated dolfinx local ordering).
        """
        mesh: Mesh = geometry.mesh if hasattr(geometry, "mesh") else geometry
        self.mesh = mesh
        self.N_sectors = N
        self.b = b
        self.f_b = np.exp(1j * b * 2 * np.pi / N)

        master_tag = next(t for t, v in boundary_conditions.items() if v == "Master")
        slave_tag = next(t for t, v in boundary_conditions.items() if v == "Slave")
        dofs_master = locate_dofs_on_facets(mesh, master_tag)
        dofs_slave = locate_dofs_on_facets(mesh, slave_tag)
        assert len(dofs_master) == len(dofs_slave)

        if ordering == "index":
            key = np.arange(mesh.num_vertices) if dof_key is None else np.asarray(dof_key)
            pairs = np.stack([dofs_master[np.argsort(key[dofs_master], kind="stable")],
                              np.asarray(dofs_slave)[np.argsort(key[dofs_slave], kind="stable")]],
                             axis=1).astype(np.int64)
        elif ordering == "geometric":
            pairs = self._match_pairs(mesh, dofs_master, dofs_slave)
        else:
            raise ValueError(f"unknown ordering {ordering!r}")
        n = mesh.num_vertices
        nb = len(dofs_master)

        keep = np.setdiff1d(np.arange(n), dofs_master)
        col_of = -np.ones(n, dtype=np.int64)  # full dof -> reduced column
        col_of[keep] = np.arange(len(keep))

        # BN: (n, n-nb); identity on kept dofs, f_b on (master, col(slave))
        rows = np.concatenate([keep, pairs[:, 0]])
        cols = np.concatenate([col_of[keep], col_of[pairs[:, 1]]])
        vals = np.concatenate([np.ones(len(keep)), np.full(nb, self.f_b)])
        self.BN_csr = sp.csr_matrix((vals, (rows, cols)), shape=(n, n - nb),
                                    dtype=np.complex128)
        # NB: (n-nb, n); identity on kept dofs, 1/f_b on (col(slave), master)
        rows2 = np.concatenate([col_of[keep], col_of[pairs[:, 1]]])
        cols2 = np.concatenate([keep, pairs[:, 0]])
        vals2 = np.concatenate([np.ones(len(keep)), np.full(nb, 1 / self.f_b)])
        self.NB_csr = sp.csr_matrix((vals2, (rows2, cols2)), shape=(n - nb, n),
                                    dtype=np.complex128)

        self._A = self.blochify(passive_matrices.A)
        self._B = self.blochify(passive_matrices.B) if passive_matrices.B is not None else None
        self._B_adj = None
        if self._B is not None:
            self._B_adj = csr_from_scipy(
                self.NB_csr @ passive_matrices.B_adj.to_scipy() @ self.BN_csr)
        self._C = self.blochify(passive_matrices.C)
        info(f"- Bloch reduction built: {n} -> {n - nb} dofs (N={N}, b={b}).")

    @staticmethod
    def _match_pairs(mesh: Mesh, dofs_master, dofs_slave) -> np.ndarray:
        """Pair each master dof with the slave dof that maps onto it under
        rotation by the sector angle about z.  Tries both rotation signs."""
        xm = mesh.points[dofs_master]
        xs = mesh.points[dofs_slave]

        def cyl(x):
            r = np.hypot(x[:, 0], x[:, 1])
            phi = np.arctan2(x[:, 1], x[:, 0])
            return r, phi, x[:, 2]

        rm, _, zm = cyl(xm)
        rs, _, zs = cyl(xs)
        # rotation about z preserves (r, z); both boundaries are planar cuts
        # so (r, z) identifies each dof uniquely
        key_m = np.stack([rm, zm], axis=1)
        key_s = np.stack([rs, zs], axis=1)
        d2 = ((key_m[:, None, :] - key_s[None, :, :]) ** 2).sum(-1)
        j = np.argmin(d2, axis=1)
        scale = max(np.abs(mesh.points).max(), 1.0)
        if len(np.unique(j)) != len(j) or not np.allclose(
                np.sqrt(d2[np.arange(len(j)), j]), 0, atol=1e-8 * scale):
            raise RuntimeError("master/slave boundaries are not rotation images")
        return np.stack([dofs_master, np.asarray(dofs_slave)[j]], axis=1)

    def blochify(self, matrix: CSR) -> CSR:
        return csr_from_scipy(self.NB_csr @ matrix.to_scipy() @ self.BN_csr)

    @property
    def A(self):
        return self._A

    @property
    def B(self):
        return self._B

    @property
    def B_adj(self):
        return self._B_adj

    @property
    def C(self):
        return self._C

    @property
    def remapper(self):
        return self.BN_csr
