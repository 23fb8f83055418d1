"""Falsification experiment for the Bloch-pairing discrepancy (VERDICT r2 #5).

Hypothesis: the ~2% gap between this framework's Bloch eigenvalues (proven
exact against a stitched full annulus) and the reference's committed values
(bloch/Results/{Passive,Active}) is FULLY explained by the reference pairing
master/slave dofs by sorted-index order (reference bloch_operator.py:29-44)
instead of by the rotation map.

This script recomputes the sector eigenvalues with ordering="index" under
candidate dof numberings (raw XDMF vertex ids; first-appearance order over
the cell array; dolfinx's TRUE numbering recovered from the committed result
file's reordered geometry) and prints each against the reference logs:

    passive: 2931.178 / 4633.353 / 11107.674   (Passive/passive.log)
    active:  3235.145363+436.054594j            (Active/active.log)

Run on CPU:  python tools/bloch_pairing_experiment.py
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from scipy.io import loadmat

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.bloch import Blochifier
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.flame import PointwiseFlameMatrix
from helmholtz_x_tpu.ftf import stateSpace
from helmholtz_x_tpu.fem.fields import DGField, q_volumetric
from helmholtz_x_tpu.mesh.xdmf import XDMFReader
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/bloch"
l_cc, r_f, z_r = 0.2, 0.175, -0.02
r_gas, gamma = 287.0, 1.4
p_amb, T_amb = 101325.0, 300.0
rho_amb = p_amb / (r_gas * T_amb)
T_a, T_b = 1521.0, 1200.0
q_0, u_b = 2080.0, 0.66
R_outlet = -0.875 - 0.2j


def axial_sound_speed(mesh):
    z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
    T = np.where(z < 0, T_amb,
                 np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
    return DGField(np.sqrt(gamma * r_gas * T), "soundspeed")


def dolfinx_key(mesh):
    """dolfinx's actual vertex numbering, recovered from the committed result
    file (Results/Active/p_1_dir.h5 stores geometry as dolfinx reordered it;
    exact coordinate match gives the bijection)."""
    import h5py
    from scipy.spatial import cKDTree

    with h5py.File(CASE + "/Results/Active/p_1_dir.h5") as f:
        G = f["Mesh/Grid/geometry"][:]
    d, idx = cKDTree(mesh.points).query(G)
    assert d.max() == 0.0
    key = np.empty(mesh.num_vertices, dtype=np.int64)
    key[idx] = np.arange(len(idx))
    return key


def first_appearance_key(mesh):
    """Emulated dolfinx-style local vertex numbering: vertices numbered by
    first appearance walking the cell connectivity in cell order."""
    n = mesh.num_vertices
    key = np.full(n, -1, dtype=np.int64)
    nxt = 0
    for v in mesh.cells.ravel():
        if key[v] < 0:
            key[v] = nxt
            nxt += 1
    key[key < 0] = np.arange(nxt, n)[: np.sum(key < 0)]
    return key


def run(ordering, dof_key, label):
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed(mesh)

    bcs_p = {t: "Neumann" for t in range(1, 12)}
    bcs_p[12] = "Master"
    bcs_p[13] = "Slave"
    mat_p = AcousticMatrices(mesh, bcs_p, c)
    bloch_p = Blochifier(mesh, bcs_p, 16, mat_p, ordering=ordering, dof_key=dof_key)
    E = eps_solver(bloch_p.A, bloch_p.C, 3000.0, nev=5, mmax=160)
    oms = sorted(np.sqrt(E.eigenvalues[:3]).real)
    print(f"[{label}] passive: {oms[0]:.3f} {oms[1]:.3f} {oms[2]:.3f}  "
          f"(ref 2931.178 4633.353 11107.674)", file=sys.stderr, flush=True)

    bcs_a = {t: "Neumann" for t in range(1, 11)}
    bcs_a[11] = {"Robin": R_outlet}
    bcs_a[12] = "Master"
    bcs_a[13] = "Slave"
    mat_a = AcousticMatrices(mesh, bcs_a, c)
    bloch_a = Blochifier(mesh, bcs_a, 16, mat_a, ordering=ordering, dof_key=dof_key)
    ftf = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(ftf["A"], ftf["b"], ftf["c"], ftf["d"])
    h = q_volumetric(mesh, 1.0, flame_tag=0)
    x_r = np.array([[r_f, 0.0, z_r]])
    D = PointwiseFlameMatrix(mesh, None, x_r, h, rho_amb, q_0, u_b, FTF,
                             bloch_object=bloch_a)
    D.assemble_submatrices("direct")
    D.blochify()
    E = fixed_point_iteration(bloch_a, D, 3200 + 500j, nev=3, i=0, tol=1e-8)
    om, _ = normalize_eigenvector(mesh, E, 0, BlochRemapper=bloch_a.remapper)
    ref = 3235.145363 + 436.054594j
    print(f"[{label}] active: {om:.6f}  (ref {ref})  rel gap "
          f"{abs(om - ref) / abs(ref):.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    import contextlib
    import io

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    mesh0 = XDMFReader(CASE + "/MeshDir/mesh").mesh
    with contextlib.redirect_stdout(io.StringIO()):
        fa_key = first_appearance_key(mesh0)
    variants = {
        "geometric": ("geometric", None),
        "index-raw": ("index", None),
        "index-firstappear": ("index", fa_key),
        "index-dolfinx": ("index", dolfinx_key(mesh0)),
    }
    for label, (ordering, key) in variants.items():
        if which != "all" and which != label:
            continue
        with contextlib.redirect_stdout(io.StringIO()):
            run(ordering, key, label)


# RESULT (recorded): with the true dolfinx numbering ("index-dolfinx") the
# PASSIVE values match the reference log to all printed digits
# (2931.178 / 4633.353 / 11107.674).  The ACTIVE value additionally needs the
# reference's arbitrary containing-cell pick at the vertex-coincident
# measurement point: scanning the 20 cells sharing that vertex, cell 1389
# (this numbering) reproduces 3235.145363+436.054594j to 1.5e-7 — i.e. the
# reference's committed Bloch eigenvalues are FULLY explained by index
# pairing + cell pick.  Permanent gates: tests/test_bloch_pairing.py.
