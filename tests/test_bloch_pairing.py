"""Falsification experiment (closed): the reference's committed MICCA Bloch
eigenvalues are reproduced EXACTLY by emulating its two implementation
artifacts, proving the ~2% gap to this framework's (stitched-annulus-proven)
values is entirely explained by them:

1. **Sorted-index master/slave pairing** (reference bloch_operator.py:29-44):
   locate_dofs_topological returns sorted dof arrays and boundary_map_points
   pairs them positionally — NOT the rotation map.  The dof numbering is
   dolfinx's internal vertex order, which we recover exactly from the
   committed result file's geometry array (Results/Active/p_1_dir.h5 stores
   the mesh as dolfinx renumbered it; coordinate matching against MeshDir/
   mesh.h5 gives the bijection).

2. **Arbitrary containing-cell choice at the measurement point**: x_r =
   (0.175, 0, -0.02) coincides exactly with a mesh VERTEX shared by 20 cells;
   the P1 gradient there is cell-dependent, and the reference inherits
   whichever cell dolfinx determine_point_ownership returns
   (flame_matrices.py:144-151).  Scanning the 20 candidates, exactly one
   gradient choice (two cells give identical gradients) lands on the
   committed value.

With both emulated:
    passive: 2931.178 / 4633.353 / 11107.674  (ALL printed digits of
             bloch/Results/Passive/passive.log)
    active:  3235.145363+436.054594j to 1.5e-7   (bloch/Results/Active/
             active.log; residual consistent with its tol=1e-3 FPI stop)

The geometric pairing (Blochifier default) remains the correct reduction —
proven exact against a stitched 16-sector full annulus in
test_bloch_stitched.py — so this framework's gate values stand.
"""

import h5py
import numpy as np
import pytest
from scipy.io import loadmat
from scipy.spatial import cKDTree

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
l_cc, T_a, T_b, T_amb = 0.2, 1521.0, 1200.0, 300.0
r_gas, gamma = 287.0, 1.4
rho_amb = 101325.0 / (r_gas * T_amb)
R_outlet = -0.875 - 0.2j
# Containing cell (this mesh's numbering) of x_r whose P1 gradient matches
# the reference's determine_point_ownership pick — found by scanning all 20
# cells sharing the vertex at x_r (tools/bloch_pairing_experiment.py).
REF_POINT_CELL = 1389


def _dolfinx_key(mesh):
    """dolfinx's internal vertex numbering of this mesh, recovered from the
    committed result file's reordered geometry by exact coordinate match."""
    with h5py.File(CASE + "/Results/Active/p_1_dir.h5") as f:
        G = f["Mesh/Grid/geometry"][:]
    d, idx = cKDTree(mesh.points).query(G)
    assert d.max() == 0.0 and len(np.unique(idx)) == len(idx)
    key = np.empty(mesh.num_vertices, dtype=np.int64)
    key[idx] = np.arange(len(idx))
    return key


def _sound_speed(mesh):
    z = mesh.points[mesh.cells].mean(axis=1)[:, 2]
    T = np.where(z < 0, T_amb,
                 np.where(z < l_cc, (T_b - T_a) * (z / l_cc) ** 2 + T_a, T_b))
    return DGField(np.sqrt(gamma * r_gas * T), "soundspeed")


@pytest.mark.slow
def test_reference_passive_values_reproduced_by_index_pairing():
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    bcs = {t: "Neumann" for t in range(1, 12)}
    bcs[12] = "Master"
    bcs[13] = "Slave"
    mat = AcousticMatrices(mesh, bcs, _sound_speed(mesh))
    bloch = Blochifier(mesh, bcs, 16, mat, ordering="index",
                       dof_key=_dolfinx_key(mesh))
    E = eps_solver(bloch.A, bloch.C, 3000.0, nev=5, mmax=160)
    got = sorted(np.sqrt(E.eigenvalues[:3]).real)
    # every digit the reference prints (passive.log)
    for g, ref in zip(got, [2931.178, 4633.353, 11107.674]):
        assert abs(g - ref) < 1.5e-3, (g, ref)


@pytest.mark.slow
def test_reference_active_value_reproduced_by_index_pairing_and_cell_pick():
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    bcs = {t: "Neumann" for t in range(1, 11)}
    bcs[11] = {"Robin": R_outlet}
    bcs[12] = "Master"
    bcs[13] = "Slave"
    mat = AcousticMatrices(mesh, bcs, _sound_speed(mesh))
    bloch = Blochifier(mesh, bcs, 16, mat, ordering="index",
                       dof_key=_dolfinx_key(mesh))

    ftf = loadmat(CASE + "/ftf.mat")
    FTF = stateSpace(ftf["A"], ftf["b"], ftf["c"], ftf["d"])
    h = q_volumetric(mesh, 1.0, flame_tag=0)
    x_r = np.array([[0.175, 0.0, -0.02]])
    D = PointwiseFlameMatrix(mesh, None, x_r, h, rho_amb, 2080.0, 0.66, FTF,
                             bloch_object=bloch, point_cells=[REF_POINT_CELL])
    D.assemble_submatrices("direct")
    D.blochify()

    E = fixed_point_iteration(bloch, D, 3200 + 500j, nev=3, i=0, tol=1e-8)
    omega, _ = normalize_eigenvector(mesh, E, 0, BlochRemapper=bloch.remapper)
    ref = 3235.145363 + 436.054594j
    # 1.5e-7 residual = the reference's own tol=1e-3 FPI stop; this is an
    # exact reproduction of its committed value.
    assert abs(omega - ref) / abs(ref) < 5e-7, omega


def test_vertex_coincident_measurement_point():
    """The structural fact behind artifact 2: x_r is exactly a mesh vertex."""
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    d = np.linalg.norm(mesh.points - np.array([0.175, 0.0, -0.02]), axis=1)
    assert d.min() < 1e-12
