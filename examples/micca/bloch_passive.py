"""MICCA 1/16 sector — passive eigensolve with Bloch-periodic boundaries.

Mirrors numerical_examples/AnnularCombustor/Micca/bloch/passive.py.  This
framework pairs master/slave dofs GEOMETRICALLY (by the rotation map); the
sector reduction then reproduces the explicit stitched 16-copy annulus
exactly (tests/test_bloch_stitched.py): 2931.751115 / 4641.858568 Hz-rad.
The reference's index-order pairing logs 2931.178 / 4633.353 (bloch/Results/
Passive/passive.log), ~0.02-0.2% away.

Run:  python examples/micca/bloch_passive.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

import params

from helmholtz_x_tpu.acoustics import AcousticMatrices
from helmholtz_x_tpu.bloch import Blochifier
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_function_xdmf
from helmholtz_x_tpu.solvers.arnoldi import eps_solver
from helmholtz_x_tpu.utils.logging import execution_time, start_time

start = start_time()

bcs = {t: "Neumann" for t in range(1, 12)}
bcs[12], bcs[13] = "Master", "Slave"

reader = XDMFReader(params.BLOCH_CASE + "/MeshDir/mesh")
mesh = reader.mesh
reader.getInfo()

matrices = AcousticMatrices(mesh, bcs, params.c(mesh))
bloch = Blochifier(geometry=mesh, boundary_conditions=bcs,
                   N=params.N_sector, passive_matrices=matrices)

E = eps_solver(bloch.A, bloch.C, 3000.0, nev=5, mmax=160)
omega_1, p_1 = normalize_eigenvector(mesh, E, 0, BlochRemapper=bloch.remapper)
omega_2, _ = normalize_eigenvector(mesh, E, 1, BlochRemapper=bloch.remapper)

write_function_xdmf(RESULTS + "/p_bloch_passive", mesh, p_1.values)
execution_time(start)
