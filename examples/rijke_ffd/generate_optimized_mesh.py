"""RijkeFFD — apply one descent step on the normalized shape derivatives and
write the morphed (optimized) mesh.

Mirrors numerical_examples/ShapeSensitivities/RijkeFFD/generateOptimizedMesh.py
(which reloads the normalized derivative dict written by main_shape.py,
displaces the outer control-point layer by -step*Im(domega), and rebuilds the
gmsh mesh; here mesh morphing is a pure array op and the result is written as
XDMF).

Run:  python examples/rijke_ffd/main_shape.py   (writes results/normalized.txt)
      python examples/rijke_ffd/generate_optimized_mesh.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")

import numpy as np

from helmholtz_x_tpu.mesh.xdmf import XDMFReader, write_mesh_xdmf
from helmholtz_x_tpu.shape import FFDCylindrical, deform_mesh, write_ffd_points
from helmholtz_x_tpu.utils.io import dict_loader
from helmholtz_x_tpu.utils.logging import execution_time, info, start_time

CASE = "/root/reference/numerical_examples/ShapeSensitivities/RijkeFFD"
start = start_time()

mesh = XDMFReader(CASE + "/MeshDir/ShapeDerivatives/mesh").mesh
normalized = dict_loader(RESULTS + "/normalized")

lattice = FFDCylindrical.from_mesh(mesh, 2, 4, 9)
write_ffd_points(lattice, RESULTS + "/FFDinitial")

# descent step on the growth rate (reference generateOptimizedMesh.py:52-57)
step = 0.01
for zeta, row in normalized.items():
    for phi, d in row.items():
        lattice.Pr[lattice.l - 1, int(phi), int(zeta)] -= step * np.imag(d)
write_ffd_points(lattice, RESULTS + "/FFDupdated")

mesh_opt = deform_mesh(mesh, lattice)
write_mesh_xdmf(RESULTS + "/OptimizedMesh/mesh", mesh_opt)
info("Optimized mesh written to results/OptimizedMesh/mesh.xdmf")
execution_time(start)
