"""Probe: distributed halo-layout solve on the MICCA full-annulus operator
(34k dofs) over the 8-virtual-device CPU mesh — feasibility timing for the
3D sharded gate (dryrun/test).  Host-only; no TPU traffic.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    from jax.sharding import Mesh

    from tests_micca_common import axial_sound_speed_dg0

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.parallel.dist import AXIS
    from helmholtz_x_tpu.parallel.fpi import DistShiftedSolver

    CASE = "/root/reference/numerical_examples/AnnularCombustor/Micca/fullAnnulus"
    t0 = time.perf_counter()
    mesh = XDMFReader(CASE + "/MeshDir/mesh").mesh
    c = axial_sound_speed_dg0(mesh, 1.4, 287.0, 300.0, 1521.0, 1200.0, 0.2)
    matrices = AcousticMatrices(mesh, {11: {"Robin": -0.875 - 0.2j}}, c)
    print(f"assembly {time.perf_counter() - t0:.1f}s  n={matrices.A.n}",
          flush=True)

    sigma = complex(3225.120 + 481.0j)
    P = (matrices.A.to_scipy() + sigma * matrices.B.to_scipy()
         + sigma**2 * matrices.C.to_scipy())

    devs = jax.devices()[:8]
    dmesh = Mesh(np.array(devs), (AXIS,))
    t0 = time.perf_counter()
    solver = DistShiftedSolver(P, dmesh, 8)
    print(f"solver setup {time.perf_counter() - t0:.1f}s  layout={solver.layout} "
          f"hw={solver.hw} n_local={solver.n_local}", flush=True)

    rng = np.random.default_rng(0)
    b = rng.standard_normal(P.shape[0]) + 1j * rng.standard_normal(P.shape[0])
    t0 = time.perf_counter()
    x = solver.solve(b)
    wall = time.perf_counter() - t0
    rel = np.linalg.norm(P @ x - b) / np.linalg.norm(b)
    print(f"solve {wall:.1f}s  rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
