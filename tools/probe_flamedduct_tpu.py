"""Probe: FlamedDuct active FPI on the real TPU — the second 3D perf point
(reference: Longitudinal/NetworkCode/FlamedDuct/Results/Active/active.log,
omega 1649.695869-43.234201j, serial wall 8 m 18.9 s / 2 m 55 s on 8 ranks).
33,855 dofs, rank-1 flame, choked inlet/outlet -> quadratic pencil; on the
device this exercises the banded tier's RANK-1 split basis path
(_basis_seed_impl + chunked Arnoldi expansion).

RUN ALONE — one TPU job at a time through the tunnel.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import test_flamedduct as fd

    from helmholtz_x_tpu.acoustics import AcousticMatrices
    from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
    from helmholtz_x_tpu.fem.fields import (gaussian_function,
                                            half_gaussian_function, rho_ideal,
                                            temperature_step)
    from helmholtz_x_tpu.flame import DistributedFlameMatrix
    from helmholtz_x_tpu.ftf import nTau
    from helmholtz_x_tpu.mesh.xdmf import XDMFReader
    from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration

    t0 = time.perf_counter()
    mesh = XDMFReader(fd.CASE + "/MeshDir/mesh").mesh
    T = temperature_step(mesh, fd.x_flame, fd.T_passive, fd.T_flame)
    matrices = AcousticMatrices(mesh, fd.BCS, T)
    FTF = nTau(fd.n_ftf, fd.tau)
    rho = rho_ideal(T, fd.p_gas, fd.r_gas)
    w = gaussian_function(mesh, fd.x_ref, fd.a_ref)
    h = half_gaussian_function(mesh, fd.x_flame, fd.a_flame)
    D = DistributedFlameMatrix(mesh, w, h, rho, T, fd.q_0, fd.u_b, FTF)
    D.assemble_submatrices()
    print(f"[probe] assembly {time.perf_counter() - t0:.2f}s n={matrices.A.n} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    t1 = time.perf_counter()
    E = fixed_point_iteration(matrices, D, 250 * 2 * np.pi, nev=2)
    wall = time.perf_counter() - t1
    omega, _ = normalize_eigenvector(mesh, E, 0)
    expected = 1649.695869 - 43.234201j
    rel = abs(omega - expected) / abs(expected)
    print(f"[probe] FPI wall {wall:.2f}s omega={omega:.6f} rel={rel:.2e} "
          f"(reference serial 498.9s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
