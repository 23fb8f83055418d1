"""Debug: why the inverse-iteration polish fails on the RijkeTube1D eps case
(banded tier, TPU).  Prints the raw projection residual, the accuracy of the
factor solve, and the residual after each polish sweep."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import bench
    from helmholtz_x_tpu.solvers.fpi import _flame_factors, _pick_B
    from helmholtz_x_tpu.solvers.linsolve import build_shifted_factor
    from helmholtz_x_tpu.solvers.projection import (
        build_basis, project, fpi_on_projection, true_rel_residual)

    mesh, matrices, D = bench.build_rijke()
    A, C = matrices.A, matrices.C
    target = 200 * 2 * np.pi
    sigma = complex(target) ** 2
    L, R = _flame_factors(D, "direct")
    L = np.asarray(L, np.complex128).reshape(A.n, -1)
    R = np.asarray(R, np.complex128).reshape(A.n, -1)

    factor = build_shifted_factor([(1.0, A), (sigma, C)], A.n)
    print("tier:", type(factor).__name__, "mixed:", getattr(factor, "mixed", "?"),
          "refine:", getattr(factor, "refine", getattr(factor, "nrefine", "?")),
          flush=True)

    # factor solve accuracy
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.n) + 1j * rng.standard_normal(A.n)
    y = np.asarray(factor.solve_P(b))
    Psp = A.to_scipy() + sigma * C.to_scipy()
    print("solve_P rel:", np.linalg.norm(Psp @ y - b) / np.linalg.norm(b),
          flush=True)

    V = build_basis(factor, A, None, C, L, R, sigma, True, 41)
    print("V rows:", V.shape, flush=True)
    proj = project(V, A, None, C, L, R)
    lam, Y, iters, sc = fpi_on_projection(proj, D, target, 2, 0, 1e-8, 50,
                                          "direct", True)
    x = (proj.V.T @ Y[:, :2])[:, 0]
    x /= np.linalg.norm(x)
    lam0 = complex(lam[0])
    rel0 = true_rel_residual(A, None, C, L, R, sc, lam0, x)
    print(f"lam0 {lam0:.8e} sc {sc:.6e} rel0 {rel0:.3e}", flush=True)

    # manual polish
    Csp = C.to_scipy()
    Asp = A.to_scipy()
    k = L.shape[1]
    Wl = np.asarray(factor.solve_P(L)).reshape(A.n, k)
    print("Wl residual:", np.linalg.norm(Psp @ Wl - L) / np.linalg.norm(L),
          flush=True)
    capm = np.linalg.inv(np.eye(k) / sc - R.T @ Wl)
    lam_p = lam0
    for it in range(4):
        bvec = Csp @ x
        y = np.asarray(factor.solve_P(bvec))
        y = y + Wl @ (capm @ (R.T @ y))
        # check M y = b accuracy
        My = Psp @ y - sc * (L @ (R.T @ y))
        print(f"  it{it}: M-solve rel {np.linalg.norm(My - bvec) / np.linalg.norm(bvec):.2e}",
              flush=True)
        x = y / np.linalg.norm(y)
        lr_x = L @ (R.T @ x)
        lam_p = -(np.vdot(x, Asp @ x) - sc * np.vdot(x, lr_x)) / np.vdot(x, Csp @ x)
        rel = true_rel_residual(A, None, C, L, R, sc, lam_p, x)
        print(f"  it{it}: lam {lam_p:.8e} rel {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
