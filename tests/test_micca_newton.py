"""MICCA full annulus Newton solver — two-sided solves + eigenvalue-derivative
update on the full nonlinear operator L(omega) = A + omega B + omega^2 C - D.

The reference newtonSolver (eigensolvers.py:278-348) converges only LINEARLY:
its PETSc-VecDot contraction conjugates both inner products, so its
"dlambda/domega" is the conjugate of the true derivative, and its relaxation
decays x0.8 unconditionally — after 29 iterations it stops at
3249.1195+462.6225j (i=0) with the step size relaxation-frozen, ~0.47 away
from the actual root.  Residual check on this framework's operators:

    |lambda_min(L(omega))|  at our adaptive root 3248.96622+462.17423j: 7e-9
                            at the reference's printed value:          5.7e+3

Adaptive mode (default) un-conjugates the derivative and keeps full Newton
steps while |lambda| shrinks — quadratic convergence, 4 iterations to 1e-12.
adaptive=False reproduces the reference's exact update for log parity.
"""

import numpy as np
import pytest

from helmholtz_x_tpu.solvers.newton import newton_solver
from test_micca_full import _build

ROOT_0 = 3248.9662155963742 + 462.1742331322006j
# i=1 (eigenvector-tracked) converges to the SAME root the FPI finds
# (reference FPI log: 3253.754657+472.569066j) — Newton and FPI locating the
# identical eigenvalue is the strongest available cross-solver oracle.
ROOT_1 = 3253.7545921186315 + 472.5688014091249j


@pytest.mark.slow
def test_micca_newton_adaptive_first_mode():
    mesh, matrices, D = _build("direct")
    omega, p = newton_solver(matrices, D, 3260 + 460j, i=0, nev=2, tol=1e-8)
    assert abs(omega - ROOT_0) < 1e-6, omega
    # the reference's relaxation-frozen printout sits within 0.5 of the root
    assert abs(omega - (3249.1195 + 462.6225j)) < 0.5, omega


@pytest.mark.slow
def test_micca_newton_adaptive_second_mode():
    mesh, matrices, D = _build("direct")
    omega, p = newton_solver(matrices, D, 3260 + 460j, i=1, nev=2, tol=1e-8)
    assert abs(omega - ROOT_1) < 1e-6, omega
    # cross-solver oracle: same root as the FPI (and its reference log value)
    ref_fpi = 3253.754657 + 472.569066j
    assert abs(omega - ref_fpi) / abs(ref_fpi) < 1e-6, omega


@pytest.mark.slow
def test_newton_reference_mode_rijke():
    """adaptive=False reproduces the reference's damped update (linear, still
    converging to the FPI root) on the cheap Rijke-tube case."""
    import sys

    sys.path.insert(0, "tests")
    from params_rijke1d import build_case

    mesh, matrices, D = build_case()
    omega, p = newton_solver(matrices, D, 1250 + 10j, i=0, nev=2, tol=1e-3,
                             adaptive=False)
    expected = 1242.185123 + 6.683160j  # FPI/reference root
    assert abs(omega - expected) < 5e-2, omega
