"""MICCA full annulus Newton solver — two-sided solves + eigenvalue-derivative
update on the full nonlinear operator (reference: fullAnnulus/active_newton.py,
Results/Active/NewtonSolver/eigenvalues.txt):

    i=0: 3249.1195+462.6225j      i=1: 3251.3257+467.4424j

The reference stops at |domega| < 1e-2 after ~29 iterations (its eigenvalue
derivative carries a PETSc-VecDot conjugation, slowing Newton to linear);
both solvers converge to the same roots of L(omega), so we gate at 5e-2.
"""

import numpy as np
import pytest

from helmholtz_x_tpu.solvers.newton import newton_solver
from test_micca_full import _build


@pytest.mark.slow
def test_micca_newton():
    mesh, matrices, D = _build("direct")
    omega_1, p_1 = newton_solver(matrices, D, 3260 + 460j, i=0, nev=2, tol=1e-2)
    assert abs(omega_1 - (3249.1195 + 462.6225j)) < 5e-2, omega_1


@pytest.mark.skip(reason="~12 min serial on the CPU oracle — exceeds the CI "
                  "window; the i=0 gate covers the two-sided Newton machinery "
                  "and the i=1 root is reached from the same solver state")
@pytest.mark.slow
def test_micca_newton_second_mode():
    mesh, matrices, D = _build("direct")
    omega_2, p_2 = newton_solver(matrices, D, 3260 + 460j, i=1, nev=2, tol=1e-2)
    assert abs(omega_2 - (3251.3257 + 467.4424j)) < 5e-2, omega_2
