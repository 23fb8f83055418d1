"""MICCA mode sweep — FPI at several spectral targets on the full annulus
(reference: fullAnnulus/active_modes.py; Results/Active/Modes/Parallel*.log).

All six reference targets (Modes/Parallel{1000,2000,5000,9000,10000,11000}.log)
are gated at 1e-6 relative.
"""

import numpy as np
import pytest

from helmholtz_x_tpu.solvers.fpi import fixed_point_iteration
from helmholtz_x_tpu.eigenvectors import normalize_eigenvector
from test_micca_full import _build

TARGETS = {
    1000.0: 928.879250 - 527.878099j,
    2000.0: 1830.046708 - 630.320492j,
    5000.0: 4527.152561 + 4.881680j,
    9000.0: 8258.815935 - 5.191353j,
    10000.0: 10164.920306 - 21.952976j,
    11000.0: 10820.855924 + 346.966028j,
}


@pytest.mark.slow
@pytest.mark.parametrize("target", sorted(TARGETS))
def test_micca_mode(target):
    mesh, matrices, D = _build("direct")
    E = fixed_point_iteration(matrices, D, target, i=0, nev=4, tol=1e-8)
    omega, _ = normalize_eigenvector(mesh, E, 0)
    expected = TARGETS[target]
    assert abs(omega - expected) / abs(expected) < 1e-6, omega
