"""helmholtz_x_tpu — a TPU-native thermoacoustic Helmholtz eigensolver framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``helmholtz-x`` package (nonlinear thermoacoustic Helmholtz eigenproblem
``A p + omega*B p + omega^2*C p = D(omega) p``), built for TPU:

* complex arithmetic as explicit (re, im) f64 pairs (TPUs have no complex128),
* the flame operator D(omega) kept as low-rank factors and applied via a
  Woodbury correction — never materialized,
* shift-invert Arnoldi with a single on-device factorization per solve,
* dof-row sharding over a ``jax.sharding.Mesh`` for multi-chip execution.

The package enables ``jax_enable_x64`` at import time: the physics requires
1e-8 eigenvalue tolerances at |omega| ~ 1e3, which f32 cannot deliver.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
if _os.environ.get("HELMHOLTZ_X_FORCE_CPU", "") not in ("", "0"):
    # opt-out of the accelerator backend (e.g. examples/run_all.sh sweeps on
    # a machine whose sitecustomize pins an experimental TPU plugin)
    _jax.config.update("jax_platforms", "cpu")
if _os.environ.get("HELMHOLTZ_X_TPU_DEBUG", "") not in ("", "0"):
    # debug mode (SURVEY §5 race-detection/debug plan): raise on the first
    # NaN produced inside any jitted computation instead of propagating it
    # into a silently-wrong eigenvalue
    _jax.config.update("jax_debug_nans", True)

from .acoustics import AcousticMatrices
from .ftf import nTau, stateSpace
from .flame import DistributedFlameMatrix, PointwiseFlameMatrix
from .solvers.fpi import fixed_point_iteration
from .solvers.arnoldi import eps_solver, pep_solver
from .solvers.newton import newton_solver
from .eigenvectors import (
    normalize_eigenvector,
    velocity_eigenvector,
    normalize_adjoint,
)

__all__ = [
    "AcousticMatrices",
    "nTau",
    "stateSpace",
    "DistributedFlameMatrix",
    "PointwiseFlameMatrix",
    "fixed_point_iteration",
    "eps_solver",
    "pep_solver",
    "newton_solver",
    "normalize_eigenvector",
    "velocity_eigenvector",
    "normalize_adjoint",
]

__version__ = "0.1.0"
