"""Flame transfer functions — the scalar omega-dependent gain closing the
nonlinearity (reference: helmholtz_x/flame_transfer_function.py:5-41)."""

from __future__ import annotations

import numpy as np


class nTau:
    """Classic n-tau model: FTF(omega) = n * exp(i omega tau)."""

    def __init__(self, n: float, tau: float):
        self.n = n
        self.tau = tau

    def __call__(self, omega: complex) -> complex:
        return self.n * np.exp(1j * omega * self.tau)

    def derivative(self, omega: complex) -> complex:
        return self.n * 1j * self.tau * np.exp(1j * omega * self.tau)


class stateSpace:
    """State-space FTF fitted from experiments:
    FTF(omega) = conj(c (i conj(omega) I - A)^-1 b + d)
    (reference: flame_transfer_function.py:16-41; the conjugation pattern
    matches the reference's MATLAB-fit convention)."""

    def __init__(self, S1, s2, s3, s4):
        self.A = np.asarray(S1)
        self.b = np.asarray(s2)
        self.c = np.asarray(s3)
        self.d = np.asarray(s4)
        self.Id = np.eye(*self.A.shape)

    def _eval(self, omega: complex, k: int) -> complex:
        from math import factorial

        om = np.conj(complex(omega))
        m = np.linalg.matrix_power(1j * om * self.Id - self.A, -(k + 1))
        h = (self.c @ ((-1j) ** k * factorial(k) * m) @ self.b)
        h = np.asarray(h).reshape(-1)[0]
        return h

    def __call__(self, omega: complex) -> complex:
        h = self._eval(omega, 0) + np.asarray(self.d).reshape(-1)[0]
        return complex(np.conj(h))

    def derivative(self, omega: complex) -> complex:
        return complex(np.conj(self._eval(omega, 1)))
