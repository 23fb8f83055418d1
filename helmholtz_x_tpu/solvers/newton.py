"""Newton iteration on the full nonlinear operator
L(omega) = A + omega B + omega^2 C - D(omega)
(reference: helmholtz_x/eigensolvers.py:278-348).

Each step solves the two-sided eigenproblem L(omega_k) p = lambda C p
targeting lambda = 0 and updates omega with the eigenvalue derivative

    dlambda/domega = <p_adj, dL/domega p> / <p_adj, C p>

using the PETSc VecDot contraction convention of the reference (see
eigenvectors.vec_mat_vec).  The relaxation decay (x0.8 per iteration)
matches the reference.
"""

from __future__ import annotations

import numpy as np

from ..ops.csr import csr_scale
from ..utils.logging import info
from .arnoldi import eps_solver
from .linsolve import build_shifted_factor


def newton_solver(operators, D, init: complex, nev: int = 2, i: int = 0,
                  tol: float = 1e-3, maxiter: int = 100,
                  print_results: bool = False, mmax: int = 48,
                  adaptive: bool = True):
    """Returns (omega, p) like the reference newtonSolver.

    adaptive=True (default) keeps full Newton steps while the target
    eigenvalue |lambda| is shrinking and only damps (x0.8) after an iterate
    that increased it — restoring Newton's quadratic convergence (~6 iters to
    1e-8 on the MICCA case).  adaptive=False reproduces the reference's
    unconditional x0.8-per-iteration decay (eigensolvers.py:336-337), which
    converges only linearly (29 iterations to 1e-2 in the reference logs);
    both find the same root."""
    from ..eigenvectors import normalize_eigenvector, vec_mat_vec

    A, B, C = operators.A, operators.B, operators.C
    mesh = operators.mesh
    Csp = C.to_scipy()
    Bsp = B.to_scipy() if B is not None else None
    negC = csr_scale(C, -1.0)
    L, R = D.factors

    omega = complex(init)
    relaxation = 1.0
    domega = 2 * tol
    k = 0
    prev_eig_mag = np.inf

    digits = int("{:.0e}".format(tol)[-2:])
    s = "{{:+.{}f}}".format(digits)

    info("-> Newton solver started.\n")

    p = None
    while abs(domega) > tol and k < maxiter:
        sc = complex(D.FTF(omega))
        # L(omega) = A + omega B + omega^2 C - D(omega); pencil L p = lam C p,
        # shift target 0 => factor L itself (D via Woodbury).
        terms = [(1.0, A), (omega**2, C)]
        if B is not None:
            terms.insert(1, (omega, B))
        # register=False: successive omega_k factors are never
        # conjugate-reused, and pinning them in the reuse registry holds
        # ~2 GB of device band arrays each across Newton iterations
        factor = build_shifted_factor(terms, C.n, register=False)
        factor.set_lowrank_factors(L, R, two_sided=True)
        factor.set_scale(sc)
        # eps_solver solves A' x = lam (-C_arg) x; pass -C to get L p = lam C p
        # (the reference negates the same way, eigensolvers.py:319)
        E = eps_solver(A, negC, 0.0, nev, two_sided=True, factor=factor,
                       print_results=print_results, mmax=mmax)
        # Mode tracking: after the first iteration, follow the eigenVECTOR
        # (max overlap with the previous iterate) rather than the index-i
        # target-distance ordering — near a doublet the ordering swaps
        # between iterations and index-following ping-pongs between the two
        # branches (the reference has the same instability; its heavy
        # relaxation damping masks it).  Gated on adaptive: adaptive=False
        # reproduces the reference's index-i selection as well as its step
        # update (eigensolvers.py:317-337).
        if adaptive and p is not None and E.nconv > 1:
            overlaps = [abs(np.vdot(p.values, E.getEigenvector(j)))
                        for j in range(E.nconv)]
            j_sel = int(np.argmax(overlaps))
        else:
            j_sel = i
        eig = E.getEigenvalue(j_sel)

        _, p = normalize_eigenvector(mesh, E, j_sel, which="right", print_eigs=False)
        _, p_adj = normalize_eigenvector(mesh, E, j_sel, which="left", print_eigs=False)

        # dL/domega = B + 2 omega C - D'(omega)
        dlp = 2 * omega * (Csp @ p.values)
        if Bsp is not None:
            dlp = dlp + Bsp @ p.values
        dlp = dlp - D.get_derivative(omega).matvec(p.values)

        num = vec_mat_vec(p_adj.values, dlp)
        den = vec_mat_vec(p_adj.values, Csp @ p.values)
        deig = num / den
        if adaptive:
            # the PETSc-VecDot contraction above conjugates BOTH inner
            # products, so num/den = conj(q^H L' p / q^H C p) — the
            # CONJUGATE of the true eigenvalue derivative.  The reference
            # inherits this (eigensolvers.py:332-335), which is exactly why
            # its Newton converges only linearly (29 iterations in the MICCA
            # logs).  Adaptive mode undoes the conjugation and recovers
            # quadratic Newton; adaptive=False keeps reference behavior.
            deig = np.conj(deig)

        domega = -relaxation * eig / deig
        if adaptive:
            if abs(eig) > prev_eig_mag:
                relaxation *= 0.8
            prev_eig_mag = abs(eig)
        else:
            relaxation *= 0.8
        omega = omega + domega

        info("iter = {:2d},  omega = {}  {}j,  |domega| = {:.2e}".format(
            k, s.format(omega.real), s.format(omega.imag), abs(domega)))
        k += 1

    return omega, p
