"""Fixed-point iteration on the nonlinear eigenvalue problem.

Reproduces the reference's outer loop exactly — Aitken-accelerated relaxation
alpha_k = 1/(1 - (f_k - f_{k-1})/(omega_k - omega_{k-1})), convergence on
|omega_{k+1} - omega_k| (reference: helmholtz_x/eigensolvers.py:122-276) —
but with a structurally faster inner solve: the shift sigma is fixed for the
whole iteration and D(omega_k) is rank-k, so the passive operator
P = A (+ sigma B) + sigma^(1|2) C is factored ONCE and every outer iteration
only refreshes the k x k Woodbury capacitance.  The reference re-runs a full
SLEPc factorization per outer iteration.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.csr import CSR
from ..utils.debug import check_finite
from ..utils.logging import info
from .arnoldi import EigenResult, eps_solver, pep_solver
from .linsolve import build_shifted_factor


def _proj_enabled() -> bool:
    return os.environ.get("HELMHOLTZ_X_TPU_PROJ", "1") not in (
        "0", "false", "no")


def _fmt(tol: float) -> str:
    digits = int("{:.0e}".format(tol)[-2:])
    return "{{:+.{}f}}".format(digits)


def _pick_B(operators, problem_type: str):
    return operators.B_adj if problem_type == "adjoint" else operators.B


def _flame_scale(D, omega: complex, problem_type: str) -> complex:
    """FTF scale of the active operator (reference: flame_matrices.py:96-108)."""
    if problem_type == "direct":
        return complex(D.FTF(omega))
    return complex(np.conj(D.FTF(np.conj(omega))))


def _flame_factors(D, problem_type: str):
    L, R = D.factors
    return (L, R) if problem_type == "direct" else (R, L)


def fixed_point_iteration_eps(operators, D, target: complex, nev: int = 2,
                              i: int = 0, tol: float = 1e-8, maxiter: int = 50,
                              print_results: bool = False,
                              problem_type: str = "direct",
                              two_sided: bool = False) -> EigenResult:
    """FPI on the linearized pencil (A + omega_k B - D(omega_k), -C)
    (reference: eigensolvers.py:122-195)."""
    A, C = operators.A, operators.C
    B = _pick_B(operators, problem_type)
    sigma = complex(target) ** 2

    omega = np.zeros(maxiter, dtype=complex)
    f = np.zeros(maxiter, dtype=complex)
    alpha = np.zeros(maxiter, dtype=complex)

    info("--> Fixed point iteration started.\n")

    L, R = _flame_factors(D, problem_type)
    refactor_each = B is not None  # omega_k B changes the passive part

    factor = None
    if not refactor_each:
        factor = build_shifted_factor([(1.0, A), (sigma, C)], C.n)
        if _proj_enabled() and not two_sided:
            from .projection import projected_fpi

            E = projected_fpi(factor, operators, D, target, nev, i, tol,
                              maxiter, problem_type, print_results,
                              eps_kind=True)
            if E is not None:
                return E
        # Woodbury state is only needed by the exact fallback paths below
        # (the projection path solves with the passive operator alone).
        factor.set_lowrank_factors(L, R, two_sided)
        factor.set_scale(0)

    E = eps_solver(A, C, target, nev, print_results=print_results, factor=factor)
    omega[0] = np.sqrt(E.getEigenvalue(i))
    alpha[0] = 0.5

    s = _fmt(tol)
    info("+ Starting eigenvalue is found: {}  {}j. ".format(
        s.format(omega[0].real), s.format(omega[0].imag)))
    info("-> Iterations are starting.\n ")

    domega = 2 * tol
    k = -1
    while abs(domega) > tol:
        k += 1
        if k >= maxiter - 1:
            info("! FPI hit maxiter without converging.")
            break
        info("* iter = {:2d}".format(k + 1))
        sc = _flame_scale(D, omega[k], problem_type)
        if refactor_each:
            factor = build_shifted_factor(
                [(1.0, A), (omega[k], B), (sigma, C)], C.n)
            factor.set_lowrank_factors(L, R, two_sided)
        factor.set_scale(sc)
        E = eps_solver(A, C, target, nev, two_sided=two_sided,
                       print_results=print_results, factor=factor)
        f[k] = np.sqrt(E.getEigenvalue(i))
        if k != 0:
            alpha[k] = 1.0 / (1.0 - (f[k] - f[k - 1]) / (omega[k] - omega[k - 1]))
        omega[k + 1] = alpha[k] * f[k] + (1 - alpha[k]) * omega[k]
        domega = omega[k + 1] - omega[k]
        check_finite(f"FPI(eps) iterate {k + 1}", omega[k + 1])
        info("+ omega = {}  {}j,  |domega| = {:.2e}\n".format(
            s.format(omega[k + 1].real), s.format(omega[k + 1].imag), abs(domega)))
    return E


def fixed_point_iteration_pep(operators, D, target: complex, nev: int = 2,
                              i: int = 0, tol: float = 1e-8, maxiter: int = 50,
                              print_results: bool = False,
                              problem_type: str = "direct") -> EigenResult:
    """FPI on the quadratic pencil (A - D(omega_k)) + omega B + omega^2 C
    (reference: eigensolvers.py:197-259).  The quadratic passive part
    Q(sigma) = A + sigma B + sigma^2 C is factored once."""
    A, C = operators.A, operators.C
    B = _pick_B(operators, problem_type)
    sigma = complex(target)

    omega = np.zeros(maxiter, dtype=complex)
    f = np.zeros(maxiter, dtype=complex)
    alpha = np.zeros(maxiter, dtype=complex)

    L, R = _flame_factors(D, problem_type)
    factor = build_shifted_factor([(1.0, A), (sigma, B), (sigma**2, C)], C.n)
    if _proj_enabled():
        from .projection import projected_fpi

        E = projected_fpi(factor, operators, D, target, nev, i, tol,
                          maxiter, problem_type, print_results,
                          eps_kind=False)
        if E is not None:
            return E
    factor.set_lowrank_factors(L, R, False)
    factor.set_scale(0)

    E = pep_solver(A, B, C, target, nev, print_results=print_results, factor=factor)
    omega[0] = E.getEigenvalue(i)
    alpha[0] = 0.5

    s = _fmt(tol)
    info("-> Fixed point iteration started.\n")

    domega = 2 * tol
    k = -1
    while abs(domega) > tol:
        k += 1
        if k >= maxiter - 1:
            info("! FPI hit maxiter without converging.")
            break
        info("* iter = {:2d}".format(k + 1))
        factor.set_scale(_flame_scale(D, omega[k], problem_type))
        E = pep_solver(A, B, C, target, nev, print_results=print_results,
                       factor=factor)
        f[k] = E.getEigenvalue(i)
        if k != 0:
            alpha[k] = 1.0 / (1.0 - (f[k] - f[k - 1]) / (omega[k] - omega[k - 1]))
        omega[k + 1] = alpha[k] * f[k] + (1 - alpha[k]) * omega[k]
        domega = omega[k + 1] - omega[k]
        check_finite(f"FPI(pep) iterate {k + 1}", omega[k + 1])
        info("+ omega = {}  {}j,  |domega| = {:.2e}\n".format(
            s.format(omega[k + 1].real), s.format(omega[k + 1].imag), abs(domega)))
    return E


def fixed_point_iteration(operators, D, target: complex, nev: int = 2, i: int = 0,
                          tol: float = 1e-8, maxiter: int = 50,
                          print_results: bool = False,
                          problem_type: str = "direct",
                          checkpoint: str | None = None) -> EigenResult:
    """Dispatch: quadratic pencil when B exists, else the linear one
    (reference: eigensolvers.py:261-276).

    ``checkpoint``: optional path; the converged omega is written there and,
    if the file already exists (an earlier run died after partial progress),
    its omega replaces ``target`` so the restarted solve resumes from the
    best available estimate (SURVEY §5 restartable-outer-loop plan — the
    reference simply reruns from scratch)."""
    from ..utils.metrics import profiled, timed

    if checkpoint is not None:
        import os as _os

        if _os.path.exists(checkpoint + ".txt"):
            from ..utils.io import dict_loader

            saved = dict_loader(checkpoint)
            saved_type = saved.get("problem_type")
            saved_omega = complex(saved["omega"]) if "omega" in saved else None
            if saved_omega is None or saved_type != problem_type:
                info(f"! Ignoring checkpoint {checkpoint}: problem_type "
                     f"{saved_type!r} != {problem_type!r} (stale/foreign file).")
            elif abs(saved_omega - complex(target)) > 0.5 * abs(complex(target)):
                info(f"! Ignoring checkpoint {checkpoint}: saved omega "
                     f"{saved_omega:.6f} is not near target {complex(target):.6f}.")
            else:
                target = saved_omega
                info(f"- Resuming FPI from checkpointed omega {target:.6f}")

    with profiled("fixed_point_iteration"), \
            timed("fpi", problem_type=problem_type, n=operators.C.n,
                  kind="pep" if operators.B is not None else "eps") as m:
        if operators.B is not None:
            E = fixed_point_iteration_pep(operators, D, target, nev=nev, i=i,
                                          tol=tol, maxiter=maxiter,
                                          print_results=print_results,
                                          problem_type=problem_type)
        else:
            E = fixed_point_iteration_eps(operators, D, target, nev=nev, i=i,
                                          tol=tol, maxiter=maxiter,
                                          print_results=print_results,
                                          problem_type=problem_type)
        lam = E.getEigenvalue(i)
        m["iters"] = E.iterations
        omega = complex(np.sqrt(lam) if E.kind == "eps" else lam)
        m["omega"] = omega
        if checkpoint is not None:
            from ..utils.io import dict_writer

            dict_writer(checkpoint, {"omega": omega,
                                     "problem_type": problem_type})
        return E
