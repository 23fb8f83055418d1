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
from ..utils.logging import info
from .arnoldi import EigenResult, _default_mmax, eps_solver, pep_solver
from .linsolve import build_shifted_factor


def _fused_enabled() -> bool:
    # The fused while_loop FPI is superseded by the resolvent-projection path
    # (projection.py) — one Krylov basis total instead of one per outer
    # iteration.  It remains available as an opt-in fallback.
    return os.environ.get("HELMHOLTZ_X_TPU_FUSED_FPI", "0") not in (
        "0", "false", "no")


def _proj_enabled() -> bool:
    return os.environ.get("HELMHOLTZ_X_TPU_PROJ", "1") not in (
        "0", "false", "no")


def _run_fused(factor, pencil, D, sigma: complex, nev: int, i: int,
               tol: float, maxiter: int, problem_type: str,
               print_results: bool, eps_kind: bool, n: int):
    """Single-dispatch FPI (fpi_fused.py): the whole outer loop — passive
    start, FTF, capacitance refresh, Arnoldi, Ritz extraction, Aitken — runs
    inside one lax.while_loop on device.  Returns an EigenResult (rebuilt on
    host from the final V, H) or None when the configuration can't be fused."""
    from .fpi_fused import ftf_params_device, fused_fpi_run

    backend = getattr(factor, "backend", "dense")
    if backend not in ("dense", "banded"):
        return None
    try:
        kind, p = ftf_params_device(D.FTF)
    except TypeError:
        return None
    mode = {(True, "dense"): "eps", (True, "banded"): "epsb",
            (False, "dense"): "pep", (False, "banded"): "pepb"}[
        (eps_kind, backend)]
    nrefine = factor.refine if backend == "banded" else factor.nrefine
    sv_base = factor.solve_op()
    W, R, G = factor.lowrank_state()
    n_op = n if eps_kind else 2 * n
    mmax = _default_mmax(n_op, nev)
    import jax

    if jax.default_backend() != "cpu":
        # Root-caused in tools/probe_fused.py (docs/fused_probe.json): the
        # remote-TPU tunnel kills any single dispatch running past ~280 s
        # wall and the worker then needs minutes to restart.  It is a
        # DURATION limit, not memory — a 300k-element basis executes fine
        # with a short loop but dies with the full 50-iteration loop.
        # Measured throughput ~29k basis-element-iterations/s at mmax=48, so
        # budget the dispatch work (mmax+1)*n_op*maxiter to stay well under
        # the deadline and shrink the subspace to fit; the warm-started
        # expansions converge in far fewer steps than a cold solve.
        work_budget = float(os.environ.get("HELMHOLTZ_X_TPU_FUSED_WORK", 6e6))
        cap = int(work_budget / (n_op * max(maxiter, 1))) - 1
        mmax = min(mmax, cap)
        if mmax < max(16, 4 * nev):
            return None
    rng = np.random.default_rng(7)
    v0 = rng.standard_normal(n_op) + 1j * rng.standard_normal(n_op)
    v0 /= np.linalg.norm(v0)

    info("--> Fixed point iteration started (device-fused loop).\n")
    try:
        it, om, hist, V, H = fused_fpi_run(
            sv_base, pencil, W, R, G, kind, p, sigma, v0, tol, mode, nrefine,
            maxiter, i, problem_type == "adjoint", eps_kind, mmax)
    except Exception as e:  # runtime/compile failure -> host-driven loop
        info(f"! fused FPI failed on this backend ({type(e).__name__}); "
             "falling back to the host-driven loop.")
        if jax.default_backend() != "cpu":
            _wait_for_device()  # a killed dispatch restarts the remote worker
        return None
    niter = int(it)
    hist_np = (np.asarray(hist.re) + 1j * np.asarray(hist.im))[:niter]
    if niter == 0 or not np.all(np.isfinite(hist_np)):
        info("! fused FPI produced non-finite iterates; "
             "falling back to the host-driven loop.")
        return None

    s = _fmt(tol)
    info("+ Starting eigenvalue is found: {}  {}j. ".format(
        s.format(hist_np[0].real), s.format(hist_np[0].imag)))
    info("-> Iterations are starting.\n ")
    for k in range(1, niter):
        info("* iter = {:2d}".format(k))
        info("+ omega = {}  {}j,  |domega| = {:.2e}\n".format(
            s.format(hist_np[k].real), s.format(hist_np[k].imag),
            abs(hist_np[k] - hist_np[k - 1])))
    if niter >= maxiter and abs(hist_np[-1] - hist_np[-2]) > tol:
        info("! FPI hit maxiter without converging.")

    # Rebuild the converged eigenpairs from the final Arnoldi decomposition
    # exactly as arnoldi._run_arnoldi does.
    Hnp = np.asarray(H.re) + 1j * np.asarray(H.im)
    Vnp = np.asarray(V.re) + 1j * np.asarray(V.im)
    m = Hnp.shape[1]
    Hm = Hnp[: m + 1, :m]
    sub = np.abs(np.diag(Hm[1:, :]))
    brk = np.nonzero(sub < 1e-13 * max(1.0, np.abs(Hm).max()))[0]
    jeff = int(brk[0]) + 1 if len(brk) else m
    nus, ys = np.linalg.eig(Hm[:jeff, :jeff])
    order = np.argsort(-np.abs(nus))
    nus, ys = nus[order], ys[:, order]
    beta_last = sub[jeff - 1] if jeff == m else 0.0
    lams = sigma + 1.0 / nus
    nkeep = min(max(nev, 2), len(lams))
    vecs = Vnp[:jeff].T @ ys[:, :nkeep]
    if not eps_kind:
        vecs = vecs[:n, :]
    vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
    rel = (beta_last * np.abs(ys[-1, :nkeep])
           / np.maximum(np.abs(nus[:nkeep]), 1e-300))
    if rel[i] > 1e-8:
        info(f"! fused FPI wanted-pair residual {rel[i]:.2e} too large "
             f"(m={Hnp.shape[1]}); falling back to the host-driven loop.")
        return None
    res = EigenResult(kind="eps" if eps_kind else "pep", sigma=sigma,
                      eigenvalues=lams[:nkeep], vectors=vecs,
                      iterations=niter, residuals=rel)
    if print_results:
        from .arnoldi import _print_results

        _print_results(res)
    return res


def _wait_for_device(deadline_s: float = 300.0) -> None:
    """Block until the accelerator answers a trivial dispatch again.

    After the tunnel kills an over-deadline dispatch the remote worker
    restarts itself; the restart takes a variable few minutes
    (docs/fused_probe.json), so poll with backoff instead of a fixed sleep."""
    import time

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    wait = 2.0
    while time.time() - t0 < deadline_s:
        try:
            jax.block_until_ready(jnp.zeros(8) + 1.0)
            return
        except Exception:
            time.sleep(wait)
            wait = min(2 * wait, 30.0)
    info("! device still unavailable; subsequent dispatches may fail.")


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
        if _fused_enabled() and not two_sided:
            E = _run_fused(factor, (C,), D, sigma, nev, i, tol, maxiter,
                           problem_type, print_results, eps_kind=True, n=C.n)
            if E is not None:
                return E
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
    if _fused_enabled():
        E = _run_fused(factor, (B, C), D, sigma, nev, i, tol, maxiter,
                       problem_type, print_results, eps_kind=False, n=C.n)
        if E is not None:
            return E
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
            if "omega" in saved:
                target = complex(saved["omega"])
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
