"""Device-fused fixed-point iteration: the ENTIRE nonlinear eigensolve as a
single XLA dispatch.

The unfused loop (fpi.py) already factors the passive operator once, but it
still pays one host<->device roundtrip per outer iteration (Arnoldi chunk out,
Hessenberg eigensolve on host, capacitance refresh in).  Here everything runs
inside one `lax.while_loop`:

  * FTF evaluation (nTau closed form / stateSpace via a small embedded solve),
  * Woodbury capacitance refresh  cap = s (I - s G)^{-1}  (k x k),
  * the m-step Arnoldi expansion (the same traced body as arnoldi.py),
  * Ritz extraction of the wanted eigenvalue from the m x m Hessenberg —
    power iteration + Rayleigh-quotient inverse iteration (+ Wielandt
    deflation for index i > 0), all in (re, im)-pair arithmetic,
  * the reference's Aitken-relaxed update
    alpha_k = 1/(1 - (f_k - f_{k-1})/(omega_k - omega_{k-1}))
    (reference: helmholtz_x/eigensolvers.py:122-259) and the |domega| < tol
    convergence test.

Iteration 0 runs with FTF scale 0 — the passive starting solve — so the whole
reference call sequence `eps/pep_solver + fixed_point_iteration` is one
device program.  The host only sees the final (omega history, V, H), from
which it rebuilds the converged eigenpairs exactly as the unfused path does.

Successive Arnoldi runs warm-start from the previous outer iteration's Ritz
vector: as omega_k converges the operator changes only through the scalar
FTF gain, so the wanted eigenvector is nearly invariant across iterations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Z, zarray
from ..utils.logging import info
from .arnoldi import EigenResult, EpsOp, PepOp, _arnoldi_expand

_TINY = 1e-300


def _qr_solve(a: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Dense solve via QR (f64 LuDecomposition is not implemented on the TPU
    backend; QR + triangular solve is — same path as ops/dense.py)."""
    q, r = jnp.linalg.qr(a)
    return jax.scipy.linalg.solve_triangular(r, q.T @ rhs, lower=False)


# ---------------------------------------------------------------------------
# scalar complex-pair helpers (0-d jnp arrays)

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cinv(ar, ai):
    d = ar * ar + ai * ai + _TINY
    return ar / d, -ai / d


def _csqrt(ar, ai):
    """Principal complex sqrt (matches np.sqrt: Re >= 0)."""
    r = jnp.sqrt(ar * ar + ai * ai)
    re = jnp.sqrt(jnp.maximum((r + ar) / 2.0, 0.0))
    im = jnp.sqrt(jnp.maximum((r - ar) / 2.0, 0.0))
    return re, jnp.where(ai >= 0, im, -im)


# ---------------------------------------------------------------------------
# flame transfer functions on device

class FTFParams(NamedTuple):
    """Either nTau (n, tau used) or stateSpace (A, b, c, d used)."""

    n: jnp.ndarray
    tau: jnp.ndarray
    A: Z
    b: Z
    c: Z
    d: Z


def ftf_params_device(FTF) -> tuple[str, FTFParams]:
    """Build device params from an ftf.nTau / ftf.stateSpace instance."""
    from ..ftf import nTau, stateSpace

    zero = zarray(np.zeros((0,), dtype=np.complex128))
    zmat = zarray(np.zeros((0, 0), dtype=np.complex128))
    if isinstance(FTF, nTau):
        return "ntau", FTFParams(jnp.asarray(float(FTF.n)),
                                 jnp.asarray(float(FTF.tau)),
                                 zmat, zero, zero, zarray(np.zeros((),
                                                                   complex)))
    if isinstance(FTF, stateSpace):
        A = np.asarray(FTF.A, dtype=np.complex128)
        b = np.asarray(FTF.b, dtype=np.complex128).reshape(-1)
        c = np.asarray(FTF.c, dtype=np.complex128).reshape(-1)
        d = complex(np.asarray(FTF.d).reshape(-1)[0])
        return "ss", FTFParams(jnp.asarray(0.0), jnp.asarray(0.0),
                               zarray(A), zarray(b), zarray(c),
                               zarray(np.array(d)))
    raise TypeError(f"unsupported FTF type for fused FPI: {type(FTF)}")


def _ftf_scale(kind: str, p: FTFParams, wr, wi, adjoint: bool):
    """FTF(omega) (direct) or conj(FTF(conj(omega))) (adjoint) as a pair
    (reference: flame_matrices.py:96-108)."""
    if kind == "ntau":
        # direct:  n e^{i tau (wr + i wi)} = n e^{-tau wi} (cos,sin)(tau wr)
        # adjoint: conj(n e^{i tau conj(w)}) = n e^{+tau wi} (cos,-sin)(tau wr)
        e = jnp.exp(p.tau * wi) if adjoint else jnp.exp(-p.tau * wi)
        sgn = -1.0 if adjoint else 1.0
        return p.n * e * jnp.cos(p.tau * wr), sgn * p.n * e * jnp.sin(p.tau * wr)
    # stateSpace: h(M) = c M^{-1} b + d with
    #   direct:  M = i conj(w) I - A, scale = conj(h)
    #   adjoint: M = i w I - A,       scale = h
    q = p.A.re.shape[0]
    eye = jnp.eye(q)
    if adjoint:
        mre = -wi * eye - p.A.re
        mim = wr * eye - p.A.im
    else:
        mre = wi * eye - p.A.re
        mim = wr * eye - p.A.im
    emb = jnp.block([[mre, -mim], [mim, mre]])
    rhs = jnp.concatenate([p.b.re, p.b.im])
    z = _qr_solve(emb, rhs)
    zr, zi = z[:q], z[q:]
    hre = p.c.re @ zr - p.c.im @ zi + p.d.re
    him = p.c.re @ zi + p.c.im @ zr + p.d.im
    if adjoint:
        return hre, him
    return hre, -him


# ---------------------------------------------------------------------------
# on-device Ritz extraction from the m x m Hessenberg

def _hmatvec(Hr, Hi, xr, xi):
    return Hr @ xr - Hi @ xi, Hr @ xi + Hi @ xr


def _rayleigh(Hr, Hi, xr, xi):
    """x^H H x for unit x."""
    tr, ti = _hmatvec(Hr, Hi, xr, xi)
    return xr @ tr + xi @ ti, xr @ ti - xi @ tr


def _normalize(xr, xi):
    # max-abs pre-scaling so inverse-iteration outputs of norm ~1e150+ don't
    # overflow the sum of squares
    s = jnp.maximum(jnp.max(jnp.abs(xr)), jnp.max(jnp.abs(xi))) + _TINY
    xr, xi = xr / s, xi / s
    nrm = jnp.sqrt(xr @ xr + xi @ xi) + _TINY
    return xr / nrm, xi / nrm


def _power_dominant(Hr, Hi, npower: int):
    m = Hr.shape[0]
    xr = jnp.ones(m) / jnp.sqrt(1.0 * m)
    xi = jnp.zeros(m)

    def body(_, xv):
        xr, xi = xv
        yr, yi = _hmatvec(Hr, Hi, xr, xi)
        return _normalize(yr, yi)

    return jax.lax.fori_loop(0, npower, body, (xr, xi))


def _rqi(Hr, Hi, xr, xi, nur, nui, nrqi: int):
    """Rayleigh-quotient inverse iteration; each step one (2m x 2m) real
    embedded solve.  The shift is offset from the Rayleigh quotient by a
    relative 1e-10: the power start already estimates nu to ~1e-14, so an
    exact shift makes H - nu I singular to machine precision and the solve
    overflows; the offset bounds the condition number at ~1e10 while the
    iteration still converges to the same eigenvector.  A finiteness guard
    keeps the previous iterate if the solve degenerates anyway."""
    m = Hr.shape[0]
    eye = jnp.eye(m)

    def body(_, st):
        xr, xi, nur, nui = st
        offs = 1e-10 * (jnp.abs(nur) + jnp.abs(nui) + _TINY)
        ar = Hr - (nur + offs) * eye
        ai = Hi - (nui + offs) * eye
        emb = jnp.block([[ar, -ai], [ai, ar]])
        z = _qr_solve(emb, jnp.concatenate([xr, xi]))
        zr, zi = _normalize(z[:m], z[m:])
        ok = jnp.logical_and(jnp.all(jnp.isfinite(zr)),
                             jnp.all(jnp.isfinite(zi)))
        xr2 = jnp.where(ok, zr, xr)
        xi2 = jnp.where(ok, zi, xi)
        nur2, nui2 = _rayleigh(Hr, Hi, xr2, xi2)
        return xr2, xi2, nur2, nui2

    return jax.lax.fori_loop(0, nrqi, body, (xr, xi, nur, nui))


def _ritz_index(Hr, Hi, index: int, npower: int = 100, nrqi: int = 4):
    """The Ritz pair with the `index`-th largest |nu| of the (m x m)
    Hessenberg, via power iteration + RQI; Wielandt deflation
    H <- H - nu x x^H peels off the larger ones for index > 0."""
    Hr0, Hi0 = Hr, Hi
    for j in range(index + 1):
        xr, xi = _power_dominant(Hr, Hi, npower)
        nur, nui = _rayleigh(Hr, Hi, xr, xi)
        xr, xi, nur, nui = _rqi(Hr, Hi, xr, xi, nur, nui, nrqi)
        if j < index:
            # Wielandt deflation with v = x (unit): spectrum {nu, ...} -> {0, ...}
            cr, ci = _cmul(nur, nui, 1.0, 0.0)
            oxr = jnp.outer(xr, xr) + jnp.outer(xi, xi)   # Re(x x^H)
            oxi = jnp.outer(xi, xr) - jnp.outer(xr, xi)   # Im(x x^H)
            Hr = Hr - (cr * oxr - ci * oxi)
            Hi = Hi - (cr * oxi + ci * oxr)
    if index > 0:
        # polish the pair on the ORIGINAL H (deflation preserves eigenvalues
        # but not eigenvectors)
        xr, xi, nur, nui = _rqi(Hr0, Hi0, xr, xi, nur, nui, nrqi + 2)
    return nur, nui, xr, xi


# ---------------------------------------------------------------------------
# the fused loop

def _cap_from_G(G: Z, sr, si):
    """cap = s (I - s G)^{-1}  ==  (I/s - G)^{-1}, well-defined at s = 0."""
    k = G.re.shape[0]
    eye = jnp.eye(k)
    ar = eye - (sr * G.re - si * G.im)
    ai = -(sr * G.im + si * G.re)
    emb = jnp.block([[ar, -ai], [ai, ar]])
    inv = _qr_solve(emb, jnp.concatenate([eye, jnp.zeros((k, k))]))
    ir, ii = inv[:k], inv[k:]
    return Z(sr * ir - si * ii, sr * ii + si * ir)


def fused_fpi_run(sv_base, pencil, W, R, G, kind, p, sigma, v0, tol, mode,
                  nrefine, maxiter, index, adjoint, eps_kind, mmax):
    """Host entry: allocates the loop state and runs the fused while_loop."""
    n_op = v0.shape[0]
    Wz, Rz, Gz = zarray(W), zarray(R), zarray(G)
    v0z = zarray(v0)
    return _fused_fpi_impl(sv_base, tuple(pencil), Wz, Rz, Gz, p,
                           jnp.asarray(sigma.real), jnp.asarray(sigma.imag),
                           v0z, float(tol), mode, int(nrefine), int(maxiter),
                           int(index), kind, bool(adjoint), bool(eps_kind),
                           int(mmax), int(n_op))


@partial(jax.jit, static_argnames=("mode", "nrefine", "maxiter", "index",
                                   "kind", "adjoint", "eps_kind", "mmax",
                                   "n_op"))
def _fused_fpi_impl(sv_base, pencil, W: Z, R: Z, G: Z, p: FTFParams,
                    sigr, sigi, v0: Z, tol: float, mode: str, nrefine: int,
                    maxiter: int, index: int, kind: str, adjoint: bool,
                    eps_kind: bool, mmax: int, n_op: int):
    from ..solvers.linsolve import Woodbury

    nwb = W.re.shape[0]

    def make_op(sv):
        if eps_kind:
            return EpsOp(sv=sv, C=pencil[0])
        return PepOp(sv=sv, B=pencil[0], C=pencil[1], sig=Z(sigr, sigi))

    def expand(sr, si, vstart):
        """One Arnoldi expansion at FTF scale s (fresh V/H temporaries —
        keeping the big basis OUT of the while_loop carry; carrying it
        crashes the remote-TPU worker at ~3k dofs)."""
        cap = _cap_from_G(G, sr, si)
        zk = Z(jnp.zeros((nwb, 0)), jnp.zeros((nwb, 0)))
        zkk = Z(jnp.zeros((0, 0)), jnp.zeros((0, 0)))
        wb = Woodbury(W=W, cap=cap, R=R, Wh=zk, caph=zkk, Lc=zk)
        op = make_op(sv_base._replace(wb=wb))
        Vz = Z(jnp.zeros((mmax + 1, n_op)).at[0].set(vstart.re),
               jnp.zeros((mmax + 1, n_op)).at[0].set(vstart.im))
        Hz = Z(jnp.zeros((mmax + 1, mmax)), jnp.zeros((mmax + 1, mmax)))
        return _arnoldi_expand(op, Vz, Hz, 0, mmax, mode, nrefine)

    def body(state):
        (it, omr, omi, pr_omr, pr_omi, fpr, fpi_, dmag, vstart, hist,
         s_lr, s_li, vused) = state
        sr0, si0 = _ftf_scale(kind, p, omr, omi, adjoint)
        live = (it > 0).astype(jnp.float64)
        sr, si = sr0 * live, si0 * live
        Vz, Hz = expand(sr, si, vstart)
        nur, nui, yr, yi = _ritz_index(Hz.re[:mmax, :mmax], Hz.im[:mmax, :mmax],
                                       index)
        ivr, ivi = _cinv(nur, nui)
        lamr, lami = sigr + ivr, sigi + ivi
        if eps_kind:
            fr, fi = _csqrt(lamr, lami)
        else:
            fr, fi = lamr, lami
        dfr, dfi = fr - fpr, fi - fpi_
        dor, doi = omr - pr_omr, omi - pr_omi
        qir, qii = _cinv(dor, doi)
        rr, ri = _cmul(dfr, dfi, qir, qii)
        air, aii = _cinv(1.0 - rr, -ri)
        first_corr = (it == 1)
        air = jnp.where(first_corr, 0.5, air)
        aii = jnp.where(first_corr, 0.0, aii)
        afr, afi = _cmul(air, aii, fr, fi)
        aor, aoi = _cmul(1.0 - air, -aii, omr, omi)
        nomr = jnp.where(it == 0, fr, afr + aor)
        nomi = jnp.where(it == 0, fi, afi + aoi)
        d = jnp.sqrt((nomr - omr) ** 2 + (nomi - omi) ** 2)
        # stagnation stop: the fixed-mmax warm-started inner solves have a
        # small noise floor (~5e-8 observed, docs/fused_probe.json), so near
        # convergence |domega| can plateau just above a very tight tol and
        # the loop would otherwise burn all maxiter iterations.  Once the
        # update is tiny (< 1e3*tol) and no longer decreasing, declare
        # convergence by forcing the magnitude below tol.
        stagnated = jnp.logical_and(
            it > 1, jnp.logical_and(d < 1e3 * tol, d >= dmag))
        dmag2 = jnp.where(it == 0, 2.0 * tol + 1.0,
                          jnp.where(stagnated, 0.5 * tol, d))
        hist = Z(hist.re.at[it].set(nomr), hist.im.at[it].set(nomi))
        wr_ = yr @ Vz.re[:mmax] - yi @ Vz.im[:mmax]
        wi_ = yr @ Vz.im[:mmax] + yi @ Vz.re[:mmax]
        wr_, wi_ = _normalize(wr_, wi_)
        return (it + 1, nomr, nomi, omr, omi, fr, fi, dmag2,
                Z(wr_, wi_), hist, sr, si, vstart)

    def cond(state):
        return jnp.logical_and(state[0] < maxiter, state[7] > tol)

    z0 = jnp.asarray(0.0)
    hist0 = Z(jnp.zeros(maxiter), jnp.zeros(maxiter))
    state0 = (jnp.asarray(0, jnp.int32), z0, z0, z0, z0, z0, z0,
              jnp.asarray(2.0 * tol + 1.0), v0, hist0, z0, z0, v0)
    out = jax.lax.while_loop(cond, body, state0)
    it, omr, omi = out[0], out[1], out[2]
    hist, s_lr, s_li, vused = out[9], out[10], out[11], out[12]
    # replay the last expansion (same scale, same start vector) to hand the
    # host the final V, H for eigenpair extraction
    V, H = expand(s_lr, s_li, vused)
    return it, Z(omr, omi), hist, V, H
