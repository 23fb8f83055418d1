"""Shifted-operator factorization with low-rank Woodbury correction.

The shift-invert kernel of every solve in the framework.  For a shift sigma
the passive part  P = A + sigma*B + sigma^2*C  is factored ONCE on device
(dense QR of the real embedding — ops/dense.py); the flame operator
D = s * L R^T enters through the exact Woodbury identity

    (P - s L R^T)^{-1} b = y + W (I/s - R^T W)^{-1} (R^T y),   y = P^{-1} b,
    W = P^{-1} L   (precomputed, k columns)

so the whole fixed-point iteration runs on ONE factorization while the
reference refactors A - D(omega_k) inside SLEPc every outer iteration
(reference: helmholtz_x/eigensolvers.py:158-178).

Conjugate-transpose solves (two-sided / adjoint paths) reuse the same factors:
    (P - s L R^T)^H = P^H - conj(s) conj(R) conj(L)^T
with W_H = P^{-H} conj(R).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Z, zarray
from ..ops.csr import CSR, csr_device, csr_empty
from ..ops.dense import DenseFactor, dense_solve, dense_solve_H, factor_dense
from ..utils.logging import info


def csr_weighted_dense(terms) -> Z:
    """Dense sum  sum_i coeff_i * M_i  of CSR matrices (device scatter-add).

    terms: iterable of (complex_coeff, CSR or None).
    """
    terms = [(complex(c), m) for c, m in terms if m is not None and c != 0]
    n = terms[0][1].n
    dr = jnp.zeros((n, n))
    di = jnp.zeros((n, n))
    for c, m in terms:
        if c.real != 0.0:
            dr = dr.at[m.rows, m.indices].add(c.real * m.data.re)
            di = di.at[m.rows, m.indices].add(c.real * m.data.im)
        if c.imag != 0.0:
            dr = dr.at[m.rows, m.indices].add(-c.imag * m.data.im)
            di = di.at[m.rows, m.indices].add(c.imag * m.data.re)
    return Z(dr, di)


def csr_weighted_scipy(terms):
    """Host (scipy) sum  sum_i coeff_i * M_i for the sparse tier."""
    terms = [(complex(c), m) for c, m in terms if m is not None and c != 0]
    out = terms[0][0] * terms[0][1].to_scipy()
    for c, m in terms[1:]:
        out = out + c * m.to_scipy()
    return out.tocsc()


class Woodbury(NamedTuple):
    """Device-side state of the rank-k correction (possibly k=0)."""

    W: Z  # (n, k)  P^{-1} L
    cap: Z  # (k, k)  (I/s - R^T W)^{-1}
    R: Z  # (n, k)
    Wh: Z  # (n, k)  P^{-H} conj(R)   (H-solve path; zero-width if unused)
    caph: Z  # (k, k)
    Lc: Z  # (n, k)  conj(L)


def _mixed_precision_default() -> bool:
    import os

    import jax

    flag = os.environ.get("HELMHOLTZ_X_TPU_MIXED", "auto")
    if flag == "auto":
        # f64 QR is software-emulated (seconds) on TPU; f32 factor + f64
        # iterative refinement is the native fast path there.  On CPU f64
        # LAPACK is fast and exact — no refinement needed.
        return jax.default_backend() != "cpu"
    return flag not in ("0", "false", "no")


class ShiftedFactor:
    """Factorization of P(sigma) = A + cb*B + cc*C with a pluggable low-rank
    correction and optional mixed-precision refinement."""

    def __init__(self, P: Z, terms=None, n: Optional[int] = None):
        self.n = P.re.shape[0] if P is not None else n
        if terms is not None:
            terms = [(complex(c), m) for c, m in terms if m is not None and c != 0]
            A = terms[0][1]
            assert terms[0][0] == 1.0
            if len(terms) == 2:
                B, cb = None, 0.0
                cc, C = terms[1]
            else:
                cb, B = terms[1]
                cc, C = terms[2]
            self._A, self._B, self._C = A, B, C
            self._cb, self._cc = complex(cb), complex(cc)
            self.mixed = _mixed_precision_default()
        else:
            self._A = self._B = self._C = None
            self._cb = self._cc = 0.0
            self.mixed = False
        import jax.numpy as _jnp

        dtype = _jnp.float32 if self.mixed else _jnp.float64
        self.nrefine = 3 if self.mixed else 0
        self.fac: DenseFactor = factor_dense(P, dtype=dtype)
        self._wb: Optional[Woodbury] = None
        self._L_np = None
        self._R_np = None
        self._W_np = None
        self._Wh_np = None
        self._G = None  # R^T W (k, k)
        self._Gh = None  # conj(L)^T Wh
        self._sp = None  # cached host scipy (A, B, C) for refinement SpMVs
        self._dev = None  # cached device copies of (A, B, C) for solve_op

    @classmethod
    def from_terms(cls, terms, n: int) -> "ShiftedFactor":
        return cls(csr_weighted_dense(terms), terms=terms)

    def solve_op(self):
        """Device pytree for the jitted Arnoldi chunks (arnoldi.SolveOp).
        The CSR operands cross to the device ONCE (cached across calls)."""
        from .arnoldi import SolveOp

        if self._dev is None:
            A = self._A if self._A is not None else csr_empty(self.n)
            B = self._B if self._B is not None else csr_empty(self.n)
            C = self._C if self._C is not None else csr_empty(self.n)
            self._dev = (csr_device(A), csr_device(B), csr_device(C))
        A, B, C = self._dev
        import jax.numpy as _jnp

        return SolveOp(
            minv=Z(self.fac.mre, self.fac.mim), A=A, B=B, C=C,
            cb=Z(_jnp.asarray(self._cb.real), _jnp.asarray(self._cb.imag)),
            cc=Z(_jnp.asarray(self._cc.real), _jnp.asarray(self._cc.imag)),
            wb=self.woodbury,
        )

    def _host_sp(self):
        """Cached host scipy (A, B, C) — refinement SpMVs never touch the
        device."""
        if self._sp is None:
            self._sp = (
                self._A.to_scipy(),
                self._B.to_scipy() if self._B is not None else None,
                self._C.to_scipy(),
            )
        return self._sp

    def _apply_P_np(self, x: np.ndarray) -> np.ndarray:
        Asp, Bsp, Csp = self._host_sp()
        out = Asp @ x
        if Bsp is not None and self._cb != 0:
            out = out + self._cb * (Bsp @ x)
        out = out + self._cc * (Csp @ x)
        return out

    def _apply_P_H_np(self, x: np.ndarray) -> np.ndarray:
        Asp, Bsp, Csp = self._host_sp()
        out = Asp.conj().T @ x
        if Bsp is not None and self._cb != 0:
            out = out + np.conj(self._cb) * (Bsp.conj().T @ x)
        out = out + np.conj(self._cc) * (Csp.conj().T @ x)
        return out

    # -- plain P solves (setup path; refinement recovers f64 accuracy) -----
    def solve_P(self, b: Z) -> Z:
        y = dense_solve(self.fac, b)
        if self.nrefine and self._A is not None:
            bn = b.to_numpy()
            yn = y.to_numpy()
            for _ in range(self.nrefine):
                if bn.ndim == 1:
                    r = bn - self._apply_P_np(yn)
                else:
                    r = bn - np.stack([self._apply_P_np(yn[:, k])
                                       for k in range(yn.shape[1])], axis=1)
                yn = yn + dense_solve(self.fac, zarray(r)).to_numpy()
            return zarray(yn)
        return y

    def solve_P_H(self, b: Z) -> Z:
        y = dense_solve_H(self.fac, b)
        if self.nrefine and self._A is not None:
            bn = b.to_numpy()
            yn = y.to_numpy()
            for _ in range(self.nrefine):
                if bn.ndim == 1:
                    r = bn - self._apply_P_H_np(yn)
                else:
                    r = bn - np.stack([self._apply_P_H_np(yn[:, k])
                                       for k in range(yn.shape[1])], axis=1)
                yn = yn + dense_solve_H(self.fac, zarray(r)).to_numpy()
            return zarray(yn)
        return y

    # -- low-rank correction ----------------------------------------------
    def set_lowrank_factors(self, L: np.ndarray, R: np.ndarray, two_sided: bool = False):
        """Precompute W = P^{-1} L (and W_H) for factors L, R (n, k).

        Done once per factorization; `set_scale` then updates the (cheap)
        capacitance per outer nonlinear iteration.
        """
        self._L_np = np.asarray(L, dtype=np.complex128)
        self._R_np = np.asarray(R, dtype=np.complex128)
        W = self.solve_P(zarray(self._L_np))
        self._W_np = W.to_numpy()
        self._G = self._R_np.T @ self._W_np
        if two_sided:
            Wh = self.solve_P_H(zarray(np.conj(self._R_np)))
            self._Wh_np = Wh.to_numpy()
            self._Gh = np.conj(self._L_np).T @ self._Wh_np

    def set_scale(self, s: complex) -> Woodbury:
        """Build the device Woodbury state for D = s L R^T."""
        k = self._L_np.shape[1] if self._L_np is not None else 0
        n = self.n
        if k == 0 or s == 0:
            zk = zarray(np.zeros((n, 0), dtype=np.complex128))
            zkk = zarray(np.zeros((0, 0), dtype=np.complex128))
            self._wb = Woodbury(zk, zkk, zk, zk, zkk, zk)
            return self._wb
        cap = np.linalg.inv(np.eye(k) / s - self._G)
        if self._Wh_np is not None:
            caph = np.linalg.inv(np.eye(k) / np.conj(s) - self._Gh)
            wh = zarray(self._Wh_np)
            lc = zarray(np.conj(self._L_np))
            caph_z = zarray(caph)
        else:
            wh = zarray(np.zeros((n, 0), dtype=np.complex128))
            lc = zarray(np.zeros((n, 0), dtype=np.complex128))
            caph_z = zarray(np.zeros((0, 0), dtype=np.complex128))
        self._wb = Woodbury(
            W=zarray(self._W_np), cap=zarray(cap), R=zarray(self._R_np),
            Wh=wh, caph=caph_z, Lc=lc,
        )
        return self._wb

    @property
    def woodbury(self) -> Woodbury:
        if self._wb is None:
            return self.set_scale(0)
        return self._wb


class SparseShiftedFactor:
    """Sparse-direct tier of the shifted-operator factorization (host LU via
    SuperLU + the same Woodbury correction, pure numpy solves).

    INTERIM implementation for problems beyond the dense-QR memory budget
    (>~10k dofs): the factorization runs on the host while the production
    TPU-native replacement (RCM-banded blocked LU on the MXU, see
    ops/banded.py roadmap) lands.  The interface matches ShiftedFactor so the
    Arnoldi/FPI/Newton drivers are backend-agnostic.
    """

    backend = "host"

    def __init__(self, P_scipy):
        import scipy.sparse as sp
        from scipy.sparse.linalg import splu

        self.n = P_scipy.shape[0]
        self._P = sp.csr_matrix(P_scipy)  # exact operator (health checks)
        # the FEM operators are structurally symmetric: MMD_AT_PLUS_A +
        # SymmetricMode beats COLAMD on fill and factor time (measured
        # 4.7 s vs 5.5 s, 20.2M vs 20.6M LU nnz on the MICCA operator)
        self.lu = splu(sp.csc_matrix(P_scipy), permc_spec="MMD_AT_PLUS_A",
                       options={"SymmetricMode": True})
        self._L = None
        self._R = None
        self._W = None
        self._Wh = None
        self._G = None
        self._Gh = None
        self._cap = None
        self._caph = None

    def _solve_mt(self, b: np.ndarray, trans: str) -> np.ndarray:
        """Multi-RHS SuperLU solve, split across two worker threads when the
        block is wide enough: dgstrs releases the GIL and touches the
        factors read-only, and this host runs the basis build's 16-RHS
        blocks on 2 cores (~1.7x; the single-threaded solves were the
        largest slice of the 16 s MICCA host-tier direct solve)."""
        b = np.asarray(b, dtype=np.complex128)
        if b.ndim != 2 or b.shape[1] < 8:
            return self.lu.solve(b, trans=trans)
        import concurrent.futures as cf

        h = b.shape[1] // 2
        if not hasattr(SparseShiftedFactor, "_pool"):
            SparseShiftedFactor._pool = cf.ThreadPoolExecutor(max_workers=2)
        fut = SparseShiftedFactor._pool.submit(self.lu.solve, b[:, :h], trans)
        right = self.lu.solve(b[:, h:], trans=trans)
        return np.concatenate([fut.result(), right], axis=1)

    def solve_P(self, b: np.ndarray) -> np.ndarray:
        return self._solve_mt(b, "N")

    def solve_P_H(self, b: np.ndarray) -> np.ndarray:
        return self._solve_mt(b, "H")

    def set_lowrank_factors(self, L, R, two_sided: bool = False):
        self._L = np.asarray(L, dtype=np.complex128)
        self._R = np.asarray(R, dtype=np.complex128)
        self._W = self.solve_P(self._L)
        self._G = self._R.T @ self._W
        if two_sided:
            self._Wh = self.solve_P_H(np.conj(self._R))
            self._Gh = np.conj(self._L).T @ self._Wh

    def set_scale(self, s: complex):
        k = self._L.shape[1] if self._L is not None else 0
        if k == 0 or s == 0:
            self._cap = None
            self._caph = None
            return
        self._cap = np.linalg.inv(np.eye(k) / s - self._G)
        if self._Wh is not None:
            self._caph = np.linalg.inv(np.eye(k) / np.conj(s) - self._Gh)

    def solve_wb(self, b: np.ndarray) -> np.ndarray:
        """(P - s L R^T)^{-1} b."""
        y = self.solve_P(b)
        if self._cap is not None:
            y = y + self._W @ (self._cap @ (self._R.T @ y))
        return y

    def solve_wb_H(self, b: np.ndarray) -> np.ndarray:
        y = self.solve_P_H(b)
        if self._caph is not None:
            y = y + self._Wh @ (self._caph @ (np.conj(self._L).T @ y))
        return y


class HostAdjointFactor(SparseShiftedFactor):
    """Host factor for P_adj = P^H REUSING an existing SuperLU
    factorization: the adjoint pencil's passive operator
    A + conj(sigma) B_adj + conj(sigma)^2 C equals the direct one's
    conjugate transpose exactly (A, C real symmetric; B complex symmetric;
    B_adj = conj(B^T) by the reference's own construction), so its solves
    are the direct factor's transpose-flag solves — the adjoint FPI that
    follows a direct solve gets its factorization for free.

    ``conj_mode``: the FEM operators are complex SYMMETRIC (P^T = P), so
    P_adj = P^H = conj(P) and P_adj^{-1} b = conj(P^{-1} conj(b)) — the
    adjoint solves become FORWARD SuperLU substitutions on a conjugated
    RHS.  Measured ~45% faster than scipy's trans='H' path on the MICCA
    adjoint basis build (12.7 s vs 18.2 s); ``build_shifted_factor``
    enables it when P_adj matches conj(P) elementwise."""

    def __init__(self, base: SparseShiftedFactor, P_scipy,
                 conj_mode: bool = False):
        import scipy.sparse as sp

        self.n = base.n
        self._P = sp.csr_matrix(P_scipy)
        self._base = base
        self._conj = conj_mode
        self._L = None
        self._R = None
        self._W = None
        self._Wh = None
        self._G = None
        self._Gh = None
        self._cap = None
        self._caph = None

    def solve_P(self, b: np.ndarray) -> np.ndarray:
        if self._conj:
            return np.conj(self._base.solve_P(np.conj(b)))
        return self._base.solve_P_H(b)

    def solve_P_H(self, b: np.ndarray) -> np.ndarray:
        # conj_mode implies P symmetric, so P_adj^H = conj(P)^H = P either way
        return self._base.solve_P(b)



class BandedShiftedFactor:
    """TPU-native sparse-direct tier: RCM reordering (native/meshkit) + block
    banded LU on device (ops/banded.py), same Woodbury interface.

    For (near-)real shifts the factorization runs at a slightly rotated shift
    sigma*(1 + i*eps): shift-invert Arnoldi is exact at any non-eigenvalue
    shift, and the complex diagonal keeps the no-pivot LU well away from
    singularity.  Callers that want the adjusted shift reflected in the
    lambda = sigma + 1/nu recovery pass their terms through
    `build_shifted_factor(..., allow_shift_rotation=...)`.
    """

    backend = "banded"

    def __init__(self, P_scipy, nb: int | None = None, refine: int | None = None,
                 terms=None):
        import scipy.sparse as sp

        from ..native import bandwidth, rcm
        from ..ops.banded import banded_solve, banded_solve_H, factor_banded

        if nb is None and os.environ.get("HELMHOLTZ_X_TPU_NB"):
            # block-size override: at >=200k dofs the nb=256 f32 band
            # (6.2 GB) leaves no HBM headroom on a single chip; nb=128
            # hugs the band tighter (~5.5 GB) at 2x the substitution steps
            nb = int(os.environ["HELMHOLTZ_X_TPU_NB"])

        a = sp.csr_matrix(P_scipy)
        pattern = sp.csr_matrix(
            (np.ones(a.nnz), a.indices, a.indptr), shape=a.shape)
        sym = ((pattern + pattern.T) > 0).astype(np.float64).tocsr()
        perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
        if nb is None:
            coo = a.tocoo()
            bw = bandwidth(coo.row.astype(np.int64), coo.col.astype(np.int64),
                           a.shape[0], perm)
            # Substitution is a sequential fori_loop over ~2*n/nb block rows;
            # on TPU the per-step dispatch overhead (~0.1 ms) dwarfs the
            # per-block matvec, so prefer FEWER, BIGGER blocks: nb >= 128
            # even for narrow bands (a 1D tridiagonal at nb=32 spends 4x the
            # wall of nb=128 for identical flops).
            nb = int(min(256, max(128, 1 << int(np.ceil(np.log2(max(bw, 1)))))))
        # Precision: unlike the dense tier's QR (backward-stable at any
        # precision), this LU has NO pivoting — on the indefinite shifted
        # operator A - sigma C element growth can be unbounded, and in f32 the
        # raw solve can be so wrong that iterative refinement DIVERGES
        # (measured: raw rel-residual 22 on the 1D Rijke shifted tridiagonal).
        # So 'auto' means f64 here; f32 is explicit opt-in and still guarded
        # by the stability probe below.
        self.mixed = os.environ.get("HELMHOLTZ_X_TPU_MIXED", "auto") not in (
            "auto", "0", "false", "no")
        dtype = np.float32 if self.mixed else np.float64
        if refine is None:
            refine = 3 if self.mixed else 1
        self.fac, _ = factor_banded(a, perm, nb=nb, dtype=dtype)
        self._solve_fn = banded_solve
        self._solve_H_fn = banded_solve_H
        self.n = a.shape[0]
        self.refine = refine
        self._P = a  # exact operator for no-pivot-LU iterative refinement
        self._perm = perm
        self._nb = nb
        self._probed = False
        if terms is not None:
            terms = [(complex(c), m) for c, m in terms if m is not None and c != 0]
            self._tA = terms[0][1]
            if len(terms) == 2:
                self._tB, self._cb = None, 0.0
                self._cc, self._tC = terms[1]
            else:
                self._cb, self._tB = terms[1]
                self._cc, self._tC = terms[2]
        else:
            self._tA = self._tB = self._tC = None
            self._cb = self._cc = 0.0
        self._L = self._R = self._W = self._Wh = None
        self._G = self._Gh = self._cap = self._caph = None
        self._dev = None  # cached device copies of (A, B, C) for solve_op
        self._ozP = None  # cached Ozaki-packed P for MXU refinement matvecs

    def solve_op(self):
        """Device pytree for the jitted banded Arnoldi chunks.  The CSR
        operands cross to the device ONCE (cached across calls)."""
        import jax.numpy as _jnp

        from .arnoldi import BandedSolveOp

        if self._tA is None:
            raise ValueError("banded factor built without CSR terms")
        if self._dev is None:
            self._dev = (
                csr_device(self._tA),
                csr_device(self._tB if self._tB is not None
                           else csr_empty(self.n)),
                csr_device(self._tC),
            )
        A, B, C = self._dev
        import jax as _jax

        if (self._ozP is None and not getattr(self, "_oz_skipped", False)
                and _jax.default_backend() != "cpu"
                and os.environ.get("HELMHOLTZ_X_TPU_OZAKI", "1")
                not in ("0", "false", "no")):
            # HBM gate: the bf16 chunk tensor costs ~(occupied blocks) * K *
            # nb^2 * 4 bytes; at >=200k dofs a wide-band 3D operator would
            # need ~10+ GB — skip the pack there and let refinement matvecs
            # fall back to the exact f64 CSR SpMV (gather-bound but
            # nnz-proportional).
            nb_ = int(self.fac.nb)
            nbkp_ = int(self.fac.band_re.shape[0])
            W_ = int(self.fac.W)
            est_bytes = int(0.7 * nbkp_ * (2 * W_ + 1)) * 6 * nb_ * nb_ * 4
            budget = float(os.environ.get(
                "HELMHOLTZ_X_TPU_OZAKI_MAX_GB", "3")) * (1 << 30)
            if est_bytes > budget:
                info(f"- Ozaki pack skipped ({est_bytes / 1e9:.1f} GB est > "
                     "budget); refinement matvecs use the f64 CSR SpMV.")
                self._ozP = None
                self._oz_skipped = True
            else:
                from ..ops.ozaki import pack_ozaki_band_device
                from ..utils.metrics import timed as _timed

                with _timed("ozaki_pack", n=self.n, nb=int(self.fac.nb)):
                    self._ozP, _, _, _ = pack_ozaki_band_device(
                        self._P, np.asarray(self._perm), nb=int(self.fac.nb),
                        K=6, nbkp=int(self.fac.band_re.shape[0]),
                        W=int(self.fac.W))
        k = self._L.shape[1] if self._L is not None else 0
        if k and self._cap is not None:
            wb = Woodbury(
                W=zarray(self._W), cap=zarray(self._cap), R=zarray(self._R),
                Wh=zarray(self._Wh) if self._Wh is not None
                else zarray(np.zeros((self.n, 0), complex)),
                caph=zarray(self._caph) if self._caph is not None
                else zarray(np.zeros((0, 0), complex)),
                Lc=zarray(np.conj(self._L)) if self._Wh is not None
                else zarray(np.zeros((self.n, 0), complex)),
            )
        else:
            zk = zarray(np.zeros((self.n, 0), complex))
            zkk = zarray(np.zeros((0, 0), complex))
            wb = Woodbury(zk, zkk, zk, zk, zkk, zk)
        return BandedSolveOp(
            fac=self.fac, A=A, B=B, C=C,
            cb=Z(_jnp.asarray(complex(self._cb).real), _jnp.asarray(complex(self._cb).imag)),
            cc=Z(_jnp.asarray(complex(self._cc).real), _jnp.asarray(complex(self._cc).imag)),
            wb=wb, ozP=self._ozP,
        )

    def _raw_solve(self, b: np.ndarray, hermitian: bool) -> np.ndarray:
        import jax.numpy as jnp

        from ..ops.cplx import Z

        fn = self._solve_H_fn if hermitian else self._solve_fn
        z = fn(self.fac, Z(jnp.asarray(b.real), jnp.asarray(b.imag)), self.n)
        return np.asarray(z.re) + 1j * np.asarray(z.im)

    def _probe(self, b: np.ndarray, y_raw: np.ndarray):
        """Lazy stability probe on the FIRST host-driven solve (free: reuses
        that solve's raw result + one host SpMV).  No-pivot LU element growth
        can be unbounded on the indefinite shifted operator; in f32 the raw
        solve can be so wrong that refinement DIVERGES (measured rel-residual
        22 on the 1D Rijke shifted tridiagonal), so a bad probe refactors in
        f64 / adds sweeps."""
        self._probed = True
        from ..utils.debug import check_finite

        check_finite("banded raw solve (stability probe)", y_raw)
        rel = float(np.linalg.norm(b - self._P @ y_raw) / np.linalg.norm(b))
        if not np.isfinite(rel) or rel > 0.3:
            from ..ops.banded import factor_banded

            # an f64 refactor doubles the band footprint — at >=200k-dof
            # 3D scale that exceeds HBM, so cap it and lean on refinement
            f64_bytes = 2 * 8 * int(self.fac.band_re.size)
            f64_ok = f64_bytes <= float(os.environ.get(
                "HELMHOLTZ_X_TPU_F64_BAND_MAX_GB", "8")) * (1 << 30)
            if self.mixed and f64_ok:
                info(f"! f32 banded LU unstable (probe residual {rel:.1e}); "
                     "refactoring in f64.")
                self.mixed = False
                self.fac, _ = factor_banded(self._P, self._perm, nb=self._nb,
                                            dtype=np.float64,
                                            equilibrate=True)
                y_raw = self._raw_solve(b, False)
                rel = float(np.linalg.norm(b - self._P @ y_raw)
                            / np.linalg.norm(b))
            elif self.mixed:
                info(f"! f32 banded LU weak (probe residual {rel:.1e}) and "
                     "the f64 band exceeds the HBM budget; keeping f32 + "
                     "extra refinement.")
            if not np.isfinite(rel) or rel > 0.3:
                info(f"! f64 banded LU still weak (probe residual {rel:.1e}); "
                     "adding refinement sweeps.")
                self.refine = max(self.refine, 4)
        # Refinement contracts the error by the raw relative residual per
        # sweep.  For the refactored f64 factor pick the count that reaches
        # ~1e-13 (on accelerators the fast_inv block inverses leave the raw
        # solve ~1e-3 accurate, so the old fixed refine=1 left ~1e-6 solves
        # — not enough for the projection residual gate).  QUANTIZED to two
        # buckets with a wide margin: the count feeds static jit arguments
        # of the device solve programs, and run-to-run probe jitter picking
        # 4 vs 5 sweeps would invalidate the persistent compile cache
        # (~180 s remote AOT per miss).  The mixed-f32 tier keeps its cheap
        # fixed count: basis quality is subspace-bound and the finalize
        # polish boosts accuracy where it matters.
        if not self.mixed and np.isfinite(rel) and 0 < rel < 0.3:
            self.refine = 4 if rel < 1e-2 else 8
        return y_raw

    def _solve_refined(self, b: np.ndarray, hermitian: bool) -> np.ndarray:
        b = np.asarray(b, dtype=np.complex128)
        if b.ndim == 2 and not self._probed and not hermitian:
            # run the lazy stability probe on one column, then batch the rest
            self._probe(b[:, 0], self._raw_solve(b[:, 0], False))
        op = (self._P.conj().T if hermitian else self._P)
        # multi-RHS blocks go through the banded substitution as ONE dispatch
        # per sweep (the per-block matvecs become MXU matmuls)
        y = self._raw_solve(b, hermitian)
        if not self._probed and not hermitian:
            y = self._probe(b, y)
        for _ in range(self.refine):
            y = y + self._raw_solve(b - op @ y, hermitian)
        return y

    def solve_P(self, b) -> np.ndarray:
        return self._solve_refined(b, False)

    def solve_P_H(self, b) -> np.ndarray:
        return self._solve_refined(b, True)

    def solve_P_fused(self, b: np.ndarray, nrefine: int = 6) -> np.ndarray:
        """P^{-1} b for a multi-RHS block as ONE device dispatch:
        substitution + `nrefine` refinement sweeps against the exact CSR
        operator, fused (arnoldi._solve_wbb with zero-width Woodbury).

        The host-driven `solve_P` pays a tunnel roundtrip per sweep (and
        the lazy stability probe) — ~8-10 roundtrips for a refined 16-RHS
        solve, measured as the bulk of the finalize recovery's ~11 s.  The
        Ozaki pack is skipped (CSR f64 SpMV refinement is ~50-100 ms at
        this width and needs no ~0.5 GB pack)."""
        import jax.numpy as _jnp

        saved = os.environ.get("HELMHOLTZ_X_TPU_OZAKI")
        os.environ["HELMHOLTZ_X_TPU_OZAKI"] = "0"
        try:
            sv = self.solve_op()
        finally:
            if saved is None:
                os.environ.pop("HELMHOLTZ_X_TPU_OZAKI", None)
            else:
                os.environ["HELMHOLTZ_X_TPU_OZAKI"] = saved
        b = np.asarray(b, dtype=np.complex128)
        z = _fused_wbb(sv, Z(_jnp.asarray(b.real), _jnp.asarray(b.imag)),
                       getattr(self, "herm_factor", False), nrefine)
        return np.asarray(z.re) + 1j * np.asarray(z.im)

    # Woodbury state handling identical to the host tier
    set_lowrank_factors = SparseShiftedFactor.set_lowrank_factors
    set_scale = SparseShiftedFactor.set_scale
    solve_wb = SparseShiftedFactor.solve_wb
    solve_wb_H = SparseShiftedFactor.solve_wb_H


import functools as _functools


@_functools.lru_cache(maxsize=4)
def _fused_wbb_jit(herm: bool):
    """Cached jit of the substitution+refinement solve (one wrapper per
    Hermitian-ness; jit's own cache handles shape variation).  Imported
    lazily to avoid the linsolve <-> arnoldi import cycle."""
    import jax as _jax

    from .arnoldi import _solve_wbb, _solve_wbb_T

    return _jax.jit(_solve_wbb_T if herm else _solve_wbb,
                    static_argnames=("nrefine",))


def _fused_wbb(sv, b: Z, herm: bool, nrefine: int) -> Z:
    return _fused_wbb_jit(herm)(sv, b, nrefine)


class BandedAdjointFactor(BandedShiftedFactor):
    """Banded factor for P_adj ~= P^H REUSING an existing device LU.

    The adjoint pencil's passive operator A + conj(sigma) B_adj +
    conj(sigma)^2 C is exactly the direct one's conjugate transpose (A, C
    real symmetric; B complex symmetric; B_adj = conj(B^T) by the
    reference's construction, helmholtz_x/acoustic_matrices.py:112-114), so
    its solves are the direct banded LU's Hermitian-substitution solves —
    the adjoint FPI that follows a direct solve skips the device
    factorization entirely.  ``build_shifted_factor`` also accepts NEAR
    matches (rel ~1e-9, e.g. the finalize factors at independently
    converged direct/adjoint eigenvalues): the solve then behaves like a
    slightly perturbed factorization and the iterative refinement against
    the EXACT adjoint CSR operator absorbs the difference.

    The jitted basis-build programs reach the H-substitution through the
    'h'-suffixed solve modes (arnoldi._solve_wbb_T): same LU arrays, same
    compiled-program cache geometry."""

    herm_factor = True  # build_basis/eps/pep append 'h' to the solve mode

    def __init__(self, base: BandedShiftedFactor, P_scipy, terms=None):
        import scipy.sparse as sp

        self._base = base
        self.n = base.n
        self._P = sp.csr_matrix(P_scipy)
        self.mixed = base.mixed
        self.fac = base.fac
        self._solve_fn = base._solve_fn
        self._solve_H_fn = base._solve_H_fn
        self._perm = base._perm
        self._nb = base._nb
        # the base LU's stability was (or will be) probed on ITS solves; a
        # bad probe here must never refactor the shared arrays.  Refinement
        # absorbs both the no-pivot growth and any near-match perturbation.
        self._probed = True
        self.refine = max(base.refine, 4)
        if terms is not None:
            terms = [(complex(c), m) for c, m in terms if m is not None and c != 0]
            self._tA = terms[0][1]
            if len(terms) == 2:
                self._tB, self._cb = None, 0.0
                self._cc, self._tC = terms[1]
            else:
                self._cb, self._tB = terms[1]
                self._cc, self._tC = terms[2]
        else:
            self._tA = self._tB = self._tC = None
            self._cb = self._cc = 0.0
        self._L = self._R = self._W = self._Wh = None
        self._G = self._Gh = self._cap = self._caph = None
        self._dev = None
        self._ozP = None

    def _raw_solve(self, b: np.ndarray, hermitian: bool) -> np.ndarray:
        # P_adj = P^H: forward solves are the base's H-substitutions
        return self._base._raw_solve(b, not hermitian)


# Problems with more dofs than this use the sparse tier (dense QR of the real
# embedding needs 2*(2n)^2 f64 ~ 64 n^2 bytes: 10k dofs ~ 6.4 GB).
DENSE_DOF_LIMIT = int(__import__("os").environ.get("HELMHOLTZ_X_TPU_DENSE_LIMIT", 8000))

# recent host factorizations, newest last (adjoint P^H reuse)
_recent_host_factors: list = []

# recent banded (device LU) factorizations, newest last (adjoint P^H reuse)
_recent_banded_factors: list = []

# 'auto': banded device LU on accelerators, host LU on the CPU test backend
# (the banded factor is MXU-shaped; on CPU SuperLU is the faster oracle).
SPARSE_TIER = __import__("os").environ.get("HELMHOLTZ_X_TPU_SPARSE_TIER", "auto")

# Below this many dofs the remote accelerator loses to the host
# sparse-direct tier, so 'auto' keeps such problems entirely on host (no
# device wait, no tunnel traffic).  Measured crossover on the reference
# rig (one TPU v5e behind an HTTP relay, 0.4-3 s roundtrips, 2 CPU
# cores): the 3k-dof Rijke tube runs ~1 s host vs 16.8 s tunneled, and
# at 34.8k dofs (MICCA annulus) the warm banded device solve costs ~60 s
# against SuperLU's ~16 s — the block-banded substitution is a SEQUENTIAL
# scan over ~2n/nb block rows whose per-step latency dwarfs its tiny
# matmuls, so the device only wins once the FACTORIZATION dominates
# (measured at 231k dofs: host factor 418 s).  On a locally-attached
# accelerator lower this knob; the sequential-substitution floor is the
# documented next optimization (cyclic reduction / SPIKE).
HOST_SMALL_N = int(__import__("os").environ.get("HELMHOLTZ_X_TPU_HOST_SMALL_N", 60000))


def _union_bandwidth(terms, n: int) -> int:
    """RCM bandwidth of the union sparsity of the terms (cheap, host)."""
    import scipy.sparse as sp

    from ..native import bandwidth, rcm

    pat = None
    for c, m in terms:
        if m is None or c == 0:
            continue
        ms = m.to_scipy()
        p = sp.csr_matrix((np.ones(ms.nnz), ms.indices, ms.indptr), shape=ms.shape)
        pat = p if pat is None else (pat + p)
    sym = ((pat + pat.T) > 0).astype(np.float64).tocsr()
    perm = rcm(sym.indptr.astype(np.int64), sym.indices.astype(np.int64))
    coo = sym.tocoo()
    return int(bandwidth(coo.row.astype(np.int64), coo.col.astype(np.int64), n, perm))


def build_shifted_factor(terms, n: int, register: bool = True):
    """Factor P = sum coeff_i M_i with the tier appropriate for the size and
    bandwidth.  ``register=False`` keeps the factor OUT of the adjoint-reuse
    registries (Newton's per-iteration factors are never conjugate-reused,
    and registering them pins ~2 GB of device band arrays each across
    iterations — measured as a TPU worker OOM crash in the bench extras):

    * narrow band (RCM bandwidth <= n/6) -> device block-banded f64 LU —
      the factorization is MXU-cheap and fully accurate (all 1D/2D cases and
      RCM-ordered 3D meshes land here);
    * wide band, small n -> dense tier (QR of the real embedding; f32+refined
      on TPU, f64 on CPU);
    * wide band, large n -> banded on accelerators / SuperLU host oracle on
      the CPU test backend (or forced via HELMHOLTZ_X_TPU_SPARSE_TIER).
    """
    import jax

    tier = SPARSE_TIER
    hedged_factor = None
    if tier == "auto":
        if jax.default_backend() == "cpu":
            # CPU (test backend): LAPACK dense / SuperLU are the fast oracles;
            # the banded device code is MXU-shaped and slow here.
            tier = "dense" if n <= DENSE_DOF_LIMIT else "host"
        elif n <= HOST_SMALL_N:
            # small problems: remote round-trip latency dominates; keep the
            # whole solve on host
            tier = "host"
        elif getattr(build_shifted_factor, "_sticky_host", False):
            # STICKY per process: once one solve degraded, later solves
            # stay on host even if the device binds mid-run — switching
            # tiers between a direct and its adjoint forfeits the P^H
            # factorization reuse and risks fresh device compiles.
            tier = "host"
        else:
            # degraded-mode fallback (SURVEY §5): a remote device whose
            # session bind is still pending would stall the solve for
            # minutes — degrade to the host sparse-direct tier instead.
            # HEDGE: a bind still pending this deep into a run (setup has
            # already overlapped it) usually means a server-side session
            # hold is in progress and the wait will expire — so the host
            # SuperLU factorization runs in a worker thread DURING the
            # wait (splu releases the GIL); a degraded run then finds its
            # factor already built instead of paying wait + factor
            # back to back.
            from ..utils.warmup import (cold_start_policy, device_ready,
                                        wait_device)

            hedge_thread = None
            hedge_box: dict = {}
            if not device_ready():
                import threading

                P_host = csr_weighted_scipy(terms).tocsr()

                def _hedge():
                    try:
                        hedge_box["factor"] = SparseShiftedFactor(P_host)
                    except Exception as e:  # pragma: no cover
                        hedge_box["error"] = e

                hedge_thread = threading.Thread(target=_hedge, daemon=True,
                                                name="hx-host-hedge")
                hedge_thread.start()
            if not wait_device(cold_start_policy()):
                info("! device session not ready; degrading to the host "
                     "sparse-direct tier for this factorization.")
                build_shifted_factor._sticky_host = True
                tier = "host"
                if hedge_thread is not None:
                    hedge_thread.join()
                    hedged_factor = hedge_box.get("factor")
            else:
                bw = _union_bandwidth(terms, n)
                if bw <= max(n // 6, 8) or n > DENSE_DOF_LIMIT:
                    tier = "banded"
                else:
                    tier = "dense"
    elif n <= DENSE_DOF_LIMIT and tier not in ("banded", "host"):
        tier = "dense"
    from ..utils.metrics import timed

    build_shifted_factor.last_tier = tier  # breadcrumb for bench/diagnostics
    with timed("factor", n=n, tier=tier):
        if hedged_factor is not None:
            _recent_host_factors.append(hedged_factor)
            del _recent_host_factors[:-2]
            return hedged_factor
        if tier == "dense":
            return ShiftedFactor.from_terms(terms, n)
        if tier == "banded":
            P = csr_weighted_scipy(terms).tocsr()
            # adjoint reuse: when a recent banded factor's operator is the
            # conjugate transpose of this one (direct -> adjoint sequence,
            # or the adjoint finalize at the conjugate eigenvalue), reuse
            # its device LU with Hermitian substitutions.  NEAR matches
            # (<= 1e-9 rel: finalize eigenvalues converge independently to
            # ~1e-8) are accepted — refinement against the exact operator
            # absorbs the perturbation.
            for prev in _recent_banded_factors:
                if prev._P.shape == P.shape and prev._P.nnz == P.nnz:
                    d = (P - prev._P.conj().T.tocsr())
                    rel = (abs(d).max() if d.nnz else 0.0) / abs(P).max()
                    if rel <= 1e-9:
                        info("- reusing the direct device LU for the "
                             "adjoint operator (P_adj = P^H).")
                        build_shifted_factor.last_tier = "banded(adjoint-reuse)"
                        return BandedAdjointFactor(prev, P, terms=terms)
            factor = BandedShiftedFactor(P, terms=terms)
            if register:
                _recent_banded_factors.append(factor)
                del _recent_banded_factors[:-2]  # bound memory: keep 2 newest
            # geometry breadcrumb for solve-level FLOP/MFU accounting
            # (bench.py detail; utils/flops.py formulas)
            build_shifted_factor.last_geometry = (
                int(factor.fac.band_re.shape[0]), int(factor.fac.W),
                int(factor.fac.nb))
            return factor
        P = csr_weighted_scipy(terms).tocsr()
        # adjoint reuse: if a recent host factor's operator is exactly the
        # conjugate transpose of this one (direct -> adjoint sequence),
        # reuse its SuperLU factorization with swapped transpose flags.
        # When it is also the elementwise CONJUGATE (P symmetric — always
        # true for these FEM operators), the faster conj-of-forward-solve
        # mode applies (see HostAdjointFactor.conj_mode).
        for prev in _recent_host_factors:
            if prev._P.shape == P.shape and prev._P.nnz == P.nnz:
                tol = 1e-14 * abs(P).max()
                dc = (P - prev._P.conj())
                if (abs(dc).max() if dc.nnz else 0.0) <= tol:
                    info("- reusing the direct factorization for the "
                         "adjoint operator (P_adj = conj(P), symmetric).")
                    build_shifted_factor.last_tier = "host(adjoint-reuse)"
                    return HostAdjointFactor(prev, P, conj_mode=True)
                d = (P - prev._P.conj().T.tocsr())
                if (abs(d).max() if d.nnz else 0.0) <= tol:
                    info("- reusing the direct factorization for the "
                         "adjoint operator (P_adj = P^H).")
                    build_shifted_factor.last_tier = "host(adjoint-reuse)"
                    return HostAdjointFactor(prev, P)
        factor = SparseShiftedFactor(P)
        if register:
            _recent_host_factors.append(factor)
            del _recent_host_factors[:-2]  # bound memory: keep 2 newest
        return factor
