"""Symmetric Gauss quadrature rules on simplices (barycentric coordinates).

Weights sum to 1 (rules integrate f -> |K| * sum_q w_q f(xi_q)).  Only the
degrees the four fixed Helmholtz forms need are provided — the reference
reaches these rules through UFL/FFCx-generated kernels (reference:
helmholtz_x/flame_matrices.py:199-200); here they are explicit tables.
"""

from __future__ import annotations

import numpy as np

_S3 = np.sqrt(3.0)
_S15 = np.sqrt(15.0)


def simplex_rule(dim: int, degree: int):
    """Return (points, weights): points (nq, dim+1) barycentric, weights (nq,)."""
    if dim == 1:
        if degree <= 2:
            a = 0.5 * (1 - 1 / _S3)
            pts = np.array([[1 - a, a], [a, 1 - a]])
            return pts, np.array([0.5, 0.5])
        # 3-point Gauss (degree 5)
        b = 0.5 * (1 - np.sqrt(3.0 / 5.0))
        pts = np.array([[1 - b, b], [0.5, 0.5], [b, 1 - b]])
        return pts, np.array([5 / 18, 8 / 18, 5 / 18])
    if dim == 2:
        if degree <= 2:
            pts = np.array([[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]])
            return pts, np.full(3, 1 / 3)
        # degree 4: Dunavant 6-point
        a1, w1 = 0.445948490915965, 0.223381589678011
        a2, w2 = 0.091576213509771, 0.109951743655322
        pts = []
        wts = []
        for a, w in ((a1, w1), (a2, w2)):
            for p in ([1 - 2 * a, a, a], [a, 1 - 2 * a, a], [a, a, 1 - 2 * a]):
                pts.append(p)
                wts.append(w)
        return np.array(pts), np.array(wts)
    if dim == 3:
        if degree <= 2:
            a = 0.5854101966249685
            b = 0.1381966011250105
            pts = np.array([
                [a, b, b, b], [b, a, b, b], [b, b, a, b], [b, b, b, a]])
            return pts, np.full(4, 0.25)
        # degree 4: Keast 14-point rule
        pts = []
        wts = []
        a1, w1 = 0.3108859192633005, 0.1126879257180162
        for p in _perm31(a1):
            pts.append(p)
            wts.append(w1)
        a2, w2 = 0.0927352503108912, 0.0734930431163619
        for p in _perm31(a2):
            pts.append(p)
            wts.append(w2)
        a3, w3 = 0.0455037041256497, 0.0425460207770812
        for p in _perm22(a3):
            pts.append(p)
            wts.append(w3)
        return np.array(pts), np.array(wts)
    raise ValueError(f"unsupported dim {dim}")


def _perm31(a):
    b = 1 - 3 * a
    return [[b, a, a, a], [a, b, a, a], [a, a, b, a], [a, a, a, b]]


def _perm22(a):
    b = 0.5 - a
    out = []
    idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for i, j in idx:
        p = [b, b, b, b]
        p[i] = a
        p[j] = a
        out.append(p)
    return out


def collapsed_rule(dim: int, npts_1d: int):
    """Collapsed (Duffy) tensor Gauss rule on the simplex: exactness grows
    with npts_1d, points differ from the symmetric tables above.  Used to
    PROVE quadrature convergence of assembled operators (the deg-2 gates pin
    values that are converged under refinement of this rule; residual
    deviation from the reference is then the reference's FFCx quadrature
    estimate, not ours)."""
    x, w = np.polynomial.legendre.leggauss(npts_1d)
    x = 0.5 * (x + 1.0)
    w = 0.5 * w
    if dim == 1:
        pts = np.stack([1 - x, x], axis=1)
        return pts, w
    if dim == 2:
        P, W = [], []
        for a, wa in zip(x, w):
            for b, wb in zip(x, w):
                u = a
                v = b * (1 - a)
                P.append([1 - u - v, u, v])
                W.append(wa * wb * (1 - a))
        P, W = np.array(P), np.array(W)
        return P, W / W.sum()
    if dim == 3:
        P, W = [], []
        for a, wa in zip(x, w):
            for b, wb in zip(x, w):
                for c, wc in zip(x, w):
                    u = a
                    v = b * (1 - a)
                    t = c * (1 - a) * (1 - b)
                    P.append([1 - u - v - t, u, v, t])
                    W.append(wa * wb * wc * (1 - a) ** 2 * (1 - b))
        P, W = np.array(P), np.array(W)
        return P, W / W.sum()
    raise ValueError(f"unsupported dim {dim}")
