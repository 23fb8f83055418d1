"""Complex arithmetic as explicit (re, im) f64 pairs.

TPUs have no complex128 support (and this backend has no complex64 linalg
either), so every complex array in the compute path is a :class:`Z` pair of
real f64 arrays.  ``Z`` is a NamedTuple and therefore a JAX pytree: it can be
passed through ``jit``/``vmap``/``lax`` unchanged, and all ops below are
jittable on TPU and CPU alike.

Scalars travel as python ``complex`` on the host side and as 0-d ``Z`` on the
device side; :func:`zs` converts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Z(NamedTuple):
    """A complex array stored as a (re, im) pair of real arrays."""

    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.re) + 1j * np.asarray(self.im)

    def __neg__(self) -> "Z":
        return Z(-self.re, -self.im)


def zarray(x, dtype=jnp.float64) -> Z:
    """Build a Z from any numpy/jax array or python scalar (possibly complex)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return Z(jnp.asarray(x.real, dtype=dtype), jnp.asarray(x.imag, dtype=dtype))
    zr = jnp.asarray(x, dtype=dtype)
    return Z(zr, jnp.zeros_like(zr))


def zs(c: complex, dtype=jnp.float64) -> Z:
    """Complex python scalar -> 0-d Z."""
    c = complex(c)
    return Z(jnp.asarray(c.real, dtype=dtype), jnp.asarray(c.imag, dtype=dtype))


def zzeros(shape, dtype=jnp.float64) -> Z:
    return Z(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def zadd(a: Z, b: Z) -> Z:
    return Z(a.re + b.re, a.im + b.im)


def zsub(a: Z, b: Z) -> Z:
    return Z(a.re - b.re, a.im - b.im)


def zmul(a: Z, b: Z) -> Z:
    """Elementwise (broadcasting) complex multiply."""
    return Z(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def zconj(a: Z) -> Z:
    return Z(a.re, -a.im)


def zscale(a: Z, s) -> Z:
    """Multiply by a scalar (python complex/real or 0-d Z)."""
    if isinstance(s, Z):
        return zmul(a, s)
    s = complex(s)
    if s.imag == 0.0:
        return Z(a.re * s.real, a.im * s.real)
    return Z(a.re * s.real - a.im * s.imag, a.re * s.imag + a.im * s.real)


def zdiv(a: Z, b: Z) -> Z:
    d = b.re * b.re + b.im * b.im
    return Z((a.re * b.re + a.im * b.im) / d, (a.im * b.re - a.re * b.im) / d)


def zabs2(a: Z) -> jnp.ndarray:
    return a.re * a.re + a.im * a.im


def zabs(a: Z) -> jnp.ndarray:
    return jnp.sqrt(zabs2(a))


def zdotc(a: Z, b: Z) -> Z:
    """Conjugated dot product  conj(a) . b  (vectors) -> 0-d Z."""
    return Z(
        jnp.sum(a.re * b.re + a.im * b.im),
        jnp.sum(a.re * b.im - a.im * b.re),
    )


def zdotu(a: Z, b: Z) -> Z:
    """Unconjugated dot product  a . b  -> 0-d Z."""
    return Z(
        jnp.sum(a.re * b.re - a.im * b.im),
        jnp.sum(a.re * b.im + a.im * b.re),
    )


def znorm(a: Z) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(zabs2(a)))


def zmatvec(A: Z, x: Z) -> Z:
    """Dense complex matvec via 4 real matvecs (MXU-friendly)."""
    return Z(A.re @ x.re - A.im @ x.im, A.re @ x.im + A.im @ x.re)


def zmatmat(A: Z, B: Z) -> Z:
    return Z(A.re @ B.re - A.im @ B.im, A.re @ B.im + A.im @ B.re)


def zvecmat_c(y: Z, A: Z) -> Z:
    """y^H A  (row-vector result) for matrices of columns, i.e. conj(y)^T A."""
    yc = zconj(y)
    return Z(yc.re @ A.re - yc.im @ A.im, yc.re @ A.im + yc.im @ A.re)


def zouter(a: Z, b: Z) -> Z:
    """Unconjugated outer product a b^T."""
    return Z(
        jnp.outer(a.re, b.re) - jnp.outer(a.im, b.im),
        jnp.outer(a.re, b.im) + jnp.outer(a.im, b.re),
    )


def zsqrt_scalar(c: complex) -> complex:
    """Principal branch sqrt of a host-side complex scalar (numpy semantics)."""
    return complex(np.sqrt(complex(c)))


def embed_real(A: Z) -> jnp.ndarray:
    """Real 2n x 2n embedding [[Re, -Im], [Im, Re]] of a complex matrix.

    Satisfies embed(A) @ [xr; xi] = [(Ax)r; (Ax)i] and
    embed(A^H) == embed(A).T, so a transpose-solve on the embedding is a
    conjugate-transpose solve on the complex matrix.
    """
    top = jnp.concatenate([A.re, -A.im], axis=1)
    bot = jnp.concatenate([A.im, A.re], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def embed_vec(x: Z) -> jnp.ndarray:
    return jnp.concatenate([x.re, x.im], axis=0)


def unembed_vec(v: jnp.ndarray) -> Z:
    n = v.shape[0] // 2
    return Z(v[:n], v[n:])
