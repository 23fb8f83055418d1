"""FLOP accounting and MFU (model-FLOP-utilization) reporting.

The round-4 verdict's missing item #2: the perf story was framed purely in
nnz/s, leaving achieved FLOP/s and %-of-peak to be reverse-engineered from
ms/matvec.  This module centralizes

* the TPU v5e (lite) single-chip peaks the rig benches against, and
* closed-form FLOP counts for the framework's hot kernels (complex
  arithmetic counted as its real-flop cost: one complex multiply-add = 8
  real flops, a complex (m,k)x(k,n) matmul = 8*m*k*n),

so `bench_spmv.py` can print an MFU column and `bench.py` can attach a
solve-level aggregate to the driver JSON.

Peaks (public TPU v5e datasheet / jax-ml scaling-book numbers): one v5e
chip = one TensorCore with 197 TFLOP/s dense bf16 MXU throughput, ~0.25x
that for fp32 VPU vector work, and 819 GB/s HBM bandwidth.  MFU is quoted
against the peak that bounds the kernel's arithmetic path: bf16 MXU for the
Ozaki/banded matmuls, f32 VPU for the double-single compensated kernels,
HBM bytes for gather-bound CSR.
"""

from __future__ import annotations

MXU_BF16_PEAK = 197e12  # FLOP/s, dense bf16 matmul (v5e datasheet)
VPU_F32_PEAK = 197e12 / 40  # FLOP/s, vector f32 (8x128 lanes x ~4 ALUs @ .94 GHz)
HBM_BW_PEAK = 819e9  # bytes/s

CMUL = 6  # real flops per complex multiply (4 mul + 2 add)
CMADD = 8  # real flops per complex multiply-add


def csr_spmv_flops(nnz: int) -> int:
    """Complex CSR SpMV: one complex multiply-add per stored nonzero."""
    return CMADD * nnz


def banded_substitute_flops(nbkp: int, W: int, nb: int, ncol: int = 1) -> int:
    """Forward + backward block substitution (ops/banded.banded_solve):
    per block row, W lower matvecs + W upper matvecs + 1 diagonal-inverse
    matvec, each a complex (nb,nb)x(nb,ncol) matmul."""
    return nbkp * (2 * W + 1) * CMADD * nb * nb * ncol


def banded_factor_flops(nbk: int, W: int, nb: int) -> int:
    """Right-looking block LU (ops/banded._factor_band): per step one
    (2nb)^3 real-embedding inverse (QR ~ 4/3 (2nb)^3 + triangular solve),
    W complex L-block matmuls and W^2 complex Schur updates."""
    inv = 4 * (2 * nb) ** 3  # QR + solve_triangular + Newton polish, approx
    return nbk * (inv + (W + W * W) * CMADD * nb ** 3)


def ozaki_spmm_flops(nblk: int, K: int, nb: int, ncol: int) -> int:
    """Ozaki bit-sliced SpMM (ops/ozaki): per nonzero block, K(K+1)/2
    chunk-pair bf16 MXU dots for each of Ar and Ai against the joint
    [xr|xi] block (ncol columns = 2*nrhs), each dot 2*nb*nb*ncol flops."""
    pairs = K * (K + 1) // 2
    return nblk * 2 * pairs * 2 * nb * nb * ncol


def ds_band_flops(nslots: int, nb: int) -> int:
    """Double-single (f32x2) compensated band kernel: ~100 f32 flops per
    stored complex band slot element (Dekker TwoProd + Knuth TwoSum tree,
    docs/BENCH_NOTES round-4 measurement)."""
    return 100 * nslots * nb * nb


def mfu(flops: float, seconds: float, peak: float = MXU_BF16_PEAK) -> float:
    """Fraction of the given peak achieved (0..1)."""
    if seconds <= 0:
        return 0.0
    return flops / seconds / peak
