"""Mixed-radix matmul FFT: 3D complex DFTs as MXU matmuls.

XLA's TPU FFT lowering measured ~310 GFLOP/s on a production RLGC shape
(53 ms for an rfftn+irfftn pair at (48, 1152, 1152)) — far below both the
HBM bound and the MXU. A Cooley-Tukey split N = N1·N2 with *balanced*
factors turns each 1D DFT into two dense matmuls plus a twiddle:

    X[k1 + N1·k2] = Σ_q W_N^{q·k1} · DFT_{N2}[q, k2] ·
                    (Σ_p DFT_{N1}[k1, p] · x[N2·p + q])

With N1 ≈ N2 ≈ √N the FLOP count is ~N·(N1+N2) per line — ~8× a true
FFT — but every FLOP is an MXU matmul FLOP instead of a vector-shuffle
lowering, and each axis is exactly two fused einsum passes over the
volume.  For the RLGC paddings (2,3-smooth sizes ≤ ~2k) this wins
outright; it also removes the dependence on the backend FFT custom call.

Used by :mod:`ops.rlgc` through :func:`ops.fftutils` dispatch (TPU:
matmul FFT; CPU: ``jnp.fft`` — identical math, validated against each
other in ``tests/test_mmfft.py``).

Complex arrays are complex64 throughout; DFT/twiddle matrices are baked
as constants per (length, sign).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _balanced_split(n: int) -> tuple[int, int]:
    """Largest divisor of n that is <= sqrt(n) (balanced CT split)."""
    best = 1
    d = 1
    while d * d <= n:
        if n % d == 0:
            best = d
        d += 1
    return best, n // best


@lru_cache(maxsize=None)
def _dft_matrix(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


@lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, sign: float) -> np.ndarray:
    k1 = np.arange(n1)
    q = np.arange(n2)
    return np.exp(
        sign * 2j * np.pi * np.outer(k1, q) / (n1 * n2)
    ).astype(np.complex64)


def _fft_last_axis(x: jnp.ndarray, sign: float) -> jnp.ndarray:
    """DFT along the last axis via a balanced 2-level Cooley-Tukey with
    matmul butterflies. Falls back to a single dense DFT matmul for prime
    or small lengths."""
    n = x.shape[-1]
    n1, n2 = _balanced_split(n)
    if n1 == 1:
        return jnp.einsum(
            "kp,...p->...k",
            jnp.asarray(_dft_matrix(n, sign)),
            x,
            preferred_element_type=jnp.complex64,
        )
    batch = x.shape[:-1]
    # n = n2*p + q  (p < n1, q < n2)
    xr = x.reshape(*batch, n1, n2)
    inner = jnp.einsum(
        "kp,...pq->...kq",
        jnp.asarray(_dft_matrix(n1, sign)),
        xr,
        preferred_element_type=jnp.complex64,
    )
    inner = inner * jnp.asarray(_twiddle(n1, n2, sign))
    # result index k = k1 + n1*k2 → lay out as (k2, k1) then ravel
    out = jnp.einsum(
        "...kq,qm->...mk",
        inner,
        jnp.asarray(_dft_matrix(n2, sign)),
        preferred_element_type=jnp.complex64,
    )
    return out.reshape(*batch, n)


def _transform_axis(x: jnp.ndarray, axis: int, sign: float) -> jnp.ndarray:
    axis = axis % x.ndim
    if axis == x.ndim - 1:
        return _fft_last_axis(x, sign)
    x = jnp.moveaxis(x, axis, -1)
    x = _fft_last_axis(x, sign)
    return jnp.moveaxis(x, -1, axis)


def fftn(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    """Forward N-D DFT (matmul lowering), matching ``jnp.fft.fftn``."""
    x = x.astype(jnp.complex64)
    if axes is None:
        axes = range(x.ndim)
    for ax in axes:
        x = _transform_axis(x, ax, -1.0)
    return x


def ifftn(x: jnp.ndarray, axes=None) -> jnp.ndarray:
    """Inverse N-D DFT (matmul lowering), matching ``jnp.fft.ifftn``."""
    x = x.astype(jnp.complex64)
    if axes is None:
        axes = range(x.ndim)
    scale = 1.0
    for ax in axes:
        x = _transform_axis(x, ax, +1.0)
        scale *= x.shape[ax]
    return x / scale
