"""Image-processing utilities (reference `utils/imageprocessing.py:1-237`).

Hot-pixel replacement and anisotropic downsampling live in
:mod:`merfish3d_tpu.ops.filters` (device kernels); this module adds the
shading (flatfield) estimation that the reference delegates to BaSiCPy
(`estimate_shading:90-119`), reimplemented as an alternating low-rank +
smoothness estimator in JAX.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.filters import (  # re-exported for API parity
    downsample_image_anisotropic,
    replace_hot_pixels,
)

__all__ = [
    "replace_hot_pixels",
    "downsample_axis",
    "downsample_image_anisotropic",
    "estimate_shading",
    "apply_shading_correction",
]


def downsample_axis(image: np.ndarray, level: int = 2, axis: int = 0) -> np.ndarray:
    """Mean-downsample one axis by an integer factor, averaging the partial
    tail block over its actual length (reference
    `utils/imageprocessing.py:148-237`, numba prange → vectorized
    ``np.add.reduceat``). Output dtype matches the input (int dtypes
    truncate, as in the reference)."""
    image = np.asarray(image)
    n = image.shape[axis]
    starts = np.arange(0, n, level)
    sums = np.add.reduceat(image.astype(np.float64), starts, axis=axis)
    counts = np.minimum(starts + level, n) - starts
    shape = [1] * image.ndim
    shape[axis] = len(starts)
    return (sums / counts.reshape(shape)).astype(image.dtype)


def estimate_shading(
    images: np.ndarray,
    *,
    smooth_sigma: float = 32.0,
    n_iterations: int = 8,
) -> np.ndarray:
    """Estimate a multiplicative flatfield from a stack of images of the
    same channel (BaSiC-style: the flatfield is the smooth multiplicative
    field S such that image_i ≈ S · content_i).

    Robust iteration: take the per-pixel median across images, then
    alternate between (a) heavy Gaussian smoothing of the field estimate
    and (b) rescaling by the per-image robust residual, normalizing the
    field to unit mean (reference `estimate_shading:90-119` semantics:
    returns the flatfield to divide by).
    """
    from ..ops.filters import gaussian_lowpass

    stack = np.asarray(images, np.float32)
    if stack.ndim == 2:
        stack = stack[None]
    if stack.ndim == 4:  # (N, Z, Y, X) → max project
        stack = stack.max(axis=1)
    med = jnp.asarray(np.median(stack, axis=0))

    smooth = lambda f: gaussian_lowpass(
        f[None], sigma=(0.0, smooth_sigma, smooth_sigma)
    )[0]
    # one heavy smooth, then multiplicative residual refinement (the field
    # itself is only smoothed once — repeated smoothing would flatten it)
    field = smooth(med)
    for _ in range(max(0, n_iterations - 1)):
        ratio = med / jnp.maximum(field, 1e-6)
        field = field * smooth(ratio)
    field = np.asarray(field)
    field = field / max(field.mean(), 1e-6)
    return np.clip(field, 0.05, None).astype(np.float32)


def apply_shading_correction(image: np.ndarray, flatfield: np.ndarray) -> np.ndarray:
    """Divide out the flatfield (broadcast over leading axes)."""
    img = np.asarray(image, np.float32)
    return (img / np.maximum(flatfield, 1e-6)).astype(np.float32)
