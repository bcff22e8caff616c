"""Dark-channel dehazing / darkfield sectioning toolkit.

TPU-native reimplementation of the reference standalone module
(`utils/darkfield.py:1-518`: ``dehaze_fast2``, ``dark_sectioning``,
``guided_filter`` — CuPy): the guided filter is a sequence of box filters
(separable cumulative sums — pure VPU work), and the dehazing follows the
dark-channel-prior recipe: dark channel → atmospheric light → transmission
→ guided-filter refinement → radiance recovery.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _box_filter_1d(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Mean filter along one axis via padded cumulative sums."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius + 1, radius)
    padded = jnp.pad(x, pad, mode="edge")
    csum = jnp.cumsum(padded, axis=axis)
    hi = jax.lax.slice_in_dim(csum, 2 * radius + 1, 2 * radius + 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(csum, 0, n, axis=axis)
    return (hi - lo) / (2 * radius + 1)


def box_filter(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """2D mean filter over the trailing two axes."""
    x = _box_filter_1d(x, radius, axis=-2)
    return _box_filter_1d(x, radius, axis=-1)


@partial(jax.jit, static_argnames=("radius",))
def guided_filter(
    guide: jnp.ndarray, src: jnp.ndarray, radius: int = 15, eps: float = 1e-3
) -> jnp.ndarray:
    """He et al. guided filter (edge-preserving smoothing of ``src`` guided
    by ``guide``; reference `darkfield.guided_filter`)."""
    guide = guide.astype(jnp.float32)
    src = src.astype(jnp.float32)
    mean_i = box_filter(guide, radius)
    mean_p = box_filter(src, radius)
    corr_ip = box_filter(guide * src, radius)
    corr_ii = box_filter(guide * guide, radius)
    var_i = corr_ii - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box_filter(a, radius) * guide + box_filter(b, radius)


@partial(jax.jit, static_argnames=("patch_radius", "guided_radius"))
def dehaze_fast2(
    image: jnp.ndarray,
    *,
    patch_radius: int = 7,
    omega: float = 0.95,
    t_min: float = 0.1,
    guided_radius: int = 30,
    guided_eps: float = 1e-3,
    atmosphere_percentile: float = 99.9,
) -> jnp.ndarray:
    """Single-plane dark-channel dehazing (reference `dehaze_fast2`):
    remove the out-of-focus haze floor from a fluorescence plane."""
    img = image.astype(jnp.float32)
    peak = jnp.maximum(jnp.percentile(img, 99.99), 1e-6)
    norm = img / peak
    # dark channel: local minimum (erosion) over a (2r+1)² window
    dark = -jax.lax.reduce_window(
        -norm,
        -jnp.inf,
        jax.lax.max,
        (2 * patch_radius + 1, 2 * patch_radius + 1),
        (1, 1),
        "SAME",
    )
    atmosphere = jnp.percentile(norm, atmosphere_percentile)
    transmission = 1.0 - omega * dark / jnp.maximum(atmosphere, 1e-6)
    transmission = guided_filter(norm, transmission, guided_radius, guided_eps)
    transmission = jnp.maximum(transmission, t_min)
    radiance = (norm - atmosphere) / transmission + atmosphere
    return jnp.clip(radiance, 0.0, None) * peak


def dark_sectioning(volume: np.ndarray, **kwargs) -> np.ndarray:
    """Per-plane dehazing of a 3D stack (reference `dark_sectioning`)."""
    vol = jnp.asarray(volume, jnp.float32)
    out = jax.vmap(lambda p: dehaze_fast2(p, **kwargs))(vol)
    return np.asarray(out, np.float32)
