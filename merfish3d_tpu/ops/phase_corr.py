"""Phase cross-correlation registration on TPU.

TPU-native replacement for cuCIM's ``phase_cross_correlation``
(used by the reference at `multiview_registration.py:289-310,624-832`):

- cross-power spectrum (phase normalization) + argmax for the integer shift,
- Guizar-Sicairos upsampled-DFT subpixel refinement expressed as dense
  matrix products (MXU work, no host round-trip),
- candidate disambiguation via masked normalized cross-correlation over the
  2^d (shift, shift-size) sign candidates, evaluated with static-shape
  circular rolls + validity masks (replaces skimage's dynamic slicing).

Shift convention matches skimage: the returned "push" shift applied to
``moving`` (e.g. ``scipy.ndimage.shift``) aligns it to ``fixed``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _cross_power_spectrum(fixed: jnp.ndarray, moving: jnp.ndarray) -> jnp.ndarray:
    F = jnp.fft.fftn(fixed.astype(jnp.float32))
    M = jnp.fft.fftn(moving.astype(jnp.float32))
    R = F * jnp.conj(M)
    mag = jnp.abs(R)
    return R / jnp.maximum(mag, 1e-20)


def _integer_peak(corr_abs: jnp.ndarray) -> jnp.ndarray:
    """Argmax of |ifft| unwrapped to signed shifts."""
    flat_idx = jnp.argmax(corr_abs)
    idx = jnp.unravel_index(flat_idx, corr_abs.shape)
    shape = jnp.asarray(corr_abs.shape)
    idx = jnp.stack(idx).astype(jnp.float32)
    return jnp.where(idx > shape // 2, idx - shape, idx)


def _upsampled_dft(
    cross_power: jnp.ndarray,
    shifts: jnp.ndarray,
    upsample_factor: int,
) -> jnp.ndarray:
    """Refine the peak on an upsampled local DFT grid (Guizar-Sicairos).

    The local inverse DFT around the coarse peak is a chain of small dense
    matmuls over the frequency axes — ideal MXU work.
    """
    up = float(upsample_factor)
    region = int(np.ceil(up * 1.5))
    dftshift = region // 2

    data = cross_power
    ndim = data.ndim
    # Contract one frequency axis at a time: result[r, ...] over region samples
    for axis in range(ndim):
        n = data.shape[0]  # current leading axis (we roll axes as we go)
        freqs = jnp.fft.fftfreq(n)  # cycles/sample
        sample_pos = (
            jnp.arange(region, dtype=jnp.float32) - dftshift
        ) / up + shifts[axis]
        # kernel[r, f] = exp(2πi * freqs[f] * sample_pos[r]) — evaluates the
        # inverse DFT at arbitrary fractional sample positions
        kernel = jnp.exp(
            2j * jnp.pi * sample_pos[:, None] * freqs[None, :]
        ).astype(jnp.complex64)
        data = jnp.tensordot(kernel, data, axes=([1], [0]))
        # move the new region axis to the back so axis 0 is the next freq axis
        data = jnp.moveaxis(data, 0, -1)
    # data now has shape (region,)*ndim in axis order matching input
    local = jnp.abs(data)
    flat = jnp.argmax(local)
    loc = jnp.stack(jnp.unravel_index(flat, local.shape)).astype(jnp.float32)
    return shifts + (loc - dftshift) / up


def _masked_ncc_for_shift(
    fixed: jnp.ndarray, moving: jnp.ndarray, shift: jnp.ndarray
) -> jnp.ndarray:
    """Normalized cross-correlation of the valid overlap after rolling
    ``moving`` by ``shift`` (static shapes: roll + validity mask)."""
    ndim = fixed.ndim
    ishift = jnp.round(shift).astype(jnp.int32)
    rolled = moving
    mask = jnp.ones(fixed.shape, jnp.float32)
    for ax in range(ndim):
        rolled = jnp.roll(rolled, ishift[ax], axis=ax)
        n = fixed.shape[ax]
        pos = jax.lax.broadcasted_iota(jnp.int32, fixed.shape, ax)
        s = ishift[ax]
        valid = jnp.where(s >= 0, pos >= s, pos < n + s)
        mask = mask * valid.astype(jnp.float32)
    w = jnp.maximum(jnp.sum(mask), 1.0)
    fm = jnp.sum(fixed * mask) / w
    mm = jnp.sum(rolled * mask) / w
    fc = (fixed - fm) * mask
    mc = (rolled - mm) * mask
    denom = jnp.sqrt(jnp.sum(fc * fc) * jnp.sum(mc * mc))
    return jnp.sum(fc * mc) / jnp.maximum(denom, 1e-12)


@partial(jax.jit, static_argnames=("upsample_factor", "disambiguate"))
def phase_cross_correlation(
    fixed: jnp.ndarray,
    moving: jnp.ndarray,
    upsample_factor: int = 10,
    disambiguate: bool = True,
) -> jnp.ndarray:
    """Estimate the (push) translation aligning ``moving`` to ``fixed``.

    Returns float32 shifts, one per axis, subpixel-refined when
    ``upsample_factor > 1``.
    """
    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    R = _cross_power_spectrum(fixed, moving)
    corr = jnp.fft.ifftn(R)
    shift = _integer_peak(jnp.abs(corr))

    if disambiguate:
        # all 2^d sign-wrap candidates: shift or shift -/+ size
        ndim = fixed.ndim
        shape = jnp.asarray(fixed.shape, jnp.float32)
        cands = []
        for bits in range(2**ndim):
            alt = []
            for ax in range(ndim):
                s = shift[ax]
                if (bits >> ax) & 1:
                    s = jnp.where(s >= 0, s - shape[ax], s + shape[ax])
                alt.append(s)
            cands.append(jnp.stack(alt))
        cands = jnp.stack(cands)  # (2^d, d)
        nccs = jax.vmap(lambda s: _masked_ncc_for_shift(fixed, moving, s))(cands)
        shift = cands[jnp.argmax(nccs)]

    if upsample_factor > 1:
        shift = jnp.round(shift * upsample_factor) / upsample_factor
        shift = _upsampled_dft(R, shift, upsample_factor)
    return shift.astype(jnp.float32)


def overlap_slices_after_translation(
    shape, translation_px
) -> tuple[slice, ...] | None:
    """Output slices whose translated coordinates stay inside the input
    (reference `multiview_registration.py:83-113`). Host-side helper."""
    slices = []
    for axis_size, t in zip(shape, translation_px):
        start = int(np.ceil(max(0.0, -float(t))))
        stop = int(np.floor(min(float(axis_size), float(axis_size) - float(t))))
        if stop <= start:
            return None
        slices.append(slice(start, stop))
    return tuple(slices)
