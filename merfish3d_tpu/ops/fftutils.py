"""FFT sizing, linear-convolution padding, and cached FFT convolution.

TPU-native equivalents of the reference FFT helpers
(reference `utils/rlgc.py:73-360`): 2,3-smooth FFT sizes, symmetric
linear-convolution padding, centered/ifftshifted PSF embedding, and
``irfftn(rfftn(x) * H)`` convolution. Under jit, XLA preplans the FFTs, so no
explicit plan caching is needed (the reference caches cuFFT buffers).

All functions are pure and shape-static, so they can live inside
``lax.while_loop`` bodies and be vmapped over a leading batch axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _next_23_smooth(x: int) -> int:
    """Smallest 2,3-smooth integer >= x with at most 3^3 in the factor 3
    (reference `rlgc.py:73-103` uses plain 2,3-smooth sizes for cuFFT).

    The extra constraint is TPU-specific: XLA's TPU FFT chokes on sizes
    dominated by radix 3 (a 2048-px camera frame pads to 2062, whose
    smallest plain 2,3-smooth cover is 2187 = 3^7 — the compile fails
    outright; capping the 3-exponent picks 2304 = 2^8 * 3^2 instead).
    Sizes used throughout the tests and benchmarks (48, 1152, ...) are
    unchanged by the cap.
    """
    if x <= 1:
        return 1
    n = int(x)
    while True:
        m = n
        while m % 2 == 0:
            m //= 2
        threes = 0
        while m % 3 == 0:
            m //= 3
            threes += 1
        if m == 1 and threes <= 3:
            return n
        n += 1


def _matmul_line_cost(n: int) -> int:
    """MACs per element of a length-n line under the matmul FFT
    (`ops/mmfft.py`): dense n below the dense cutoff, n1+n2 for the
    Cooley-Tukey split (`mmfft.fft_axis_split` policy)."""
    from .mmfft import _DENSE_MAX, fft_axis_split

    n1, n2 = fft_axis_split(n)
    if n <= _DENSE_MAX or n1 == 1:
        return n
    return n1 + n2


def next_smooth_fft_size(x: int) -> int:
    """Best FFT-padded axis length >= x for the active implementation.

    XLA FFT path: 2,3-smooth cover (:func:`_next_23_smooth`). Matmul FFT
    path: small axes round to a multiple of 8 (sublane-friendly dense
    MXU matmul); large axes prefer the smallest n1·128 length the fused
    single-pass Pallas kernels accept (`ops/pfft.py`) whenever it does
    not exceed BOTH the 2,3-smooth cover and ~1.15·x — one HBM sweep per
    axis beats a slightly smaller volume at 2-3 sweeps, so a lane length
    at or below the cover always wins, and one up to 15% past the
    request still wins when the cover is smaller — otherwise the
    cheapest balanced composite in [x, cover].
    """
    if x <= 1:
        return 1
    cover = _next_23_smooth(x)
    if not use_matmul_fft():
        return cover
    from .mmfft import _DENSE_MAX
    from . import pfft

    if x <= _DENSE_MAX:
        return min(((int(x) + 7) // 8) * 8, cover)
    lane = ((int(x) + 127) // 128) * 128
    if pfft.supported_ct_axis(lane) and lane <= max(cover, int(x * 1.15)):
        return lane
    return min(
        range(int(x), cover + 1),
        key=lambda n: (n * _matmul_line_cost(n), n),
    )


def axis_linear_fft_padding(
    length: int, psf_support: int, halo_multiplier: int = 1
) -> tuple[int, int]:
    """Per-axis (before, after) padding: PSF halo + growth to a smooth FFT
    size (reference `rlgc.py:105-135`)."""
    halo = max((int(psf_support) // 2) * int(halo_multiplier), 0)
    length_with_halo = length + 2 * halo
    new_length = next_smooth_fft_size(length_with_halo)
    fft_extra = new_length - length_with_halo
    pad_before = halo + fft_extra // 2
    pad_after = halo + fft_extra - fft_extra // 2
    return pad_before, pad_after


PadWidth = tuple[tuple[int, int], tuple[int, int], tuple[int, int]]


def linear_fft_pad_width(
    image_shape: tuple[int, int, int],
    psf_shape: tuple[int, int, int],
    pad_yx: bool = True,
) -> PadWidth:
    """Static pad widths for linear FFT conv (reference `rlgc.py:136-176`)."""
    pad_z = axis_linear_fft_padding(image_shape[0], psf_shape[0])
    if pad_yx:
        pad_y = axis_linear_fft_padding(image_shape[1], psf_shape[1])
        pad_x = axis_linear_fft_padding(image_shape[2], psf_shape[2])
    else:
        pad_y = (0, 0)
        pad_x = (0, 0)
    return (pad_z, pad_y, pad_x)


def pad_symmetric(image: jnp.ndarray, pad_width: PadWidth) -> jnp.ndarray:
    """Symmetric (reflect-including-edge) padding; static widths."""
    return jnp.pad(image, pad_width, mode="symmetric")


def remove_padding_zyx(arr: jnp.ndarray, pad_width: PadWidth) -> jnp.ndarray:
    slices = tuple(
        slice(b, arr.shape[i] - a if a > 0 else None)
        for i, (b, a) in enumerate(pad_width)
    )
    return arr[slices]


def enforce_symmetric_boundary(arr: jnp.ndarray, pad_width: PadWidth) -> jnp.ndarray:
    """Rebuild the padding region as a symmetric reflection of the interior
    (reference `rlgc.py:235-277`). Static shapes: crop then re-pad."""
    return pad_symmetric(remove_padding_zyx(arr, pad_width), pad_width)


def observed_region_mask(shape: tuple[int, ...], pad_width: PadWidth) -> np.ndarray:
    """Binary mask of the original (unpadded) image region
    (reference `rlgc.py:359-387`)."""
    mask = np.zeros(shape, dtype=np.float32)
    slices = tuple(
        slice(b, shape[i] - a if a > 0 else None)
        for i, (b, a) in enumerate(pad_width)
    )
    mask[slices] = 1.0
    return mask


def observed_region_mask_device(
    shape: tuple[int, ...], pad_width: PadWidth
) -> jnp.ndarray:
    """On-device mask of the unpadded region, built from iota comparisons.

    A NumPy mask constant gets baked into the jitted program — at
    production padded shapes ((48, 2304, 2304) for a 2048² camera frame)
    that is a ~1 GB compile-payload constant, which the remote-compile
    path rejects outright (HTTP 413) and which bloats every compile cache
    entry. Iotas compile to O(1) metadata instead.
    """
    mask = None
    for ax, (before, after) in enumerate(pad_width):
        pos = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        ok = (pos >= before) & (pos < shape[ax] - after)
        mask = ok if mask is None else (mask & ok)
    return mask.astype(jnp.float32)


def pad_psf(
    psf: jnp.ndarray, image_shape: tuple[int, int, int], normalize: bool = True
) -> jnp.ndarray:
    """Embed + center a PSF into the padded image shape and ifftshift it so
    that `irfftn(rfftn(x) * rfftn(psf))` is a centered convolution
    (reference `rlgc.py:280-319`)."""
    psf = jnp.asarray(psf, jnp.float32)
    if psf.ndim == 2:
        psf = psf[None]
    embedded = jnp.zeros(image_shape, jnp.float32)
    embedded = embedded.at[
        : psf.shape[0], : psf.shape[1], : psf.shape[2]
    ].set(psf)
    for axis, axis_size in enumerate(image_shape):
        embedded = jnp.roll(embedded, int(axis_size / 2), axis=axis)
    for axis, axis_size in enumerate(psf.shape):
        embedded = jnp.roll(embedded, -int(axis_size / 2), axis=axis)
    embedded = jnp.fft.ifftshift(embedded)
    if normalize:
        s = jnp.sum(embedded)
        embedded = embedded / jnp.where(s != 0, s, 1.0)
    return embedded.astype(jnp.float32)


def fft_conv(image: jnp.ndarray, H: jnp.ndarray, shape: tuple[int, int, int]) -> jnp.ndarray:
    """Linear convolution ``irfftn(rfftn(image) * H, s=shape)`` in float32
    (reference `rlgc.py:322-356`). XLA fuses and preplans the transforms."""
    f = jnp.fft.rfftn(image)
    return jnp.fft.irfftn(f * H, s=shape).astype(jnp.float32)


# ---------------------------------------------------------- FFT dispatch
# XLA's TPU FFT lowering measured ~310 GFLOP/s at RLGC shapes (53 ms for
# an rfftn+irfftn pair at (48, 1152, 1152)) — far off both the HBM bound
# and the MXU — so the TPU path routes complex transforms through the
# mixed-radix matmul FFT (`ops/mmfft.py`). Override with
# MERFISH3D_FFT_IMPL=xla|matmul.
import os as _os

_FFT_IMPL = _os.environ.get("MERFISH3D_FFT_IMPL", "auto")


def use_matmul_fft() -> bool:
    if _FFT_IMPL == "matmul":
        return True
    if _FFT_IMPL == "xla":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - device probing must not fail
        return False


def fftn_pair(xr: jnp.ndarray, xi=None):
    """Full-spectrum N-D DFT on a (real, imag) float32 pair → (real, imag).

    Complex values travel as float32 pairs because the tunneled v5e
    backend intermittently cannot execute ANY complex64 op at runtime;
    the matmul implementation expands complex arithmetic into real MXU
    matmuls (``ops/mmfft.py``), the CPU implementation round-trips
    through ``jnp.fft``."""
    if use_matmul_fft():
        from . import mmfft

        return mmfft.fftn_pair(xr, xi)
    z = xr.astype(jnp.complex64)
    if xi is not None:
        z = z + 1j * xi.astype(jnp.complex64)
    f = jnp.fft.fftn(z)
    return jnp.real(f).astype(jnp.float32), jnp.imag(f).astype(jnp.float32)


def ifftn_pair(xr: jnp.ndarray, xi: jnp.ndarray):
    if use_matmul_fft():
        from . import mmfft

        return mmfft.ifftn_pair(xr, xi)
    z = xr.astype(jnp.complex64) + 1j * xi.astype(jnp.complex64)
    f = jnp.fft.ifftn(z)
    return jnp.real(f).astype(jnp.float32), jnp.imag(f).astype(jnp.float32)


def c_mul(a, b):
    """(ar, ai) * (br, bi) elementwise complex product on pairs."""
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def c_conj(a):
    ar, ai = a
    return ar, -ai


# Spectrum-order-opaque transforms for convolution/correlation: the
# per-axis frequency ORDER is implementation-defined (the matmul FFT
# keeps the Cooley-Tukey (k1, k2) layout — zero transposes; `mmfft`
# module docs) but consistent between `fftn_spec`, `ifftn_spec`, and
# `spectrum_freqs`, which is all the convolution theorem needs.


def fftn_spec(xr: jnp.ndarray, xi=None):
    """Forward N-D DFT pair in implementation-defined spectrum order."""
    if use_matmul_fft():
        from . import mmfft

        return mmfft.fftn_pair_s(xr, xi)
    return fftn_pair(xr, xi)


def ifftn_spec(xr: jnp.ndarray, xi: jnp.ndarray, real_output: bool = False):
    """Inverse of :func:`fftn_spec` (natural-order spatial output).

    ``real_output=True`` tells the matmul implementation the caller keeps
    only the real channel (a real→real convolution) — it skips the final
    axis's imaginary matmuls and returns ``(real, None)``."""
    if use_matmul_fft():
        from . import mmfft

        return mmfft.ifftn_pair_s(xr, xi, real_output=real_output)
    return ifftn_pair(xr, xi)


def spectrum_freqs(n: int) -> np.ndarray:
    """1-D frequency values (cycles/sample) in :func:`fftn_spec`'s
    per-axis spectrum order for an axis of length n."""
    f = np.fft.fftfreq(n).astype(np.float32)
    if use_matmul_fft():
        from . import mmfft

        return f[mmfft.scramble_perm(n)]
    return f


def fft_conv_spec(xr: jnp.ndarray, xi, H_pair, real_output: bool = False):
    """Spectrum-domain convolution of a (real, imag) pair with an OTF pair
    in :func:`fftn_spec` order. On TPU this is the fused three-Pallas-pass
    path (`mmfft.conv_pair_s`); elsewhere the composed transforms."""
    if use_matmul_fft():
        from . import mmfft

        return mmfft.conv_pair_s(xr, xi, H_pair, real_output=real_output)
    f = fftn_spec(xr, xi)
    return ifftn_spec(*c_mul(f, H_pair), real_output=real_output)


def fft_conv_full(image: jnp.ndarray, H_pair) -> jnp.ndarray:
    """Linear convolution via the FULL spectrum carried as real pairs in
    :func:`fftn_spec` order; numerically equal to :func:`fft_conv` for
    real inputs."""
    yr, _yi = fft_conv_spec(image, None, H_pair, real_output=True)
    return yr.astype(jnp.float32)
