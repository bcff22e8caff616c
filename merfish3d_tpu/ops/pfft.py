"""Fused single-pass Pallas DFT-axis kernels (TPU).

The einsum matmul FFT (`ops/mmfft.py`) lowers each Cooley-Tukey stage to
a separate XLA pass, so every axis transform costs 2-3 full HBM sweeps;
measured 9-11 ms per axis at RLGC shapes — 30-45% of the v5e HBM bound
— with the stage matmuls' small trailing dims wasting vector lanes.
These kernels fuse BOTH stages plus the twiddle into one VMEM-resident
pass per axis (one HBM read + one write), requiring split sizes
n = n1·128 so:

- stage 1 (the n1-point DFT) runs as n1² scalar×vector FMAs on full
  (·, 128) lane tiles — n1 is small (≤ ~20 for MERFISH frame sizes),
- stage 2 (the 128-point DFT) is a (·, 128) @ (128, 128) MXU matmul —
  the systolic array's native shape.

Spectrum ordering matches `mmfft.scramble_perm` with the (n1, 128)
split (the shared `mmfft.fft_axis_split` policy): position s holds
natural frequency n1·(s % 128) + s//128. Complex values travel as
(real, imag) float32 pairs throughout (the tunneled v5e backend
intermittently cannot execute complex64 ops).

Replaces the device FFT under `fftutils.fftn_spec` dispatch when shapes
qualify (3D, axis length n1·128 with 2 <= n1 <= 24, or a dense leading
axis); per-axis fallback is the einsum path. Interpret-mode tested on
CPU against numpy FFTs (`tests/test_pfft.py`).

Reference parity: these transforms back `ops/rlgc.py` (reference
`rlgc.py:322-356,593-601`) and `ops/phase_corr.py`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# largest n1 for the scalar-FMA first stage (compile size + VPU cost
# grow with n1²; MERFISH camera frames pad to n1 <= 18)
_MAX_N1 = 24
_VMEM_BUDGET = 8 * 1024 * 1024  # per-buffer-set budget for block sizing

# Mosaic's default scoped-VMEM stack limit is 16 MiB; its allocator needs
# more headroom than the block-sizing models above account for (observed:
# 16.18 MiB requested for a modeled ~10 MiB set at (40, 1152, 1152)).
# Raise the per-kernel limit to half the chip's 128 MiB VMEM — the
# _VMEM_BUDGET gates above remain the coarse sizing control.
def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def supported_ct_axis(n: int) -> bool:
    """Trailing/middle axis lengths the fused CT kernels accept."""
    return n % _LANE == 0 and 2 <= n // _LANE <= _MAX_N1


def supported_dense_axis(n: int) -> bool:
    """Leading (z) dense lengths: one MXU matmul, any n that tiles
    sublanes reasonably."""
    return 2 <= n <= 96


@lru_cache(maxsize=None)
def _consts_ct(n: int, inverse: bool):
    """(w1 complex (n1,n1) numpy [baked as scalars], twiddle (n1,128),
    w2 (128,128)) for the fused CT kernels. Inverse constants are
    conjugated with the full 1/n scale folded into the twiddle (no
    separate scaling pass)."""
    n1 = n // _LANE
    sign = +1.0 if inverse else -1.0
    k = np.arange(n1)
    w1 = np.exp(sign * 2j * np.pi * np.outer(k, k) / n1)
    q = np.arange(_LANE)
    tw = np.exp(sign * 2j * np.pi * np.outer(k, q) / n)
    if inverse:
        tw = tw / n
    m = np.arange(_LANE)
    w2 = np.exp(sign * 2j * np.pi * np.outer(q, m) / _LANE)
    return (
        w1.astype(np.complex64),
        tw.astype(np.complex64),
        w2.astype(np.complex64),
    )


_DOT_HIGHEST = partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32,
)
_DOT_BF16 = partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    precision=jax.lax.Precision.DEFAULT,
    preferred_element_type=jnp.float32,
)


def _dot_mode() -> str:
    """Stage-2/dense matmul mode, read at TRACE time.

    Mosaic lowers ``Precision.HIGHEST`` f32 dots to the 6-pass bf16
    emulation on v5e (``Precision.HIGH``'s 3-pass form is rejected by the
    Mosaic lowering outright), which made the DFT matmuls the dominant
    RLGC cost: the full FFT convolution measured 13.4 ms/iter in-loop at
    (40, 1152, 1152). Modes:

    - ``bf16x3``: manual 3-pass emulation — split each operand into a
      bf16 hi + bf16 lo pair and accumulate hi·hi + hi·lo + lo·hi in f32
      (the dropped lo·lo term is O(2^-16) relative). Measured 8.8 ms/iter
      for the same convolution with max relative error 5.3e-6 — an order
      below the pipeline's own f16 storage rounding (5e-4), so results
      are decode-indistinguishable.
    - ``highest``: the prior 6-pass behavior (bit-exact reference mode).
    - ``bf16``: single-pass (5.6 ms/iter, 1.5e-3 max rel err) — fast but
      above f16 storage noise; opt-in only. Measured on hardware (r3):
      the conv error corrupts RLGC's split-KLD comparison enough that
      safe mode restores and stops at ITERATION 1 — the mode is unusable
      for the decon solve as-is; a future mixed split (KLD-feeding
      forward conv at bf16x3, adjoint/consensus at bf16) would need an
      on-chip F1 A/B before default use.

    Default: bf16x3 on a real TPU backend, highest elsewhere (interpret-
    mode tests compare against numpy at 3e-5 atol).
    ``MERFISH3D_PFFT_DOT=highest|bf16x3|bf16`` overrides.
    """
    import os

    mode = os.environ.get("MERFISH3D_PFFT_DOT", "auto")
    if mode in ("highest", "bf16x3", "bf16"):
        return mode
    try:
        return "bf16x3" if jax.default_backend() == "tpu" else "highest"
    except Exception:
        return "highest"


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def spec_bf16() -> bool:
    """Store the INTERMEDIATE conv spectra (between the zx and y passes
    of `mmfft.conv_pair_s`) and the resident OTFs in bf16?

    8 of the 12 f32 sweeps of each real convolution carry spectrum pairs
    that exist only between kernel passes; bf16 halves their bytes. On
    the measured chip this bought NOTHING (36.7 vs 35.6 ms/iter with f32
    spectra at (40, 1152, 1152)) — the conv kernels sit above the
    ~413 GB/s sustained-bandwidth bound, i.e. they are scheduling/VPU
    limited, not HBM limited — so the mode stays OFF by default and the
    machinery is kept for bandwidth-starved parts. Accuracy when on:
    ~2e-3 max relative conv error (validated on hardware), and the
    `rlgc` ht normalization guards against the padding-region error
    amplification it exposed (see `rlgc.py`).

    ``MERFISH3D_PFFT_SPEC=f32|bf16`` overrides (auto: f32).
    """
    import os

    return os.environ.get("MERFISH3D_PFFT_SPEC", "f32") == "bf16"


def _DOT(a, b):
    mode = _dot_mode()
    if mode == "highest":
        return _DOT_HIGHEST(a, b)
    if mode == "bf16":
        return _DOT_BF16(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return _DOT_BF16(ah, bh) + _DOT_BF16(ah, bl) + _DOT_BF16(al, bh)


def _cdot(ar, ai, br, bi):
    """Complex matmul ``(ar + i·ai) @ (br + i·bi)`` → (real, imag).

    The reduced-pass dot modes use the 3-multiplication Karatsuba form
    (t3 = (ar+ai)@(br+bi); re = t1−t2, im = t3−t1−t2) — 9 bf16 MXU
    passes per complex product instead of 12 under bf16x3. ``highest``
    keeps the plain 4-dot form so the bit-exact triage mode stays
    bit-identical to its historical outputs.
    """
    if _dot_mode() == "highest":
        return (
            _DOT(ar, br) - _DOT(ai, bi),
            _DOT(ar, bi) + _DOT(ai, br),
        )
    t1 = _DOT(ar, br)
    t2 = _DOT(ai, bi)
    t3 = _DOT(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


# --------------------------------------------------------- trailing axis
def _dft_last_fwd_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref,
                         w2i_ref, or_ref, oi_ref, *, n, w1, real_in):
    n1 = n // _LANE
    xs_r = [xr_ref[:, p * _LANE:(p + 1) * _LANE] for p in range(n1)]
    xs_i = (
        None if real_in
        else [xi_ref[:, p * _LANE:(p + 1) * _LANE] for p in range(n1)]
    )
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    for k in range(n1):
        # stage 1: n1-point DFT as scalar FMAs on full-lane tiles
        br = xs_r[0] * float(w1[k, 0].real)
        bi = xs_r[0] * float(w1[k, 0].imag)
        for p in range(1, n1):
            br = br + xs_r[p] * float(w1[k, p].real)
            bi = bi + xs_r[p] * float(w1[k, p].imag)
        if xs_i is not None:
            for p in range(n1):
                br = br - xs_i[p] * float(w1[k, p].imag)
                bi = bi + xs_i[p] * float(w1[k, p].real)
        # twiddle row k (1, 128) broadcast
        twr = twr_ref[k:k + 1, :]
        twi = twi_ref[k:k + 1, :]
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        # stage 2: 128-point DFT on the MXU
        dr, di = _cdot(cr, ci, w2r, w2i)
        or_ref[:, k * _LANE:(k + 1) * _LANE] = dr
        oi_ref[:, k * _LANE:(k + 1) * _LANE] = di


def _dft_last_inv_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref,
                         w2i_ref, or_ref, oi_ref, *, n, w1, real_out):
    """Inverse consuming the scrambled (k1, k2) layout: MXU stage first,
    conj-twiddle (scale folded), then the n1-point synthesis as scalar
    FMAs writing natural order."""
    n1 = n // _LANE
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    es_r, es_i = [], []
    for k in range(n1):
        cr = xr_ref[:, k * _LANE:(k + 1) * _LANE]
        ci = xi_ref[:, k * _LANE:(k + 1) * _LANE]
        dr, di = _cdot(cr, ci, w2r, w2i)
        twr = twr_ref[k:k + 1, :]
        twi = twi_ref[k:k + 1, :]
        es_r.append(dr * twr - di * twi)
        es_i.append(dr * twi + di * twr)
    for p in range(n1):
        yr = es_r[0] * float(w1[0, p].real) - es_i[0] * float(w1[0, p].imag)
        for k in range(1, n1):
            yr = yr + es_r[k] * float(w1[k, p].real)
            yr = yr - es_i[k] * float(w1[k, p].imag)
        or_ref[:, p * _LANE:(p + 1) * _LANE] = yr
        if not real_out:
            yi = es_r[0] * float(w1[0, p].imag) + es_i[0] * float(w1[0, p].real)
            for k in range(1, n1):
                yi = yi + es_r[k] * float(w1[k, p].imag)
                yi = yi + es_i[k] * float(w1[k, p].real)
            oi_ref[:, p * _LANE:(p + 1) * _LANE] = yi


def _rows_block(b_rows: int, n: int) -> int:
    """Largest row-block (multiple of 8, dividing b_rows) fitting VMEM.

    Live VMEM ≈ 10 channel-blocks of (tb, n) f32: double-buffered in/out
    pairs plus the stage-1/twiddle temporaries."""
    cap = max(_VMEM_BUDGET // (n * 4 * 10), 8)
    for cand in (512, 384, 256, 128, 64, 32, 16, 8):
        if cand <= cap and b_rows % cand == 0:
            return cand
    return b_rows  # caller guarantees divisibility via axis_supported


def _const_specs(n1):
    full = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return [
        full((n1, _LANE)), full((n1, _LANE)),
        full((_LANE, _LANE)), full((_LANE, _LANE)),
    ]


def _ct_const_args(n, inverse):
    w1, tw, w2 = _consts_ct(n, inverse)
    return w1, (
        jnp.asarray(tw.real.copy()), jnp.asarray(tw.imag.copy()),
        jnp.asarray(w2.real.copy()), jnp.asarray(w2.imag.copy()),
    )


def dft_trailing(xr, xi, *, inverse=False, real_output=False):
    """Fused DFT along the LAST axis of a 2D (rows, n) pair."""
    rows, n = xr.shape
    n1 = n // _LANE
    w1, consts = _ct_const_args(n, inverse)
    tb = _rows_block(rows, n)
    grid = (rows // tb,)
    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    real_in = xi is None
    if real_in and inverse:
        # the inverse kernel has no real_in fast path and reads full xi
        # blocks — a thin placeholder block mis-shapes the contraction
        # (review r3); a zero imaginary channel is the correct input
        xi = jnp.zeros_like(xr)
        real_in = False
    if real_in:
        xi = jnp.zeros((8, n), jnp.float32)  # placeholder, never read
        xi_spec = pl.BlockSpec((8, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        xi_spec = spec
    if inverse:
        kern = partial(_dft_last_inv_kernel, n=n, w1=w1,
                       real_out=real_output)
    else:
        kern = partial(_dft_last_fwd_kernel, n=n, w1=w1, real_in=real_in)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[spec, xi_spec] + _const_specs(n1),
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, n), jnp.float32),
            jax.ShapeDtypeStruct((rows, n), jnp.float32),
        ),
    )(xr, xi, *consts)
    return yr, (None if (inverse and real_output) else yi)


# ---------------------------------------------------------- middle axis
def _dft_mid_fwd_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref,
                        w2i_ref, or_ref, oi_ref, *, n, w1, real_in):
    n1 = n // _LANE
    xs_r = [xr_ref[0, p * _LANE:(p + 1) * _LANE, :] for p in range(n1)]
    xs_i = (
        None if real_in
        else [xi_ref[0, p * _LANE:(p + 1) * _LANE, :] for p in range(n1)]
    )
    # stage-2 contraction is over the SUBLANE dim (W2 is symmetric)
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    for k in range(n1):
        br = xs_r[0] * float(w1[k, 0].real)
        bi = xs_r[0] * float(w1[k, 0].imag)
        for p in range(1, n1):
            br = br + xs_r[p] * float(w1[k, p].real)
            bi = bi + xs_r[p] * float(w1[k, p].imag)
        if xs_i is not None:
            for p in range(n1):
                br = br - xs_i[p] * float(w1[k, p].imag)
                bi = bi + xs_i[p] * float(w1[k, p].real)
        twr = twr_ref[:, k:k + 1]  # (128, 1) column, transposed store
        twi = twi_ref[:, k:k + 1]
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        dr, di = _cdot(w2r, w2i, cr, ci)
        or_ref[0, k * _LANE:(k + 1) * _LANE, :] = dr
        oi_ref[0, k * _LANE:(k + 1) * _LANE, :] = di


def _dft_mid_inv_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref,
                        w2i_ref, or_ref, oi_ref, *, n, w1, real_out):
    n1 = n // _LANE
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    es_r, es_i = [], []
    for k in range(n1):
        cr = xr_ref[0, k * _LANE:(k + 1) * _LANE, :]
        ci = xi_ref[0, k * _LANE:(k + 1) * _LANE, :]
        dr, di = _cdot(w2r, w2i, cr, ci)
        twr = twr_ref[:, k:k + 1]
        twi = twi_ref[:, k:k + 1]
        es_r.append(dr * twr - di * twi)
        es_i.append(dr * twi + di * twr)
    for p in range(n1):
        yr = es_r[0] * float(w1[0, p].real) - es_i[0] * float(w1[0, p].imag)
        for k in range(1, n1):
            yr = yr + es_r[k] * float(w1[k, p].real)
            yr = yr - es_i[k] * float(w1[k, p].imag)
        or_ref[0, p * _LANE:(p + 1) * _LANE, :] = yr
        if not real_out:
            yi = es_r[0] * float(w1[0, p].imag) + es_i[0] * float(w1[0, p].real)
            for k in range(1, n1):
                yi = yi + es_r[k] * float(w1[k, p].imag)
                yi = yi + es_i[k] * float(w1[k, p].real)
            oi_ref[0, p * _LANE:(p + 1) * _LANE, :] = yi


def _mid_const_args(n, inverse):
    """Twiddle stored TRANSPOSED (128, n1) so per-k slices are (128, 1)
    columns broadcasting over lanes."""
    w1, tw, w2 = _consts_ct(n, inverse)
    twT = tw.T.copy()
    return w1, (
        jnp.asarray(twT.real.copy()), jnp.asarray(twT.imag.copy()),
        jnp.asarray(w2.real.copy()), jnp.asarray(w2.imag.copy()),
    )


def _mid_const_specs(n1):
    full = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return [
        full((_LANE, n1)), full((_LANE, n1)),
        full((_LANE, _LANE)), full((_LANE, _LANE)),
    ]


def dft_middle(xr, xi, *, inverse=False, real_output=False):
    """Fused DFT along axis -2 of a 3D (z, n, x) pair (x stays lanes)."""
    nz, n, nx = xr.shape
    n1 = n // _LANE
    w1, consts = _mid_const_args(n, inverse)
    cap = max(_VMEM_BUDGET // (n * 4 * 10), _LANE)
    tx = None
    for cand in (512, 384, 256, 128):
        if cand <= cap and nx % cand == 0:
            tx = cand
            break
    if tx is None:
        tx = _LANE if nx % _LANE == 0 else nx
    grid = (nz, nx // tx)
    spec = pl.BlockSpec((1, n, tx), lambda z, j: (z, 0, j),
                        memory_space=pltpu.VMEM)
    real_in = xi is None
    if real_in:
        xi = jnp.zeros((1, n, tx), jnp.float32)
        xi_spec = pl.BlockSpec((1, n, tx), lambda z, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        xi_spec = spec
    if inverse:
        kern = partial(_dft_mid_inv_kernel, n=n, w1=w1,
                       real_out=real_output)
    else:
        kern = partial(_dft_mid_fwd_kernel, n=n, w1=w1, real_in=real_in)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[spec, xi_spec] + _mid_const_specs(n1),
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((nz, n, nx), jnp.float32),
            jax.ShapeDtypeStruct((nz, n, nx), jnp.float32),
        ),
    )(xr, xi, *consts)
    return yr, (None if (inverse and real_output) else yi)


# --------------------------------------------------------- leading dense
@lru_cache(maxsize=None)
def _consts_dense(n: int, inverse: bool):
    k = np.arange(n)
    sign = +1.0 if inverse else -1.0
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    if inverse:
        w = w / n
    return w.astype(np.complex64)


def _dft_lead_kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref, *,
                     real_in, real_out):
    nz, ty, nx = xr_ref.shape
    wr = wr_ref[:]
    wi = wi_ref[:]
    a = xr_ref[:].reshape(nz, ty * nx)
    yr = _DOT(wr, a)
    yi = None if (real_out and real_in) else _DOT(wi, a)
    if not real_in:
        b = xi_ref[:].reshape(nz, ty * nx)
        yr = yr - _DOT(wi, b)
        if yi is not None:
            yi = yi + _DOT(wr, b)
    or_ref[:] = yr.reshape(nz, ty, nx)
    if not real_out:
        oi_ref[:] = yi.reshape(nz, ty, nx)


def dft_leading(xr, xi, *, inverse=False, real_output=False):
    """Fused dense DFT along axis 0 of a 3D (n, y, x) pair — one MXU
    matmul per block (natural frequency order; dense axes have identity
    scramble). Blocks tile (y, x) with Mosaic-legal (8k, 128k) shapes."""
    n, ny, nx = xr.shape
    w = _consts_dense(n, inverse)
    wr = jnp.asarray(w.real.copy())
    wi = jnp.asarray(w.imag.copy())
    # pick (ty, tx): sublane dim multiple of 8, lane dim multiple of 128,
    # block bytes (n*ty*tx*4) within the live-buffer budget
    tx = nx
    for cand in (512, 384, 256, 128):
        if nx % cand == 0:
            tx = cand
            break
    ty = 8
    for cand in (64, 32, 16, 8):
        if ny % cand == 0 and n * cand * tx * 4 * 10 <= _VMEM_BUDGET:
            ty = cand
            break
    grid = (ny // ty, nx // tx)
    spec = pl.BlockSpec((n, ty, tx), lambda j, i: (0, j, i),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n, n), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
    real_in = xi is None
    if real_in:
        xi = jnp.zeros((1, ty, tx), jnp.float32)
        xi_spec = pl.BlockSpec((1, ty, tx), lambda j, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        xi_spec = spec
    real_out = real_output and inverse
    kern = partial(_dft_lead_kernel, real_in=real_in, real_out=real_out)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[spec, xi_spec, wspec, wspec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((n, ny, nx), jnp.float32),
        ),
    )(xr, xi, wr, wi)
    return yr, (None if real_out else yi)


# ------------------------------------------------- fused middle-axis CONV
def _dft_mid_conv_kernel(xr_ref, xi_ref, hr_ref, hi_ref,
                         twfr_ref, twfi_ref, w2fr_ref, w2fi_ref,
                         twir_ref, twii_ref, w2ir_ref, w2ii_ref,
                         or_ref, oi_ref, *, n, w1f, w1i):
    """Forward y-DFT → pointwise OTF multiply → inverse y-DFT in ONE
    VMEM-resident pass over (1, n, tx) blocks.

    Composing the separate fwd/inv middle-axis kernels with an XLA
    spectrum-multiply pass costs 14 HBM sweeps per convolution's middle
    stage (2r+2w fwd, 4r+2w multiply, 2r+2w inv); this kernel does the
    same math in 4r+2w — the spectrum group for output lanes k is
    produced, multiplied by the OTF block at the same (z, k-group, x)
    coordinates (scrambled order matches: both sides came through the
    shared `mmfft.fft_axis_split` policy), and consumed by the inverse
    stage without ever leaving VMEM."""
    n1 = n // _LANE
    xs_r = [
        xr_ref[0, p * _LANE:(p + 1) * _LANE, :].astype(jnp.float32)
        for p in range(n1)
    ]
    xs_i = [
        xi_ref[0, p * _LANE:(p + 1) * _LANE, :].astype(jnp.float32)
        for p in range(n1)
    ]
    w2fr = w2fr_ref[:]
    w2fi = w2fi_ref[:]
    w2ir = w2ir_ref[:]
    w2ii = w2ii_ref[:]
    es_r, es_i = [], []
    for k in range(n1):
        # forward stage 1 (n1-point DFT over p)
        br = xs_r[0] * float(w1f[k, 0].real)
        bi = xs_r[0] * float(w1f[k, 0].imag)
        for p in range(1, n1):
            br = br + xs_r[p] * float(w1f[k, p].real)
            bi = bi + xs_r[p] * float(w1f[k, p].imag)
        for p in range(n1):
            br = br - xs_i[p] * float(w1f[k, p].imag)
            bi = bi + xs_i[p] * float(w1f[k, p].real)
        twr = twfr_ref[:, k:k + 1]
        twi = twfi_ref[:, k:k + 1]
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        # forward stage 2 (128-point MXU matmul over sublanes)
        dr, di = _cdot(w2fr, w2fi, cr, ci)
        # pointwise OTF multiply at the group's spectrum coordinates
        hr = hr_ref[0, k * _LANE:(k + 1) * _LANE, :].astype(jnp.float32)
        hi = hi_ref[0, k * _LANE:(k + 1) * _LANE, :].astype(jnp.float32)
        mr = dr * hr - di * hi
        mi = dr * hi + di * hr
        # inverse stage 2 + conj-twiddle (1/n folded into the twiddle)
        er, ei = _cdot(w2ir, w2ii, mr, mi)
        tir = twir_ref[:, k:k + 1]
        tii = twii_ref[:, k:k + 1]
        es_r.append(er * tir - ei * tii)
        es_i.append(er * tii + ei * tir)
    for p in range(n1):
        yr = es_r[0] * float(w1i[0, p].real) - es_i[0] * float(w1i[0, p].imag)
        yi = es_r[0] * float(w1i[0, p].imag) + es_i[0] * float(w1i[0, p].real)
        for k in range(1, n1):
            yr = yr + es_r[k] * float(w1i[k, p].real)
            yr = yr - es_i[k] * float(w1i[k, p].imag)
            yi = yi + es_r[k] * float(w1i[k, p].imag)
            yi = yi + es_i[k] * float(w1i[k, p].real)
        or_ref[0, p * _LANE:(p + 1) * _LANE, :] = yr.astype(or_ref.dtype)
        oi_ref[0, p * _LANE:(p + 1) * _LANE, :] = yi.astype(oi_ref.dtype)


def mid_conv_supported(shape) -> bool:
    """Can :func:`dft_mid_conv` run the middle axis of this 3D shape?
    ``MERFISH3D_PFFT_CONV=0`` disables (composed transforms still run)."""
    import os

    if os.environ.get("MERFISH3D_PFFT_CONV", "1") == "0":
        return False
    if len(shape) != 3:
        return False
    nz, ny, nx = (int(v) for v in shape)
    if not (supported_ct_axis(ny) and nx % _LANE == 0):
        return False
    # live blocks: in(2) + h(2) + out(2) + es(2) + stage temps ≈ 12
    tx = _LANE
    return ny * tx * 4 * 12 <= 14 * 1024 * 1024


def dft_mid_conv(xr, xi, hr, hi, out_dtype=jnp.float32):
    """Spectrum-domain convolution along axis 1 of a 3D complex pair:
    ``idft_y(dft_y(x) * h)`` in one HBM pass; caller checked
    :func:`mid_conv_supported`. ``h`` is the full-spectrum OTF pair in
    `fftn_pair_s` order (its axis-1 layout matches this kernel's).
    Inputs/`h` may be bf16 (cast to f32 on load); ``out_dtype`` selects
    the stored spectrum dtype (see :func:`spec_bf16`)."""
    nz, n, nx = xr.shape
    n1 = n // _LANE
    w1f, consts_f = _mid_const_args(n, False)
    w1i, consts_i = _mid_const_args(n, True)
    cap = max(_VMEM_BUDGET // (n * 4 * 12), _LANE)
    tx = None
    for cand in (512, 384, 256, 128):
        if cand <= cap and nx % cand == 0:
            tx = cand
            break
    if tx is None:
        tx = _LANE if nx % _LANE == 0 else nx
    grid = (nz, nx // tx)
    spec = pl.BlockSpec((1, n, tx), lambda z, j: (z, 0, j),
                        memory_space=pltpu.VMEM)
    kern = partial(_dft_mid_conv_kernel, n=n, w1f=w1f, w1i=w1i)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[spec, spec, spec, spec]
        + _mid_const_specs(n1) + _mid_const_specs(n1),
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((nz, n, nx), out_dtype),
            jax.ShapeDtypeStruct((nz, n, nx), out_dtype),
        ),
    )(xr, xi, hr, hi, *consts_f, *consts_i)
    return yr, yi


# ------------------------------------------- fused leading+trailing pass
def _dft_zx_fwd_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
                       wzr_ref, wzi_ref, or_ref, oi_ref, *, n, w1, real_in):
    """Trailing-axis CT DFT + leading-axis dense DFT in ONE VMEM-resident
    pass over (nz, ty, nx) blocks — the two separate per-axis kernels cost
    an extra full HBM write+read of both channels between them.

    Per k-group of 128 output lanes: stage 1 (n1-point DFT, scalar FMAs),
    twiddle, stage 2 (128-point MXU matmul), then the z-axis dense DFT as
    a (nz, nz) @ (nz, ty·128) MXU matmul on the group — the z transform
    is linear, so applying it per lane-group commutes with the x stages."""
    nz, ty, nx = xr_ref.shape
    n1 = n // _LANE
    rows = nz * ty
    x2r = xr_ref[:].astype(jnp.float32).reshape(rows, n)
    xs_r = [x2r[:, p * _LANE:(p + 1) * _LANE] for p in range(n1)]
    if real_in:
        xs_i = None
    else:
        x2i = xi_ref[:].astype(jnp.float32).reshape(rows, n)
        xs_i = [x2i[:, p * _LANE:(p + 1) * _LANE] for p in range(n1)]
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    wzr = wzr_ref[:]
    wzi = wzi_ref[:]
    for k in range(n1):
        br = xs_r[0] * float(w1[k, 0].real)
        bi = xs_r[0] * float(w1[k, 0].imag)
        for p in range(1, n1):
            br = br + xs_r[p] * float(w1[k, p].real)
            bi = bi + xs_r[p] * float(w1[k, p].imag)
        if xs_i is not None:
            for p in range(n1):
                br = br - xs_i[p] * float(w1[k, p].imag)
                bi = bi + xs_i[p] * float(w1[k, p].real)
        twr = twr_ref[k:k + 1, :]
        twi = twi_ref[k:k + 1, :]
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        dr, di = _cdot(cr, ci, w2r, w2i)
        # z-axis dense DFT on this lane group
        gr = dr.reshape(nz, ty * _LANE)
        gi = di.reshape(nz, ty * _LANE)
        zr, zi = _cdot(wzr, wzi, gr, gi)
        # reshape in 32-bit, cast at the store (16-bit shape casts are
        # rejected by Mosaic)
        or_ref[:, :, k * _LANE:(k + 1) * _LANE] = (
            zr.reshape(nz, ty, _LANE).astype(or_ref.dtype)
        )
        oi_ref[:, :, k * _LANE:(k + 1) * _LANE] = (
            zi.reshape(nz, ty, _LANE).astype(oi_ref.dtype)
        )


def _zx_inv_group(p, es_r, es_i, w1, want_imag):
    """Natural-order lane group p of the CT inverse synthesis from the
    per-k twiddled stage outputs; returns ((rows, 128), (rows, 128)|None)."""
    n1 = len(es_r)
    yr = es_r[0] * float(w1[0, p].real) - es_i[0] * float(w1[0, p].imag)
    for k in range(1, n1):
        yr = yr + es_r[k] * float(w1[k, p].real)
        yr = yr - es_i[k] * float(w1[k, p].imag)
    if not want_imag:
        return yr, None
    yi = es_r[0] * float(w1[0, p].imag) + es_i[0] * float(w1[0, p].real)
    for k in range(1, n1):
        yi = yi + es_r[k] * float(w1[k, p].imag)
        yi = yi + es_i[k] * float(w1[k, p].real)
    return yr, yi


def _zx_inv_stages(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
                   wzr_ref, wzi_ref, *, n):
    """Shared front half of the fused z+x inverse: z-axis inverse dense
    DFT per lane group, MXU CT stage, conj-twiddle. Returns the per-k
    (es_r, es_i) lists the synthesis (:func:`_zx_inv_group`) consumes."""
    nz, ty, nx = xr_ref.shape
    n1 = n // _LANE
    w2r = w2r_ref[:]
    w2i = w2i_ref[:]
    wzr = wzr_ref[:]
    wzi = wzi_ref[:]
    es_r, es_i = [], []
    for k in range(n1):
        ar = (
            xr_ref[:, :, k * _LANE:(k + 1) * _LANE]
            .astype(jnp.float32).reshape(nz, ty * _LANE)
        )
        ai = (
            xi_ref[:, :, k * _LANE:(k + 1) * _LANE]
            .astype(jnp.float32).reshape(nz, ty * _LANE)
        )
        zr, zi = _cdot(wzr, wzi, ar, ai)
        cr = zr.reshape(nz * ty, _LANE)
        ci = zi.reshape(nz * ty, _LANE)
        dr, di = _cdot(cr, ci, w2r, w2i)
        twr = twr_ref[k:k + 1, :]
        twi = twi_ref[k:k + 1, :]
        es_r.append(dr * twr - di * twi)
        es_i.append(dr * twi + di * twr)
    return es_r, es_i


def _dft_zx_inv_kernel(xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
                       wzr_ref, wzi_ref, or_ref, oi_ref, *, n, w1, real_out):
    """Inverse of :func:`_dft_zx_fwd_kernel`: z-axis inverse dense DFT per
    lane group, then the scrambled-layout CT inverse (MXU stage,
    conj-twiddle, n1-point synthesis writing natural order)."""
    nz, ty, nx = xr_ref.shape
    n1 = n // _LANE
    es_r, es_i = _zx_inv_stages(
        xr_ref, xi_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
        wzr_ref, wzi_ref, n=n,
    )
    for p in range(n1):
        yr, yi = _zx_inv_group(p, es_r, es_i, w1, want_imag=not real_out)
        or_ref[:, :, p * _LANE:(p + 1) * _LANE] = (
            yr.reshape(nz, ty, _LANE).astype(or_ref.dtype)
        )
        if yi is not None:
            oi_ref[:, :, p * _LANE:(p + 1) * _LANE] = (
                yi.reshape(nz, ty, _LANE).astype(oi_ref.dtype)
            )


_ZX_TY = 8  # sublane-minimal y rows per block: nz and nx are both full


def zx_supported(shape) -> bool:
    """Can the fused z+x kernel transform axes (0, 2) of this 3D shape?

    Requires a dense-supported z, a CT-supported x, y divisible by the
    row block, and the live block set within the VMEM budget.
    ``MERFISH3D_PFFT_ZX=0`` disables (per-axis kernels still run)."""
    import os

    if os.environ.get("MERFISH3D_PFFT_ZX", "1") == "0":
        return False
    if len(shape) != 3:
        return False
    nz, ny, nx = (int(v) for v in shape)
    if not (supported_dense_axis(nz) and supported_ct_axis(nx)):
        return False
    if ny % _ZX_TY != 0:
        return False
    n1 = nx // _LANE
    io_bytes = 5 * nz * _ZX_TY * nx * 4  # in(≤2)+out(2) with double-buffer
    live_bytes = 2 * n1 * nz * _ZX_TY * _LANE * 4  # inverse es lists
    return io_bytes + live_bytes <= 12 * 1024 * 1024


def dft_zx(xr, xi, *, inverse=False, real_output=False,
           out_dtype=jnp.float32):
    """Fused DFT along axes 0 and 2 of a 3D pair (one HBM pass for both);
    caller checked :func:`zx_supported`. Inputs may be bf16 (cast to f32
    on load); ``out_dtype`` selects the stored dtype. 16-bit blocks need
    16-row sublane tiles, so ty doubles when either side is 16-bit
    (caller guarantees ``ny % 16 == 0`` via :func:`zx_supported` +
    `mmfft.conv_pair_s`'s bf16 gate)."""
    nz, ny, nx = xr.shape
    n1 = nx // _LANE
    w1, consts = _ct_const_args(nx, inverse)
    wz = _consts_dense(nz, inverse)
    wzr = jnp.asarray(wz.real.copy())
    wzi = jnp.asarray(wz.imag.copy())
    any16 = (
        jnp.dtype(out_dtype).itemsize == 2
        or jnp.dtype(xr.dtype).itemsize == 2
    )
    ty = 2 * _ZX_TY if any16 and ny % (2 * _ZX_TY) == 0 else _ZX_TY
    grid = (ny // ty,)
    spec = pl.BlockSpec((nz, ty, nx), lambda j: (0, j, 0),
                        memory_space=pltpu.VMEM)
    real_in = xi is None
    if real_in and inverse:
        # inverse stages read full xi blocks (see dft_trailing) — feed a
        # real zero imaginary channel instead of the thin placeholder
        xi = jnp.zeros_like(xr)
        real_in = False
    if real_in:
        xi = jnp.zeros((8, 8, nx), xr.dtype)  # placeholder, never read
        xi_spec = pl.BlockSpec((8, 8, nx), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        xi_spec = spec
    wz_spec = pl.BlockSpec((nz, nz), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    if inverse:
        kern = partial(_dft_zx_inv_kernel, n=nx, w1=w1,
                       real_out=real_output)
    else:
        kern = partial(_dft_zx_fwd_kernel, n=nx, w1=w1, real_in=real_in)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=_compiler_params(),
        in_specs=[spec, xi_spec] + _const_specs(n1) + [wz_spec, wz_spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((nz, ny, nx), out_dtype),
            jax.ShapeDtypeStruct((nz, ny, nx), out_dtype),
        ),
    )(xr, xi, *consts, wzr, wzi)
    return yr, (None if (inverse and real_output) else yi)


# ------------------------------------------------------------- dispatch
def axis_supported(shape, axis: int) -> bool:
    """Can the fused kernels transform this axis of a 3D array?"""
    if len(shape) != 3:
        return False
    n = shape[axis]
    axis = axis % 3
    if axis == 0:
        # ny must tile the row blocks (min 8) or the grid silently drops
        # the tail rows (review r3) — ragged ny falls back to einsum
        return (
            supported_dense_axis(n)
            and shape[2] % _LANE == 0
            and shape[1] % 8 == 0
        )
    if axis == 1:
        return supported_ct_axis(n) and shape[2] % _LANE == 0
    return supported_ct_axis(n) and (shape[0] * shape[1]) % 8 == 0


def dft_axis_3d(xr, xi, axis: int, *, inverse=False, real_output=False):
    """Fused DFT along ``axis`` of a 3D pair; caller checked
    :func:`axis_supported`."""
    axis = axis % 3
    if axis == 2:
        z, y, n = xr.shape
        yr, yi = dft_trailing(
            xr.reshape(z * y, n),
            None if xi is None else xi.reshape(z * y, n),
            inverse=inverse, real_output=real_output,
        )
        return (
            yr.reshape(z, y, n),
            None if yi is None else yi.reshape(z, y, n),
        )
    if axis == 1:
        return dft_middle(xr, xi, inverse=inverse, real_output=real_output)
    return dft_leading(xr, xi, inverse=inverse, real_output=real_output)
