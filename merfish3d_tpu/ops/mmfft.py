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

# TPU einsum default precision is bf16 (8 mantissa bits) — catastrophic
# for DFT matrices. HIGHEST forces the f32 multi-pass MXU algorithm;
# measured necessary for RLGC's KLD-based stopping to behave. HIGH
# (bf16_3x, ~21 mantissa bits) is selectable via env for perf probes.
import os as _os

_PREC = {
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}.get(_os.environ.get("MERFISH3D_MM_PRECISION", "highest"),
      jax.lax.Precision.HIGHEST)


def _einsum(sub, a, b):
    return jnp.einsum(sub, a, b, precision=_PREC)


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
            precision=_PREC,
        )
    batch = x.shape[:-1]
    # n = n2*p + q  (p < n1, q < n2)
    xr = x.reshape(*batch, n1, n2)
    inner = jnp.einsum(
        "kp,...pq->...kq",
        jnp.asarray(_dft_matrix(n1, sign)),
        xr,
        preferred_element_type=jnp.complex64,
        precision=_PREC,
    )
    inner = inner * jnp.asarray(_twiddle(n1, n2, sign))
    # result index k = k1 + n1*k2 → lay out as (k2, k1) then ravel
    out = jnp.einsum(
        "...kq,qm->...mk",
        inner,
        jnp.asarray(_dft_matrix(n2, sign)),
        preferred_element_type=jnp.complex64,
        precision=_PREC,
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


# ----------------------------------------------------- real-pair transforms
# The tunneled v5e backend intermittently cannot execute ANY complex64 op
# (UNIMPLEMENTED at runtime), so the TPU path carries complex values as
# (real, imag) float32 pairs: each complex matmul expands into four real
# MXU matmuls — the layout TPUs natively want for complex math anyway.


def _cmatmul(Wr, Wi, ar, ai, sub):
    """(Wr + iWi) contracted with (ar + iai) via einsum subscripts; four
    real MXU matmuls (two when the input is purely real)."""
    yr = _einsum(sub, Wr, ar)
    yi = _einsum(sub, Wi, ar)
    if ai is not None:
        yr = yr - _einsum(sub, Wi, ai)
        yi = yi + _einsum(sub, Wr, ai)
    return yr, yi


# Dense single-matmul DFT below this length; 2-level Cooley-Tukey above.
_DENSE_MAX = 96


def _transform_axis_pair(xr, xi, axis: int, sign: float):
    """In-place DFT along ``axis`` on a (real, imag) pair.

    No ``moveaxis``: the array reshapes to (pre, n1, n2, post) — row-major
    metadata only — and every stage is an einsum whose lowering keeps the
    data layout (measured: moveaxis round-trips cost more than the
    matmuls themselves at RLGC shapes)."""
    axis = axis % xr.ndim
    n = xr.shape[axis]
    pre = int(np.prod(xr.shape[:axis], dtype=np.int64))
    post = int(np.prod(xr.shape[axis + 1:], dtype=np.int64))
    shape = xr.shape
    n1, n2 = _balanced_split(n)

    if n <= _DENSE_MAX or n1 == 1:
        w = _dft_matrix(n, sign)
        wr = jnp.asarray(w.real.copy())
        wi = jnp.asarray(w.imag.copy())
        ar = xr.reshape(pre, n, post)
        ai = xi.reshape(pre, n, post) if xi is not None else None
        yr, yi = _cmatmul(wr, wi, ar, ai, "kp,apb->akb")
        return yr.reshape(shape), yi.reshape(shape)

    # n = n2*p + q; out index k = k1 + n1*k2 → (m=k2, k=k1) then merge
    ar = xr.reshape(pre, n1, n2, post)
    ai = xi.reshape(pre, n1, n2, post) if xi is not None else None
    w1 = _dft_matrix(n1, sign)
    br, bi = _cmatmul(
        jnp.asarray(w1.real.copy()), jnp.asarray(w1.imag.copy()),
        ar, ai, "kp,apqb->akqb",
    )
    tw = _twiddle(n1, n2, sign)
    twr = jnp.asarray(tw.real.copy())[None, :, :, None]
    twi = jnp.asarray(tw.imag.copy())[None, :, :, None]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    w2 = _dft_matrix(n2, sign)
    w2r = jnp.asarray(w2.real.copy())
    w2i = jnp.asarray(w2.imag.copy())
    yr = _einsum("akqb,qm->amkb", cr, w2r) - _einsum("akqb,qm->amkb", ci, w2i)
    yi = _einsum("akqb,qm->amkb", cr, w2i) + _einsum("akqb,qm->amkb", ci, w2r)
    return yr.reshape(shape), yi.reshape(shape)


def fftn_pair(xr: jnp.ndarray, xi=None, axes=None):
    """Forward N-D DFT on a (real, imag) float32 pair → (real, imag)."""
    xr = xr.astype(jnp.float32)
    if xi is not None:
        xi = xi.astype(jnp.float32)
    if axes is None:
        axes = range(xr.ndim)
    for ax in axes:
        xr, xi = _transform_axis_pair(xr, xi, ax, -1.0)
    return xr, xi


def ifftn_pair(xr: jnp.ndarray, xi, axes=None):
    """Inverse N-D DFT on a (real, imag) float32 pair → (real, imag)."""
    xr = xr.astype(jnp.float32)
    xi = xi.astype(jnp.float32) if xi is not None else None
    if axes is None:
        axes = range(xr.ndim)
    scale = 1.0
    for ax in axes:
        xr, xi = _transform_axis_pair(xr, xi, ax, +1.0)
        scale *= xr.shape[ax]
    return xr / scale, xi / scale


# ------------------------------------------------ scrambled-spectrum pairs
# The Cooley-Tukey merge "out index k = k1 + n1·k2" is the ONLY transpose
# in the matmul FFT: natural frequency order needs the (k2, k1) layout, so
# the final einsum writes "...mkb" — a permuted store XLA materializes as
# an extra full HBM pass per axis. Convolution does not care about
# spectrum ordering: forward-transform → pointwise multiply →
# inverse-transform is exact for ANY fixed permutation of the spectrum as
# long as both operands and the inverse use the same one. The *scrambled*
# transforms below keep the (k1, k2) layout — every einsum is
# layout-preserving, zero transposes end to end — and the matching
# inverse consumes that layout directly, folding the 1/n scale into the
# constant twiddle/DFT matrices (no separate scaling pass).
# `scramble_perm(n)` exposes the per-axis ordering for the rare consumer
# that needs frequency values (phase-correlation's upsampled DFT).


def fft_axis_split(n: int) -> tuple[int, int]:
    """THE split policy for scrambled-spectrum axes — shared by the
    einsum CT, the fused Pallas kernels (`ops/pfft.py`), and
    :func:`scramble_perm` so every implementation emits the same
    spectrum ordering for a given length. Lengths of the form n1·128
    split as (n1, 128): the fused kernel's stage 2 is then a native
    (·,128)@(128,128) MXU matmul; everything else splits balanced."""
    from . import pfft

    if pfft.supported_ct_axis(n):
        return n // 128, 128
    return _balanced_split(n)


@lru_cache(maxsize=None)
def scramble_perm(n: int) -> np.ndarray:
    """perm[s] = natural frequency index stored at position s of a
    scrambled-spectrum axis of length n (identity for dense lengths)."""
    n1, n2 = fft_axis_split(n)
    if n <= _DENSE_MAX or n1 == 1:
        return np.arange(n)
    s = np.arange(n)
    return n1 * (s % n2) + s // n2


def _last_axis_ct_pair_s(xr, xi, sign: float, scale: float = 1.0,
                         real_output: bool = False):
    """DFT along the LAST axis on a pair via trailing-dim-contraction
    matmuls, scrambled (k1, k2) output for the CT path.

    Every matmul contracts the trailing or second-to-trailing dim with
    the batch leading — the layout XLA's TPU dot lowering handles without
    inserting relayout copies (measured 27 ms vs 40 ms for a full 3D
    transform at (48, 1152, 1152) against leading-contraction einsums).

    ``sign=+1`` with ``scale=1/n`` is the inverse consuming the scrambled
    layout (constants carry the scale — no separate scaling pass).
    ``real_output`` skips the imaginary-channel matmuls of the final
    stage (the caller only keeps the real part — the last inverse axis of
    a real→real convolution)."""
    n = xr.shape[-1]
    n1, n2 = fft_axis_split(n)

    def mm(sub, a, w):
        return _einsum(sub, a, w)

    if n <= _DENSE_MAX or n1 == 1:
        w = _dft_matrix(n, sign) * scale
        wr = jnp.asarray(w.real.copy())
        wi = jnp.asarray(w.imag.copy())
        yr = mm("...p,pk->...k", xr, wr)
        if xi is not None:
            yr = yr - mm("...p,pk->...k", xi, wi)
        if real_output:
            return yr, None
        yi = mm("...p,pk->...k", xr, wi)
        if xi is not None:
            yi = yi + mm("...p,pk->...k", xi, wr)
        return yr, yi

    b = xr.shape[:-1]
    if sign < 0:
        # forward: natural j = q + n2·p → (p, q); stage W1 over p,
        # twiddle, stage W2 over q; keep (k1, k2) — no merge permute
        ar = xr.reshape(*b, n1, n2)
        ai = xi.reshape(*b, n1, n2) if xi is not None else None
        w1 = _dft_matrix(n1, -1.0)
        w1r = jnp.asarray(w1.real.copy())
        w1i = jnp.asarray(w1.imag.copy())
        br = mm("...pq,pk->...kq", ar, w1r)
        bi = mm("...pq,pk->...kq", ar, w1i)
        if ai is not None:
            br = br - mm("...pq,pk->...kq", ai, w1i)
            bi = bi + mm("...pq,pk->...kq", ai, w1r)
        tw = _twiddle(n1, n2, -1.0) * scale
        twr = jnp.asarray(tw.real.copy())
        twi = jnp.asarray(tw.imag.copy())
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        w2 = _dft_matrix(n2, -1.0)
        w2r = jnp.asarray(w2.real.copy())
        w2i = jnp.asarray(w2.imag.copy())
        yr = mm("...kq,qm->...km", cr, w2r) - mm("...kq,qm->...km", ci, w2i)
        if real_output:
            return yr.reshape(*b, n), None
        yi = mm("...kq,qm->...km", cr, w2i) + mm("...kq,qm->...km", ci, w2r)
        return yr.reshape(*b, n), yi.reshape(*b, n)

    # inverse from scrambled (k1, k2): W2⁻¹ over k2 → conj twiddle
    # (carrying scale) → W1⁻¹ over k1 → natural (p, q)
    ar = xr.reshape(*b, n1, n2)
    ai = xi.reshape(*b, n1, n2) if xi is not None else None
    w2 = _dft_matrix(n2, +1.0)
    w2r = jnp.asarray(w2.real.copy())
    w2i = jnp.asarray(w2.imag.copy())
    br = mm("...km,mq->...kq", ar, w2r)
    bi = mm("...km,mq->...kq", ar, w2i)
    if ai is not None:
        br = br - mm("...km,mq->...kq", ai, w2i)
        bi = bi + mm("...km,mq->...kq", ai, w2r)
    tw = _twiddle(n1, n2, +1.0) * scale
    twr = jnp.asarray(tw.real.copy())
    twi = jnp.asarray(tw.imag.copy())
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    w1 = _dft_matrix(n1, +1.0)
    w1r = jnp.asarray(w1.real.copy())
    w1i = jnp.asarray(w1.imag.copy())
    yr = mm("...kq,kp->...pq", cr, w1r) - mm("...kq,kp->...pq", ci, w1i)
    if real_output:
        return yr.reshape(*b, n), None
    yi = mm("...kq,kp->...pq", cr, w1i) + mm("...kq,kp->...pq", ci, w1r)
    return yr.reshape(*b, n), yi.reshape(*b, n)


# Fused Pallas kernels replace the einsum path per axis on real TPUs
# (one HBM pass per axis instead of 2-3); MERFISH3D_PFFT=0|1 overrides.
_PFFT_ENV = _os.environ.get("MERFISH3D_PFFT", "auto")


def use_pfft() -> bool:
    if _PFFT_ENV == "1":
        return True
    if _PFFT_ENV == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - device probing must not fail
        return False


def _einsum_axis_fwd(xr, xi, ax):
    xr = jnp.moveaxis(xr, ax, -1)
    xi = jnp.moveaxis(xi, ax, -1) if xi is not None else None
    xr, xi = _last_axis_ct_pair_s(xr, xi, -1.0)
    return jnp.moveaxis(xr, -1, ax), jnp.moveaxis(xi, -1, ax)


def _einsum_axis_inv(xr, xi, ax, real_output=False):
    xr = jnp.moveaxis(xr, ax, -1)
    xi = jnp.moveaxis(xi, ax, -1) if xi is not None else None
    xr, xi = _last_axis_ct_pair_s(
        xr, xi, +1.0, scale=1.0 / xr.shape[-1], real_output=real_output
    )
    xr = jnp.moveaxis(xr, -1, ax)
    xi = jnp.moveaxis(xi, -1, ax) if xi is not None else None
    return xr, xi


def fftn_pair_s(xr: jnp.ndarray, xi=None, axes=None):
    """Forward N-D DFT on a pair, scrambled per-axis spectrum order.

    On TPU, 3D volumes route each qualifying axis through the fused
    single-pass Pallas kernels (`ops/pfft.py`); other axes/platforms use
    the einsum Cooley-Tukey as a moveaxis CYCLE — each step rotates the
    current leading axis to trailing and transforms it there, so every
    matmul contracts a trailing dim. Pointwise-compatible with any
    spectrum produced by this function; invert with
    :func:`ifftn_pair_s`. Frequency values at position s along an axis
    of length n are ``fftfreq(n)[scramble_perm(n)[s]]``."""
    xr = xr.astype(jnp.float32)
    if xi is not None:
        xi = xi.astype(jnp.float32)
    nd = xr.ndim
    axes = tuple(axes) if axes is not None else None  # may be a one-shot iterable
    if axes is not None and axes != tuple(range(nd)):
        for ax in axes:
            xr, xi = _einsum_axis_fwd(xr, xi, ax)
        return xr, xi
    if nd == 3 and use_pfft():
        from . import pfft

        # leading+trailing fused first when the shape qualifies — both
        # axes ride ONE HBM pass, and both see the (possibly real) input
        if pfft.zx_supported(xr.shape):
            xr, xi = pfft.dft_zx(xr, xi)
            if pfft.axis_supported(xr.shape, 1):
                return pfft.dft_axis_3d(xr, xi, 1)
            return _einsum_axis_fwd(xr, xi, 1)
        # trailing (largest) axis first: transformed while the input may
        # still be real — half the channel work on that axis
        for ax in (2, 1, 0):
            if pfft.axis_supported(xr.shape, ax):
                xr, xi = pfft.dft_axis_3d(xr, xi, ax)
            else:
                xr, xi = _einsum_axis_fwd(xr, xi, ax)
        return xr, xi
    for _ in range(nd):
        xr = jnp.moveaxis(xr, 0, -1)
        xi = jnp.moveaxis(xi, 0, -1) if xi is not None else None
        xr, xi = _last_axis_ct_pair_s(xr, xi, -1.0)
    return xr, xi


def conv_pair_s(xr: jnp.ndarray, xi, H_pair, real_output: bool = False):
    """Full 3D spectrum-domain convolution on a (real, imag) pair:
    ``ifftn_pair_s(fftn_pair_s(x) * H)`` with ``H`` in `fftn_pair_s`
    order.

    On TPU shapes where both fused passes qualify, the whole convolution
    runs as THREE Pallas kernels — fused z+x forward, fused y
    conv (forward·OTF·inverse in one pass), fused z+x inverse — i.e.
    three HBM read+write sweeps total, vs seven plus a spectrum-multiply
    pass for the composed per-axis path. Elsewhere it composes the
    existing transforms (identical math)."""
    xr = xr.astype(jnp.float32)
    if xi is not None:
        xi = xi.astype(jnp.float32)
    hr, hi = H_pair
    if xr.ndim == 3 and use_pfft():
        from . import pfft

        if pfft.zx_supported(xr.shape) and pfft.mid_conv_supported(xr.shape):
            # intermediate spectra exist only between the three kernel
            # passes; bf16 halves their HBM traffic (`pfft.spec_bf16`).
            # 16-bit blocks need 16-row sublane tiles → requires ny % 16.
            spec16 = pfft.spec_bf16() and xr.shape[1] % 16 == 0
            mid = jnp.bfloat16 if spec16 else jnp.float32
            fr, fi = pfft.dft_zx(xr, xi, out_dtype=mid)
            gr, gi = pfft.dft_mid_conv(fr, fi, hr, hi, out_dtype=mid)
            return pfft.dft_zx(gr, gi, inverse=True, real_output=real_output)
    fr, fi = fftn_pair_s(xr, xi)
    yr = fr * hr - fi * hi
    yi = fr * hi + fi * hr
    return ifftn_pair_s(yr, yi, real_output=real_output)


def ifftn_pair_s(xr: jnp.ndarray, xi, axes=None, real_output: bool = False):
    """Inverse N-D DFT consuming :func:`fftn_pair_s` ordering.
    ``real_output`` skips the imaginary channel of the final axis —
    callers that keep only the real part (real→real convolution) save
    half its work."""
    xr = xr.astype(jnp.float32)
    xi = xi.astype(jnp.float32) if xi is not None else None
    nd = xr.ndim
    axes = tuple(axes) if axes is not None else None  # may be a one-shot iterable
    if axes is not None and axes != tuple(range(nd)):
        for pos, ax in enumerate(axes):
            xr, xi = _einsum_axis_inv(
                xr, xi, ax, real_output=real_output and pos == len(axes) - 1
            )
        return xr, xi
    if nd == 3 and use_pfft():
        from . import pfft

        # leading+trailing fused last: one HBM pass for both axes, with
        # real_output halving the final write
        if pfft.zx_supported(xr.shape):
            if pfft.axis_supported(xr.shape, 1):
                xr, xi = pfft.dft_axis_3d(xr, xi, 1, inverse=True)
            else:
                xr, xi = _einsum_axis_inv(xr, xi, 1)
            return pfft.dft_zx(
                xr, xi, inverse=True, real_output=real_output
            )
        # trailing (largest) axis LAST so real_output halves its work
        for ax in (1, 0, 2):
            ro = real_output and ax == 2
            if pfft.axis_supported(xr.shape, ax):
                xr, xi = pfft.dft_axis_3d(
                    xr, xi, ax, inverse=True, real_output=ro
                )
            else:
                xr, xi = _einsum_axis_inv(xr, xi, ax, real_output=ro)
        return xr, xi
    for step in range(nd):
        last = step == nd - 1
        xr = jnp.moveaxis(xr, 0, -1)
        xi = jnp.moveaxis(xi, 0, -1) if xi is not None else None
        xr, xi = _last_axis_ct_pair_s(
            xr, xi, +1.0, scale=1.0 / xr.shape[-1],
            real_output=real_output and last,
        )
    return xr, xi
