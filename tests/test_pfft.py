"""Fused Pallas DFT kernels vs numpy FFT (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from merfish3d_tpu.ops import mmfft, pfft

SHAPE = (8, 256, 384)  # z dense, y = 2*128, x = 3*128


def _perm(n):
    return mmfft.scramble_perm(n)


@pytest.fixture()
def vol():
    rng = np.random.default_rng(0)
    return (
        rng.standard_normal(SHAPE).astype(np.float32),
        rng.standard_normal(SHAPE).astype(np.float32),
    )


def test_axis_supported_policy():
    assert pfft.supported_ct_axis(256)
    assert pfft.supported_ct_axis(1152)
    assert not pfft.supported_ct_axis(128)  # n1 == 1
    assert not pfft.supported_ct_axis(1044)
    assert pfft.supported_dense_axis(40)
    assert not pfft.supported_dense_axis(128)
    assert pfft.axis_supported(SHAPE, 0)
    assert pfft.axis_supported(SHAPE, 1)
    assert pfft.axis_supported(SHAPE, 2)
    assert not pfft.axis_supported((8, 256, 100), 1)  # lanes not 128k


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("complex_in", [False, True])
def test_forward_matches_numpy(vol, axis, complex_in):
    xr, xi = vol
    with pltpu.force_tpu_interpret_mode():
        yr, yi = pfft.dft_axis_3d(
            jnp.asarray(xr), jnp.asarray(xi) if complex_in else None, axis
        )
    x = xr + 1j * xi if complex_in else xr
    ref = np.fft.fft(x, axis=axis)
    p = _perm(SHAPE[axis])
    ref = np.take(ref, p, axis=axis)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=3e-5 * scale)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_inverse_roundtrip(vol, axis):
    xr, xi = vol
    with pltpu.force_tpu_interpret_mode():
        fr, fi = pfft.dft_axis_3d(jnp.asarray(xr), jnp.asarray(xi), axis)
        yr, yi = pfft.dft_axis_3d(fr, fi, axis, inverse=True)
    scale = np.abs(xr).max()
    np.testing.assert_allclose(np.asarray(yr), xr, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(yi), xi, atol=2e-5 * scale)


def test_inverse_real_output_trailing(vol):
    xr, xi = vol
    with pltpu.force_tpu_interpret_mode():
        fr, fi = pfft.dft_axis_3d(jnp.asarray(xr), None, 2)
        yr, yi = pfft.dft_axis_3d(fr, fi, 2, inverse=True, real_output=True)
    assert yi is None
    np.testing.assert_allclose(
        np.asarray(yr), xr, atol=2e-5 * np.abs(xr).max()
    )


def test_zx_supported_policy():
    assert pfft.zx_supported(SHAPE)
    assert pfft.zx_supported((40, 1152, 1152))  # RLGC bench shape
    assert not pfft.zx_supported((128, 256, 384))  # z not dense
    assert not pfft.zx_supported((8, 256, 100))  # x not CT
    assert not pfft.zx_supported((8, 252, 384))  # y not row-block divisible


@pytest.mark.parametrize("complex_in", [False, True])
def test_zx_forward_matches_numpy(vol, complex_in):
    xr, xi = vol
    with pltpu.force_tpu_interpret_mode():
        yr, yi = pfft.dft_zx(
            jnp.asarray(xr), jnp.asarray(xi) if complex_in else None
        )
    x = xr + 1j * xi if complex_in else xr
    ref = np.fft.fft(np.fft.fft(x, axis=0), axis=2)
    ref = np.take(ref, _perm(SHAPE[2]), axis=2)  # z perm is identity
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=3e-5 * scale)


def test_zx_inverse_roundtrip_real_output(vol):
    xr, _ = vol
    with pltpu.force_tpu_interpret_mode():
        fr, fi = pfft.dft_zx(jnp.asarray(xr), None)
        yr, yi = pfft.dft_zx(fr, fi, inverse=True, real_output=True)
    assert yi is None
    np.testing.assert_allclose(
        np.asarray(yr), xr, atol=2e-5 * np.abs(xr).max()
    )


def test_zx_matches_per_axis_kernels(vol):
    """The fused pass must emit the SAME spectrum ordering as the
    per-axis kernels so OTFs and data stay pointwise-compatible."""
    xr, xi = vol
    with pltpu.force_tpu_interpret_mode():
        fr, fi = pfft.dft_zx(jnp.asarray(xr), jnp.asarray(xi))
        ar, ai = pfft.dft_axis_3d(jnp.asarray(xr), jnp.asarray(xi), 2)
        ar, ai = pfft.dft_axis_3d(ar, ai, 0)
    scale = np.abs(np.asarray(ar)).max()
    np.testing.assert_allclose(np.asarray(fr), np.asarray(ar), atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(ai), atol=3e-5 * scale)


def test_mid_conv_matches_separate_passes(vol):
    """Fused y-conv (fwd·OTF·inv in one pass) must equal the composed
    fwd → multiply → inv middle-axis kernels."""
    xr, xi = vol
    rng = np.random.default_rng(7)
    hr = rng.standard_normal(SHAPE).astype(np.float32)
    hi = rng.standard_normal(SHAPE).astype(np.float32)
    assert pfft.mid_conv_supported(SHAPE)
    with pltpu.force_tpu_interpret_mode():
        cr, ci = pfft.dft_mid_conv(
            jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(hr), jnp.asarray(hi)
        )
        fr, fi = pfft.dft_axis_3d(jnp.asarray(xr), jnp.asarray(xi), 1)
        mr = fr * hr - fi * hi
        mi = fr * hi + fi * hr
        ar, ai = pfft.dft_axis_3d(mr, mi, 1, inverse=True)
    scale = max(np.abs(np.asarray(ar)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(ar), atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(ci), np.asarray(ai), atol=5e-5 * scale)


def test_conv_pair_s_fused_matches_numpy(vol, monkeypatch):
    """The three-Pallas-pass convolution (zx fwd → y conv → zx inv) must
    reproduce a numpy FFT convolution end to end."""
    from merfish3d_tpu.ops import mmfft

    monkeypatch.setenv("MERFISH3D_PFFT", "1")
    monkeypatch.setattr(mmfft, "_PFFT_ENV", "1")
    xr, _ = vol
    rng = np.random.default_rng(11)
    kern = rng.standard_normal(SHAPE).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        H = mmfft.fftn_pair_s(jnp.asarray(kern))
        yr, yi = mmfft.conv_pair_s(jnp.asarray(xr), None, H, real_output=True)
    assert yi is None
    ref = np.fft.ifftn(np.fft.fftn(xr) * np.fft.fftn(kern)).real
    np.testing.assert_allclose(
        np.asarray(yr), ref, atol=5e-5 * np.abs(ref).max()
    )


def test_full_conv_through_pfft_dispatch(vol, monkeypatch):
    """fftn_pair_s/ifftn_pair_s with the pfft dispatch forced on must
    reproduce a numpy FFT convolution end to end."""
    monkeypatch.setattr(mmfft, "_PFFT_ENV", "1")
    xr, _ = vol
    rng = np.random.default_rng(1)
    kern = rng.standard_normal(SHAPE).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        Hr, Hi = mmfft.fftn_pair_s(jnp.asarray(kern))
        fr, fi = mmfft.fftn_pair_s(jnp.asarray(xr))
        gr = fr * Hr - fi * Hi
        gi = fr * Hi + fi * Hr
        yr, yi = mmfft.ifftn_pair_s(gr, gi, real_output=True)
    assert yi is None
    ref = np.real(np.fft.ifftn(np.fft.fftn(xr) * np.fft.fftn(kern)))
    np.testing.assert_allclose(
        np.asarray(yr), ref, atol=3e-3 * np.abs(ref).max()
    )


def test_axis0_rejects_ragged_ny():
    """axis_supported(…, 0) must require ny % 8 == 0: the leading-axis
    grid tiles y in blocks of >= 8 rows, and a non-dividing ny silently
    dropped the tail rows (review r3)."""
    from merfish3d_tpu.ops import pfft

    assert not pfft.axis_supported((48, 100, 256), 0)
    assert pfft.axis_supported((48, 96, 256), 0)


def test_inverse_with_real_input_pair():
    """dft_trailing/dft_zx accept xi=None with inverse=True (review r3:
    the thin forward placeholder mis-shaped the inverse contraction)."""
    from jax.experimental.pallas import tpu as pltpu

    from merfish3d_tpu.ops import pfft

    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 256)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        fr, fi = pfft.dft_trailing(jnp.asarray(x), None)
        yr, _ = pfft.dft_trailing(fr, None, inverse=True)
        # inverse of (real part of spectrum) = even part of x
        x_rev = np.concatenate([x[:, :1], x[:, :0:-1]], axis=1)
        np.testing.assert_allclose(
            np.asarray(yr), 0.5 * (x + x_rev), atol=1e-3
        )


@pytest.mark.parametrize("mode", ["bf16x3", "bf16"])
def test_dot_mode_accuracy(vol, mode, monkeypatch):
    """The reduced-pass stage-2 matmul modes (`pfft._dot_mode`) stay
    within their documented error envelopes vs the HIGHEST path: bf16x3
    (the TPU default) well under the pipeline's f16 storage rounding
    (5e-4 relative), single-pass bf16 under ~5e-3."""
    xr, xi = vol
    monkeypatch.setenv("MERFISH3D_PFFT_DOT", "highest")
    with pltpu.force_tpu_interpret_mode():
        rr, ri = pfft.dft_axis_3d(jnp.asarray(xr), jnp.asarray(xi), 1)
    monkeypatch.setenv("MERFISH3D_PFFT_DOT", mode)
    with pltpu.force_tpu_interpret_mode():
        yr, yi = pfft.dft_axis_3d(jnp.asarray(xr), jnp.asarray(xi), 1)
    scale = float(np.abs(np.asarray(rr)).max())
    tol = (1e-4 if mode == "bf16x3" else 5e-3) * scale
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), atol=tol)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), atol=tol)
    if mode == "bf16x3":
        err = float(np.abs(np.asarray(yr) - np.asarray(rr)).max())
        assert err < 5e-4 * scale


def test_conv_pair_s_bf16_spectra(vol, monkeypatch):
    """bf16 intermediate spectra (`pfft.spec_bf16`) stay within ~1%
    of the f32-spectrum convolution — the HBM-diet mode the TPU default
    uses (docs/kernels.md r3f)."""
    from merfish3d_tpu.ops import mmfft

    monkeypatch.setenv("MERFISH3D_PFFT", "1")
    monkeypatch.setattr(mmfft, "_PFFT_ENV", "1")
    xr, _ = vol
    rng = np.random.default_rng(11)
    kern = rng.standard_normal(SHAPE).astype(np.float32)
    monkeypatch.setenv("MERFISH3D_PFFT_SPEC", "f32")
    with pltpu.force_tpu_interpret_mode():
        H = mmfft.fftn_pair_s(jnp.asarray(kern))
        rr, _ = mmfft.conv_pair_s(jnp.asarray(xr), None, H, real_output=True)
    monkeypatch.setenv("MERFISH3D_PFFT_SPEC", "bf16")
    with pltpu.force_tpu_interpret_mode():
        yr, _ = mmfft.conv_pair_s(jnp.asarray(xr), None, H, real_output=True)
    scale = float(np.abs(np.asarray(rr)).max())
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), atol=1e-2 * scale)
