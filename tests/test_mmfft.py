"""Matmul FFT vs numpy FFT equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from merfish3d_tpu.ops import mmfft


@pytest.mark.parametrize("n", [2, 3, 7, 16, 48, 96, 144, 1152])
def test_fft_1d_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    got = np.asarray(mmfft.fftn(jnp.asarray(x), axes=(0,)))
    ref = np.fft.fft(x)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3 * np.abs(ref).max())


def test_fftn_ifftn_roundtrip_3d():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(6, 24, 36)) + 1j * rng.normal(size=(6, 24, 36))).astype(
        np.complex64
    )
    f = mmfft.fftn(jnp.asarray(x))
    ref = np.fft.fftn(x)
    np.testing.assert_allclose(
        np.asarray(f), ref, rtol=2e-4, atol=2e-3 * np.abs(ref).max()
    )
    back = np.asarray(mmfft.ifftn(f))
    np.testing.assert_allclose(back, x, atol=2e-4 * np.abs(x).max() + 1e-5)


def test_fft_conv_equivalence():
    """Full-spectrum matmul-FFT convolution == jnp.fft convolution."""
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(8, 48, 60)).astype(np.float32)
    kern = rng.normal(size=(8, 48, 60)).astype(np.float32)
    otf = np.fft.fftn(kern)
    ref = np.real(np.fft.ifftn(np.fft.fftn(vol) * otf)).astype(np.float32)
    got = np.asarray(
        jnp.real(
            mmfft.ifftn(mmfft.fftn(jnp.asarray(vol)) * jnp.asarray(otf, jnp.complex64))
        )
    )
    np.testing.assert_allclose(got, ref, atol=3e-3 * np.abs(ref).max())


@pytest.mark.parametrize("shape", [(6, 24, 36), (12, 36, 100), (4, 128, 144)])
def test_scrambled_pair_roundtrip_and_order(shape):
    """fftn_pair_s output == natural spectrum permuted by scramble_perm;
    ifftn_pair_s inverts it exactly (real + imaginary channels)."""
    rng = np.random.default_rng(sum(shape))
    x = rng.standard_normal(shape).astype(np.float32)
    fr, fi = mmfft.fftn_pair_s(jnp.asarray(x))
    ref = np.fft.fftn(x)
    perms = [mmfft.scramble_perm(n) for n in shape]
    ref_s = ref[np.ix_(*perms)]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(fr), ref_s.real, atol=3e-4 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref_s.imag, atol=3e-4 * scale)
    yr, yi = mmfft.ifftn_pair_s(fr, fi)
    np.testing.assert_allclose(np.asarray(yr), x, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(yi), 0.0, atol=2e-4 * scale)


def test_scrambled_pair_conv_matches_numpy():
    """conv through scrambled spectra == numpy FFT conv (order-opaque
    pointwise multiply is exact under any consistent permutation)."""
    rng = np.random.default_rng(7)
    vol = rng.standard_normal((8, 48, 60)).astype(np.float32)
    kern = rng.standard_normal((8, 48, 60)).astype(np.float32)
    Hr, Hi = mmfft.fftn_pair_s(jnp.asarray(kern))
    fr, fi = mmfft.fftn_pair_s(jnp.asarray(vol))
    gr = fr * Hr - fi * Hi
    gi = fr * Hi + fi * Hr
    cr, _ci = mmfft.ifftn_pair_s(gr, gi)
    ref = np.real(np.fft.ifftn(np.fft.fftn(vol) * np.fft.fftn(kern)))
    np.testing.assert_allclose(np.asarray(cr), ref, atol=3e-3 * np.abs(ref).max())


def test_scramble_perm_is_permutation():
    for n in [2, 7, 48, 96, 100, 144, 1152]:
        p = mmfft.scramble_perm(n)
        assert sorted(p.tolist()) == list(range(n))


def test_spectrum_freqs_matches_impl_order(monkeypatch):
    """fftutils.spectrum_freqs must expose exactly the per-axis frequency
    ordering fftn_spec produces, for both implementations."""
    from merfish3d_tpu.ops import fftutils

    n = 144
    for impl in ("matmul", "xla"):
        monkeypatch.setattr(fftutils, "_FFT_IMPL", impl)
        freqs = fftutils.spectrum_freqs(n)
        # delta at position d has spectrum exp(-2πi f d): recover f from
        # the first nontrivial phase and compare
        x = np.zeros(n, np.float32)
        d = 3
        x[d] = 1.0
        if impl == "matmul":
            fr, fi = mmfft.fftn_pair_s(jnp.asarray(x)[None, :], axes=(1,))
            spec = np.asarray(fr)[0] + 1j * np.asarray(fi)[0]
        else:
            spec = np.fft.fft(x)
        expect = np.exp(-2j * np.pi * freqs * d)
        np.testing.assert_allclose(spec, expect, atol=1e-4)


def test_pair_s_one_shot_axes_iterable():
    """A generator/iterator passed as ``axes`` must transform the listed
    axes (review r3: ``tuple(axes)`` exhausted the iterable, silently
    returning the input untransformed)."""
    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    fr_t, fi_t = mmfft.fftn_pair_s(jnp.asarray(x), axes=(1,))
    fr_g, fi_g = mmfft.fftn_pair_s(jnp.asarray(x), axes=iter((1,)))
    np.testing.assert_allclose(np.asarray(fr_g), np.asarray(fr_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi_g), np.asarray(fi_t), atol=1e-5)
    yr, yi = mmfft.ifftn_pair_s(fr_g, fi_g, axes=iter((1,)))
    np.testing.assert_allclose(np.asarray(yr), x, atol=1e-4)


def test_ifftn_pair_s_explicit_axes_real_output():
    """real_output must drop the imaginary channel on the LAST explicit
    axis too (review r3: the explicit-axes branch ignored the flag)."""
    rng = np.random.default_rng(10)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    fr, fi = mmfft.fftn_pair_s(jnp.asarray(x))
    yr, yi = mmfft.ifftn_pair_s(fr, fi, axes=(1, 0), real_output=True)
    assert yi is None
    np.testing.assert_allclose(np.asarray(yr), x, atol=1e-4)
