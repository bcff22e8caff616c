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
