"""Device-side global-normalization seeding statistics match the host
reference path exactly (reference `_global_normalization_vectors:688-873`:
per-image percentile cuts, medians over the across-tile unions of the
thresholded pixels)."""

import numpy as np

import jax.numpy as jnp

from merfish3d_tpu.ops.filters import gaussian_lowpass
from merfish3d_tpu.pipeline.decoder import _seed_stats_program


def _host_reference(stacks, z_slice, sigma, hot_threshold, low_cut, high_cut):
    T, B = stacks.shape[:2]
    norm = np.ones(B, np.float32)
    bg = np.zeros(B, np.float32)
    for b in range(B):
        images = []
        for t in range(T):
            img = stacks[t, b]
            med = np.median(img[img.shape[0] // 2])
            img = np.where(img > hot_threshold, med, img)
            img = img[z_slice]
            img = np.asarray(
                gaussian_lowpass(jnp.asarray(img), sigma=sigma), np.float32
            )
            images.append(img)
        low = np.concatenate(
            [im[im < np.percentile(im, low_cut)].ravel() for im in images]
        )
        bg[b] = np.median(low) if low.size else 0.0
        high = []
        for im in images:
            sh = np.clip(im - bg[b], 0, None)
            high.append(sh[sh > np.percentile(sh, high_cut)].ravel())
        high = np.concatenate(high)
        norm[b] = np.median(high) if high.size else 1.0
    return norm, bg


def test_seed_stats_program_matches_host_reference():
    rng = np.random.default_rng(0)
    T, B, Z, Y, X = 2, 5, 8, 32, 32
    stacks = rng.uniform(0, 400, (T, B, Z, Y, X)).astype(np.float32)
    stacks[0, 1, 3, 5, 5] = 60000.0  # hot pixel replaced by mid-plane median
    sigma = (1.0, 1.0, 1.0)

    norm, bg = np.asarray(
        _seed_stats_program(
            jnp.asarray(stacks),
            z_start=1,
            z_stop=7,
            sigma=sigma,
            hot_threshold=50000.0,
            low_cut=10.0,
            high_cut=90.0,
        )
    )
    ref_norm, ref_bg = _host_reference(
        stacks, slice(1, 7), sigma, 50000.0, 10.0, 90.0
    )
    np.testing.assert_allclose(np.asarray(bg), ref_bg, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(norm), ref_norm, rtol=2e-5, atol=1e-4)
