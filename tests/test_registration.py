"""Phase-correlation + warp tests modeled on the reference GPU contract
tests (`test_sofima_deformable_registration.py:121-221`): synthetic sums of
anisotropic Gaussians, known shifts recovered under the warp convention."""

import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from merfish3d_tpu.ops.phase_corr import phase_cross_correlation
from merfish3d_tpu.ops.registration import register_pair_to_fixed
from merfish3d_tpu.ops.warp import warp_affine, warp_affine_plus_flow


def _gaussian_blobs(shape=(16, 64, 64), n=12, seed=0, offset=(0.0, 0.0, 0.0),
                    noise=0.5, noise_seed=100):
    """Sum of anisotropic Gaussians evaluated analytically at coordinates
    shifted by ``offset`` (so a shifted copy has no interpolation artifacts),
    plus independent sensor-like noise for spectral texture."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
    )
    zz, yy, xx = zz - offset[0], yy - offset[1], xx - offset[2]
    vol = np.zeros(shape, np.float32)
    for _ in range(n):
        c = [rng.uniform(10, s - 10) if s > 24 else rng.uniform(3, max(s - 3, 4)) for s in shape]
        amp = rng.uniform(200, 1000)
        vol += (amp * np.exp(
            -((zz - c[0]) ** 2) / (2 * 1.2**2)
            - ((yy - c[1]) ** 2) / (2 * 1.2**2)
            - ((xx - c[2]) ** 2) / (2 * 1.2**2)
        )).astype(np.float32)
    nrng = np.random.default_rng(noise_seed)
    vol += nrng.normal(0, noise, shape).astype(np.float32)
    return vol


def test_phase_corr_integer_shift_2d():
    img = _gaussian_blobs((1, 96, 96), n=40)[0]
    moved = _gaussian_blobs((1, 96, 96), n=40, offset=(0, 7, -11), noise_seed=101)[0]
    # push convention (skimage): returns the negative of the applied shift
    shift = np.asarray(phase_cross_correlation(jnp.asarray(img), jnp.asarray(moved)))
    np.testing.assert_allclose(shift, [-7, 11], atol=0.15)


def test_phase_corr_subpixel_2d():
    img = _gaussian_blobs((1, 96, 96), n=40)[0]
    moved = _gaussian_blobs((1, 96, 96), n=40, offset=(0, 3.4, -2.6), noise_seed=101)[0]
    shift = np.asarray(
        phase_cross_correlation(jnp.asarray(img), jnp.asarray(moved), upsample_factor=10)
    )
    np.testing.assert_allclose(shift, [-3.4, 2.6], atol=0.2)


def test_phase_corr_3d_shift():
    vol = _gaussian_blobs()
    moved = _gaussian_blobs(offset=(2.0, -5.0, 3.0), noise_seed=101)
    shift = np.asarray(
        phase_cross_correlation(jnp.asarray(vol), jnp.asarray(moved), upsample_factor=10)
    )
    np.testing.assert_allclose(shift, [-2.0, 5.0, -3.0], atol=0.25)


def test_warp_affine_translation_convention():
    """transform maps reference coords → moving coords: warping `moving`
    created by shifting `fixed` with the registered transform must
    reproduce `fixed`."""
    vol = _gaussian_blobs()
    spacing = (0.31, 0.098, 0.098)
    pull_px = np.array([1.0, 4.0, -6.0])
    # moving(p) = fixed(p - pull) → sampling moving at p+pull recovers fixed
    moving = scipy.ndimage.shift(vol, pull_px, order=1)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, 3] = pull_px * np.asarray(spacing)
    warped = warp_affine(
        moving,
        transform_zyx_um=transform,
        spacing_zyx_um=spacing,
        reference_shape=vol.shape,
    )
    interior = (slice(3, -3),) * 3
    err = np.abs(warped[interior] - vol[interior])
    assert np.median(err) < 1.0
    assert np.corrcoef(warped[interior].ravel(), vol[interior].ravel())[0, 1] > 0.999


def test_register_pair_recovers_known_shift():
    vol = _gaussian_blobs(shape=(16, 96, 96), n=40, seed=3)
    spacing = (0.31, 0.098, 0.098)
    true_pull = np.array([1.0, 6.0, -9.0], dtype=np.float32)
    moving = _gaussian_blobs(shape=(16, 96, 96), n=40, seed=3, offset=true_pull,
                             noise_seed=101)
    transform = register_pair_to_fixed(vol, moving, spacing_zyx_um=spacing)
    est_pull_px = transform[:3, 3] / np.asarray(spacing)
    np.testing.assert_allclose(est_pull_px, true_pull, atol=0.5)
    # applying the transform aligns moving to fixed
    warped = warp_affine(
        moving,
        transform_zyx_um=transform,
        spacing_zyx_um=spacing,
        reference_shape=vol.shape,
    )
    interior = (slice(3, -3), slice(12, -12), slice(12, -12))
    assert np.corrcoef(warped[interior].ravel(), vol[interior].ravel())[0, 1] > 0.99


def test_warp_affine_plus_flow_identity_flow_matches_affine():
    vol = _gaussian_blobs()
    spacing = (0.31, 0.098, 0.098)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, 3] = np.array([0.5, 2.0, -1.0]) * np.asarray(spacing)
    flow = np.zeros((3, 4, 8, 8), np.float32)
    a = warp_affine(
        vol, transform_zyx_um=transform, spacing_zyx_um=spacing, reference_shape=vol.shape
    )
    b = warp_affine_plus_flow(
        vol,
        flow,
        transform_zyx_um=transform,
        spacing_zyx_um=spacing,
        reference_shape=vol.shape,
        map_stride_zyx_px=(4.0, 8.0, 8.0),
        map_box_start_xyz_px=(4.0, 4.0, 2.0),
    )
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_warp_affine_plus_flow_constant_flow():
    """A constant flow of +2 px in X equals an affine with +2 px X pull."""
    vol = _gaussian_blobs()
    spacing = (0.31, 0.098, 0.098)
    identity = np.eye(4, dtype=np.float32)
    flow = np.zeros((3, 4, 8, 8), np.float32)
    flow[0] = 2.0  # X displacement in reference px
    shift_transform = np.eye(4, dtype=np.float32)
    shift_transform[2, 3] = 2.0 * spacing[2]
    a = warp_affine(
        vol, transform_zyx_um=shift_transform, spacing_zyx_um=spacing,
        reference_shape=vol.shape,
    )
    b = warp_affine_plus_flow(
        vol,
        flow,
        transform_zyx_um=identity,
        spacing_zyx_um=spacing,
        reference_shape=vol.shape,
        map_stride_zyx_px=(4.0, 8.0, 8.0),
        map_box_start_xyz_px=(4.0, 4.0, 2.0),
    )
    interior = (slice(1, -1), slice(4, -4), slice(4, -4))
    np.testing.assert_allclose(a[interior], b[interior], atol=0.5)


def test_translate_volume_matches_affine_warp_interior():
    """The separable roll-blend translation equals the trilinear affine
    warp away from the boundary strip (same pull-shift convention)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.warp import (
        _affine_warp_core,
        translate_volume,
        transform_to_pixel,
    )

    rng = np.random.default_rng(4)
    vol = rng.uniform(0, 100, (10, 24, 28)).astype(np.float32)
    spacing = np.asarray([0.31, 0.098, 0.098], np.float32)
    pull_px = np.asarray([1.3, -2.6, 3.75], np.float32)

    xform = np.eye(4, dtype=np.float32)
    xform[:3, 3] = pull_px * spacing
    m, o = transform_to_pixel(xform, spacing)
    ref = np.asarray(
        _affine_warp_core(
            jnp.asarray(vol), jnp.asarray(m), jnp.asarray(o),
            reference_shape=vol.shape,
        )
    )
    fast = np.asarray(translate_volume(jnp.asarray(vol), jnp.asarray(pull_px)))
    interior = (slice(3, -3), slice(4, -4), slice(5, -5))
    np.testing.assert_allclose(fast[interior], ref[interior], atol=1e-4)


def test_separable_diagonal_resample_matches_gather():
    """Scale+translation warps through the separable per-axis path equal
    the general map_coordinates gather (tensor-product linearity)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.warp import (
        _affine_warp_core,
        separable_diagonal_resample,
    )

    rng = np.random.default_rng(6)
    vol = rng.uniform(0, 100, (8, 40, 44)).astype(np.float32)
    scale = np.asarray([1.02, 0.97, 1.01], np.float32)
    offset = np.asarray([0.4, -1.3, 2.6], np.float32)
    ref = np.asarray(
        _affine_warp_core(
            jnp.asarray(vol),
            jnp.asarray(np.diag(scale)),
            jnp.asarray(offset),
            reference_shape=vol.shape,
        )
    )
    fast = np.asarray(
        separable_diagonal_resample(
            jnp.asarray(vol), jnp.asarray(scale), jnp.asarray(offset)
        )
    )
    np.testing.assert_allclose(fast, ref, atol=1e-3)


def test_warp_affine_diagonal_takes_separable_path():
    """warp_affine with a chromatic-style diagonal physical transform
    produces the same volume as the general gather path."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.warp import _affine_warp_core, transform_to_pixel, warp_affine

    rng = np.random.default_rng(8)
    vol = rng.uniform(0, 100, (8, 40, 44)).astype(np.float32)
    spacing = np.asarray([0.31, 0.098, 0.098], np.float32)
    xform = np.diag([1.0, 1.004, 0.996, 1.0]).astype(np.float32)
    xform[:3, 3] = np.asarray([0.3, -0.15, 0.2]) * spacing

    out = warp_affine(
        vol, transform_zyx_um=xform, spacing_zyx_um=spacing,
        reference_shape=vol.shape,
    )
    m, o = transform_to_pixel(xform, spacing)
    ref = np.asarray(
        _affine_warp_core(
            jnp.asarray(vol), jnp.asarray(m), jnp.asarray(o),
            reference_shape=vol.shape,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_register_translation_with_quality_recovers_wrap_shift():
    """Shifts beyond half the overlap extent must be recovered through the
    wrap candidates (push-convention {s, s-size, -s, size-s}; translating
    the reference's pull-convention literals verbatim dropped the true
    wrap candidate)."""
    from scipy.ndimage import gaussian_filter

    from merfish3d_tpu.ops.phase_corr import register_translation_with_quality

    rng = np.random.default_rng(0)
    canvas = gaussian_filter(rng.normal(size=(8, 220, 100)).astype(np.float32), 2)
    fixed = canvas[:, 60:160]
    moving = canvas[:, 0:100]  # true push = -60 (beyond size/2)
    s, q = register_translation_with_quality(fixed, moving, upsample_factor=10)
    assert abs(s[1] - (-60)) < 1.0, s
    assert q > 0.9


def test_warp_affine_batch_matches_sequential():
    """Batched warps (mixed translation/diagonal/general classes) must be
    numerically identical to per-item `warp_affine`."""
    from merfish3d_tpu.ops.warp import warp_affine_batch

    rng = np.random.default_rng(11)
    images = rng.random((4, 6, 32, 40)).astype(np.float32) * 100.0
    spacing = (0.315, 0.098, 0.098)
    transforms = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    transforms[0, :3, 3] = (0.2, -0.5, 0.31)          # translation
    transforms[1, 0, 0] = 1.02                        # diagonal scale
    transforms[1, :3, 3] = (0.0, 0.2, -0.1)
    transforms[2, 1, 2] = 0.01                        # general (shear)
    transforms[2, :3, 3] = (0.1, 0.0, 0.0)
    # transforms[3] identity

    batched = warp_affine_batch(images, transforms, spacing)
    for i in range(4):
        single = warp_affine(
            images[i],
            transform_zyx_um=transforms[i],
            spacing_zyx_um=spacing,
            reference_shape=images[i].shape,
        )
        np.testing.assert_allclose(batched[i], single, atol=1e-4, err_msg=str(i))


def test_warp_affine_plus_flow_batch_matches_sequential():
    from merfish3d_tpu.ops.warp import warp_affine_plus_flow_batch

    rng = np.random.default_rng(12)
    images = rng.random((3, 6, 24, 28)).astype(np.float32) * 50.0
    flows = rng.normal(0, 0.7, (3, 3, 2, 3, 4)).astype(np.float32)
    spacing = (0.315, 0.098, 0.098)
    transforms = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    transforms[1, :3, 3] = (0.1, -0.3, 0.25)
    strides = np.tile(np.array([3.0, 8.0, 8.0], np.float32), (3, 1))
    box_starts = np.tile(np.array([4.0, 4.0, 1.5], np.float32), (3, 1))

    batched = warp_affine_plus_flow_batch(
        images, flows, transforms, spacing, strides, box_starts
    )
    for i in range(3):
        single = warp_affine_plus_flow(
            images[i],
            flows[i],
            transform_zyx_um=transforms[i],
            spacing_zyx_um=spacing,
            reference_shape=images[i].shape,
            map_stride_zyx_px=strides[i],
            map_box_start_xyz_px=box_starts[i],
        )
        np.testing.assert_allclose(batched[i], single, atol=1e-4, err_msg=str(i))


def test_warp_batch_device_matches_host():
    """The device-resident batch warps (decode's zero-readback path) must
    match the host batch warps exactly: same cores, same class split."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.warp import (
        warp_affine_batch,
        warp_affine_batch_device,
        warp_affine_plus_flow_batch,
        warp_affine_plus_flow_batch_device,
    )

    rng = np.random.default_rng(21)
    images = rng.random((4, 6, 32, 40)).astype(np.float32) * 100.0
    spacing = (0.315, 0.098, 0.098)
    transforms = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    transforms[0, :3, 3] = (0.2, -0.5, 0.31)
    transforms[1, 0, 0] = 1.02
    transforms[1, :3, 3] = (0.0, 0.2, -0.1)
    transforms[2, 1, 2] = 0.01
    host = warp_affine_batch(images, transforms, spacing)
    dev = warp_affine_batch_device(jnp.asarray(images), transforms, spacing)
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-5)

    flows = rng.normal(0, 0.7, (4, 3, 2, 3, 4)).astype(np.float32)
    strides = np.tile(np.array([3.0, 8.0, 8.0], np.float32), (4, 1))
    box_starts = np.tile(np.array([4.0, 4.0, 1.5], np.float32), (4, 1))
    host_f = warp_affine_plus_flow_batch(
        images, flows, transforms, spacing, strides, box_starts
    )
    dev_f = warp_affine_plus_flow_batch_device(
        jnp.asarray(images), flows, transforms, spacing, strides, box_starts
    )
    np.testing.assert_allclose(np.asarray(dev_f), host_f, atol=1e-5)


def _smooth_flow(lattice=(3, 5, 5), amp=(0.8, 2.5, 2.5), seed=4):
    """Lattice-smooth random flow (channels X, Y, Z), amplitudes in px."""
    rng = np.random.default_rng(seed)
    fz, fy, fx = lattice
    zz = np.linspace(0, np.pi, fz)[:, None, None]
    yy = np.linspace(0, 2 * np.pi, fy)[None, :, None]
    xx = np.linspace(0, 2 * np.pi, fx)[None, None, :]
    ph = rng.uniform(0, 2 * np.pi, 6)
    dx = amp[2] * np.sin(xx + ph[0]) * np.cos(yy + ph[1]) * np.ones_like(zz)
    dy = amp[1] * np.cos(xx + ph[2]) * np.sin(yy + ph[3]) * np.ones_like(zz)
    dz = amp[0] * np.sin(zz + ph[4]) * np.cos(xx + ph[5]) * np.ones_like(yy)
    return np.stack([dx, dy, dz]).astype(np.float32)


def test_separable_flow_warp_matches_gather_constant_flow():
    """Constant flow: the separable factorization is EXACT (the per-axis
    shift fields have zero cross-axis gradient), so the roll-blend path
    must match the trilinear gather to float tolerance everywhere."""
    vol = _gaussian_blobs()
    flow = np.zeros((3, 3, 5, 5), np.float32)
    flow[0], flow[1], flow[2] = 1.7, -2.3, 0.6
    kwargs = dict(
        transform_zyx_um=np.eye(4, dtype=np.float32),
        spacing_zyx_um=(1.0, 1.0, 1.0),
        reference_shape=vol.shape,
        map_stride_zyx_px=(6.0, 14.0, 14.0),
        map_box_start_xyz_px=(7.0, 7.0, 3.0),
    )
    fast = warp_affine_plus_flow(vol, flow, method="separable", **kwargs)
    exact = warp_affine_plus_flow(vol, flow, method="gather", **kwargs)
    # identical up to f32 accumulation-order noise (values reach ~1e3)
    np.testing.assert_allclose(fast, exact, atol=2e-3)


def test_separable_flow_warp_close_on_smooth_flow():
    """Lattice-smooth varying flow + diagonal (chromatic-scale-like)
    affine: the separable path's cross-axis evaluation error is bounded
    by |s|*||grad d|| — far under interpolation noise on SOFIMA-scale
    lattices."""
    vol = _gaussian_blobs()
    # amp/lattice chosen ROUGHER than a relaxed SOFIMA field (full sine
    # period across 4 strides); relaxation-smoothed production flows sit
    # well inside this error envelope
    flow = _smooth_flow(amp=(0.5, 1.5, 1.5))
    transform = np.eye(4, dtype=np.float32)
    transform[0, 0], transform[1, 1], transform[2, 2] = 1.001, 0.9985, 1.002
    transform[:3, 3] = (0.3, -1.2, 0.8)
    kwargs = dict(
        transform_zyx_um=transform,
        spacing_zyx_um=(1.0, 1.0, 1.0),
        reference_shape=vol.shape,
        map_stride_zyx_px=(6.0, 14.0, 14.0),
        map_box_start_xyz_px=(7.0, 7.0, 3.0),
    )
    fast = warp_affine_plus_flow(vol, flow, method="separable", **kwargs)
    exact = warp_affine_plus_flow(vol, flow, method="gather", **kwargs)
    scale = float(np.abs(vol).max())
    err = np.abs(fast - exact) / scale
    assert np.max(err) < 0.03, np.max(err)
    assert np.mean(err) < 5e-4, np.mean(err)


def test_separable_flow_warp_rejects_rotation():
    """Non-diagonal pixel affines must refuse the separable path (auto
    routes them to the gather)."""
    vol = _gaussian_blobs(shape=(8, 24, 24))
    flow = np.zeros((3, 2, 3, 3), np.float32)
    transform = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.1), np.sin(0.1)
    transform[1, 1], transform[1, 2] = c, -s
    transform[2, 1], transform[2, 2] = s, c
    kwargs = dict(
        transform_zyx_um=transform,
        spacing_zyx_um=(1.0, 1.0, 1.0),
        reference_shape=vol.shape,
        map_stride_zyx_px=(4.0, 10.0, 10.0),
        map_box_start_xyz_px=(5.0, 5.0, 2.0),
    )
    with pytest.raises(ValueError, match="separable"):
        warp_affine_plus_flow(vol, flow, method="separable", **kwargs)
    out = warp_affine_plus_flow(vol, flow, **kwargs)  # auto → gather
    assert out.shape == vol.shape and np.isfinite(out).all()


def test_large_positive_shift_recovered():
    """Shifts beyond half the axis size must be recoverable in BOTH
    directions (review r3: the wrap-alias expansion listed s-size but not
    s+size, so a negative measured peak hid a true large positive shift)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.phase_corr import register_translation_with_quality

    rng = np.random.default_rng(7)
    scene = rng.normal(size=(300, 300)).astype(np.float32)
    n = 96
    for true_push in ((60, 0), (-60, 0), (0, 60), (58, -30)):
        # NON-periodic content: fixed and moving are two windows of one
        # scene (a np.roll pair is perfectly periodic, making s and
        # s-size genuinely indistinguishable)
        fy, fx = 120, 120
        fixed = scene[fy : fy + n, fx : fx + n]
        # push rolls moving onto fixed: moving window starts at f + push
        moving = scene[fy + true_push[0] : fy + true_push[0] + n,
                       fx + true_push[1] : fx + true_push[1] + n]
        est, quality = register_translation_with_quality(
            jnp.asarray(fixed), jnp.asarray(moving), upsample_factor=2
        )
        np.testing.assert_allclose(est, true_push, atol=0.5)
        assert quality > 0.9


def test_no_overlap_pair_flagged_unusable():
    """When no candidate has usable overlap the pair must return NaN
    quality, not an arbitrary refined shift (review r3)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.phase_corr import register_translation_with_quality

    rng = np.random.default_rng(8)
    a = np.zeros((64, 64), np.float32)
    b = rng.normal(size=(64, 64)).astype(np.float32)
    # constant fixed image: every SSIM/NCC candidate score is forced out;
    # quality must come back non-finite so stitching drops the pair
    _est, quality = register_translation_with_quality(
        jnp.asarray(a), jnp.asarray(b), upsample_factor=2
    )
    assert not np.isfinite(quality) or quality < 0.2


def test_register_rounds_batch_matches_single_and_warps():
    """The batched round program returns the same transforms as the
    single-pair wrapper, and its warped uint16 stack matches the
    `warp_affine` translation fast path applied per round."""
    from merfish3d_tpu.ops.registration import register_rounds_to_fixed

    vol = _gaussian_blobs(shape=(12, 96, 96), n=30, seed=5)
    spacing = (0.31, 0.098, 0.098)
    pulls = [
        np.array([0.0, 4.0, -3.0], np.float32),
        np.array([1.0, -7.0, 6.0], np.float32),
        np.array([-1.0, 2.0, 9.0], np.float32),
    ]
    movings = np.stack(
        [
            _gaussian_blobs(
                shape=(12, 96, 96), n=30, seed=5, offset=p, noise_seed=200 + i
            )
            for i, p in enumerate(pulls)
        ]
    )
    transforms, warped = register_rounds_to_fixed(
        vol, movings, spacing_zyx_um=spacing, return_warped=True
    )
    assert transforms.shape == (3, 4, 4)
    assert warped.shape == movings.shape and warped.dtype == np.uint16
    for i, p in enumerate(pulls):
        est_pull_px = transforms[i][:3, 3] / np.asarray(spacing)
        np.testing.assert_allclose(est_pull_px, p, atol=0.5)
        single = register_pair_to_fixed(vol, movings[i], spacing_zyx_um=spacing)
        np.testing.assert_allclose(transforms[i], single, atol=1e-5)
        via_warp_affine = np.clip(
            warp_affine(
                movings[i],
                transform_zyx_um=transforms[i],
                spacing_zyx_um=spacing,
                reference_shape=vol.shape,
            ),
            0,
            65535,
        ).astype(np.uint16)
        # same translate_volume fast path on both sides — tiny f32 jitter
        # at the uint16 rounding boundary only
        mismatch = np.mean(
            np.abs(warped[i].astype(np.int32) - via_warp_affine.astype(np.int32))
        )
        assert mismatch <= 1.0, mismatch


def test_flow_warp_batch_chunked_matches_unchunked(monkeypatch):
    """HBM-bounded vmap chunking of the batched flow warp (with ragged
    tail padding) must be bit-identical to the single-dispatch path
    (production tiles at (16, 1024, 1024) x 14 bits OOM a 16 GB chip
    unchunked)."""
    import numpy as np

    from merfish3d_tpu.ops import warp as W

    rng = np.random.default_rng(4)
    n, shape = 5, (4, 24, 24)
    images = rng.random((n, *shape)).astype(np.float32) * 100
    flows = rng.normal(0, 0.8, (n, 3, 2, 3, 3)).astype(np.float32)
    transforms = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    transforms[:, 1, 3] = rng.uniform(-0.3, 0.3, n)  # small y shifts (um)
    spacing = (0.5, 0.1, 0.1)
    strides = np.tile(np.asarray([2.0, 8.0, 8.0], np.float32), (n, 1))
    starts = np.zeros((n, 3), np.float32)

    full = np.asarray(
        W.warp_affine_plus_flow_batch_device(
            images, flows, transforms, spacing, strides, starts
        )
    )
    monkeypatch.setattr(W, "_FLOW_WARP_HBM_BUDGET", 1)  # force group=1
    chunked = np.asarray(
        W.warp_affine_plus_flow_batch_device(
            images, flows, transforms, spacing, strides, starts
        )
    )
    np.testing.assert_array_equal(full, chunked)
