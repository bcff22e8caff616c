"""Deformable flow estimator tests, modeled on the reference object-model
warp recovery test (`test_sofima_deformable_registration.py:222-530`):
render a point cloud, warp by a smooth analytic flow, and check that the
estimated field recovers it and that applying it corrects the image."""

import numpy as np
import pytest
import scipy.ndimage

from merfish3d_tpu.ops.flow import (
    SofimaRegistrationConfig,
    estimate_sofima_flow_field_xyz_px,
)
from merfish3d_tpu.ops.warp import warp_affine_plus_flow


def _bead_volume(shape=(24, 96, 96), n=150, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
    )
    for _ in range(n):
        c = [rng.uniform(4, s - 4) for s in shape]
        vol += (
            rng.uniform(300, 900)
            * np.exp(
                -((zz - c[0]) ** 2) / (2 * 1.2**2)
                - ((yy - c[1]) ** 2) / (2 * 1.2**2)
                - ((xx - c[2]) ** 2) / (2 * 1.2**2)
            )
        ).astype(np.float32)
    return vol + rng.normal(0, 1.0, shape).astype(np.float32)


def _analytic_flow(shape, amp=(0.6, 2.5, 2.0)):
    """Smooth sinusoidal displacement field (z, y, x components)."""
    zz, yy, xx = np.meshgrid(
        *[np.linspace(0, np.pi, s) for s in shape], indexing="ij"
    )
    dz = amp[0] * np.sin(yy)
    dy = amp[1] * np.sin(xx)
    dx = amp[2] * np.sin(zz + 0.5)
    return dz, dy, dx


def test_flow_estimator_recovers_smooth_warp():
    ref = _bead_volume()
    dz, dy, dx = _analytic_flow(ref.shape)
    # moving(p) = ref(p - d) would put content at p + d... construct via
    # sampling: moving sampled at p equals ref at p shifted by the field,
    # i.e. moving content displaced by +d relative to ref
    coords = np.meshgrid(*[np.arange(s) for s in ref.shape], indexing="ij")
    sample = [coords[0] - dz, coords[1] - dy, coords[2] - dx]
    moving = scipy.ndimage.map_coordinates(ref, sample, order=1, mode="nearest")

    cfg = SofimaRegistrationConfig(
        patch_size_zyx=(12, 24, 24),
        stride_zyx=(6, 12, 12),
        residual_iterations=2,
    )
    flow, meta = estimate_sofima_flow_field_xyz_px(ref, moving.astype(np.float32), cfg)
    assert meta["sofima_status"] == "ok"
    assert meta["valid_flow_vectors"] > 10
    assert flow.shape[0] == 3

    # ground-truth flow on the estimator lattice: displacement of moving
    # content relative to reference = +d at the patch centers
    stride = np.asarray(meta["map_stride_zyx_px"])
    start_xyz = np.asarray(meta["map_box_start_xyz_px"])
    start_zyx = start_xyz[::-1]
    fz, fy, fx = flow.shape[1:]
    gz = (start_zyx[0] + np.arange(fz) * stride[0]).astype(int).clip(0, ref.shape[0] - 1)
    gy = (start_zyx[1] + np.arange(fy) * stride[1]).astype(int).clip(0, ref.shape[1] - 1)
    gx = (start_zyx[2] + np.arange(fx) * stride[2]).astype(int).clip(0, ref.shape[2] - 1)
    gt_x = dx[np.ix_(gz, gy, gx)]
    gt_y = dy[np.ix_(gz, gy, gx)]
    # estimated field: channels X, Y, Z
    err_x = np.abs(flow[0] - gt_x)
    err_y = np.abs(flow[1] - gt_y)
    assert np.median(err_x) < 0.75, np.median(err_x)
    assert np.median(err_y) < 0.75, np.median(err_y)

    # applying the field must improve the image alignment
    corrected = warp_affine_plus_flow(
        moving.astype(np.float32),
        flow,
        transform_zyx_um=np.eye(4, dtype=np.float32),
        spacing_zyx_um=(1.0, 1.0, 1.0),
        reference_shape=ref.shape,
        map_stride_zyx_px=meta["map_stride_zyx_px"],
        map_box_start_xyz_px=meta["map_box_start_xyz_px"],
    )
    interior = (slice(4, -4),) * 3
    rmse_before = np.sqrt(np.mean((moving[interior] - ref[interior]) ** 2))
    rmse_after = np.sqrt(np.mean((corrected[interior] - ref[interior]) ** 2))
    assert rmse_after < 0.6 * rmse_before, (rmse_before, rmse_after)


def test_flow_estimator_zero_displacement():
    ref = _bead_volume(shape=(16, 64, 64), n=80, seed=3)
    cfg = SofimaRegistrationConfig(
        patch_size_zyx=(8, 16, 16), stride_zyx=(4, 8, 8),
        residual_iterations=1,
    )
    flow, meta = estimate_sofima_flow_field_xyz_px(ref, ref.copy(), cfg)
    assert meta["sofima_status"] == "ok"
    assert np.abs(flow).max() < 0.3


def test_config_patch_stride_resolution():
    """Patch clipped to volume with the minimum floor; stride =
    patch // step_divisor unless overridden (reference
    `_resolve_patch_and_step`, `utils/sofima_registration.py:50-80`)."""
    cfg = SofimaRegistrationConfig(
        patch_size_zyx=(10, 32, 32), step_divisor=2, minimum_patch_size_px=4
    )
    patch, stride = cfg.resolve_patch_and_stride((6, 64, 64))
    assert patch == (6, 32, 32)
    assert stride == (3, 16, 16)
    # the minimum-size floor kicks in for very thin volumes
    patch, _ = cfg.resolve_patch_and_stride((2, 64, 64))
    assert patch[0] == 4
    # explicit stride override wins and is clipped to the patch
    cfg = SofimaRegistrationConfig(
        patch_size_zyx=(8, 16, 16), stride_zyx=(4, 99, 8)
    )
    patch, stride = cfg.resolve_patch_and_stride((16, 64, 64))
    assert stride == (4, 16, 8)

    md = cfg.as_metadata()
    assert md["stride_zyx"] == [4, 99, 8]
    assert md["patch_size_zyx"] == [8, 16, 16]


def test_masked_fraction_invalidates_empty_patches():
    """Patches dominated by exactly-zero fill (warped-in borders) must be
    invalidated via ``max_masked`` (SOFIMA masked-calculator semantics)
    and survive as relaxed fill, not as measurements."""
    ref = _bead_volume(shape=(12, 64, 64), n=60, seed=7)
    moving = np.roll(ref, 2, axis=2)
    # zero out the right half of both volumes: those lattice sites see
    # mostly-zero patches and must not contribute valid vectors
    ref_m = ref.copy()
    mov_m = moving.copy()
    ref_m[:, :, 32:] = 0.0
    mov_m[:, :, 32:] = 0.0
    # disable the ratio/sharpness gates in BOTH configs so the only
    # discriminator between them is the masked-fraction gate (zero
    # patches otherwise fail the sharpness gate in both, hiding it)
    common = dict(
        patch_size_zyx=(8, 16, 16), stride_zyx=(4, 8, 8),
        residual_iterations=1, min_peak_ratio=0.5, min_peak_sharpness=0.0,
    )
    cfg = SofimaRegistrationConfig(max_masked=0.5, **common)
    flow, meta = estimate_sofima_flow_field_xyz_px(ref_m, mov_m, cfg)
    assert meta["sofima_status"] == "ok"
    full_cfg = SofimaRegistrationConfig(max_masked=1.1, **common)  # gate off
    _, meta_full = estimate_sofima_flow_field_xyz_px(ref_m, mov_m, full_cfg)
    # with the gate active, strictly fewer vectors survive cleaning
    assert meta["valid_flow_vectors"] < meta_full["valid_flow_vectors"]
    # and the relaxed field still recovers the true shift where data
    # exists (roll +2 in x ⇒ content displaced +2 ⇒ X-channel flow ≈ +2,
    # matching the smooth-warp test's ground-truth convention)
    assert abs(np.median(flow[0]) - 2.0) < 0.5, np.median(flow[0])


def test_peak_sharpness_gates_noise_patches():
    """Pure-noise patches produce flat correlation surfaces; a sharpness
    threshold must reject them while structured patches pass."""
    rng = np.random.default_rng(11)
    noise_ref = rng.normal(0, 1, (8, 32, 32)).astype(np.float32)
    noise_mov = rng.normal(0, 1, (8, 32, 32)).astype(np.float32)
    beads = _bead_volume(shape=(8, 32, 32), n=40, seed=2)
    cfg_strict = SofimaRegistrationConfig(
        patch_size_zyx=(8, 16, 16), stride_zyx=(4, 8, 8),
        residual_iterations=1, min_peak_sharpness=4.5, min_peak_ratio=1.0,
    )
    _, meta_noise = estimate_sofima_flow_field_xyz_px(
        noise_ref, noise_mov, cfg_strict
    )
    _, meta_beads = estimate_sofima_flow_field_xyz_px(
        beads, np.roll(beads, 1, axis=1), cfg_strict
    )
    # measured on this seed: noise sharpness tops out ≈3.9, bead patches
    # sit ≥4.8 — the 4.5 gate rejects every noise patch and keeps beads
    assert meta_noise["valid_flow_vectors"] == 0
    assert meta_beads["valid_flow_vectors"] >= 5


def test_flow_datastore_roundtrip_preserves_warp(tmp_path):
    """Datastore round-trip invariant (reference
    `test_sofima_flow_field_datastore_roundtrip_preserves_warp:531`):
    saving + reloading a flow field and re-applying it must reproduce the
    in-memory warp exactly."""
    from merfish3d_tpu.datastore import qi2labDataStore

    ref = _bead_volume(shape=(16, 64, 64), n=60, seed=5)
    dz, dy, dx = _analytic_flow(ref.shape, amp=(0.4, 1.5, 1.2))
    coords = np.meshgrid(*[np.arange(s) for s in ref.shape], indexing="ij")
    moving = scipy.ndimage.map_coordinates(
        ref, [coords[0] - dz, coords[1] - dy, coords[2] - dx], order=1,
        mode="nearest",
    ).astype(np.float32)
    cfg = SofimaRegistrationConfig(
        patch_size_zyx=(8, 16, 16), stride_zyx=(4, 8, 8),
        residual_iterations=1,
    )
    flow, meta = estimate_sofima_flow_field_xyz_px(ref, moving, cfg)

    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["a", "b", "c"]
    ds.num_tiles = 1
    ds.voxel_size_zyx_um = [0.3, 0.1, 0.1]
    ds.experiment_order = np.array([[1, 1, 2], [2, 3, 4]])
    ds.initialize_tile(0)
    ds.save_local_sofima_flow_field(
        flow, tile=0, round=1,
        map_stride_zyx_px=meta["map_stride_zyx_px"],
        map_box_start_xyz_px=meta["map_box_start_xyz_px"],
        map_box_size_xyz_px=meta["map_box_size_xyz_px"],
        reference_shape_zyx_px=meta["reference_shape_zyx_px"],
        moving_shape_zyx_px=meta["moving_shape_zyx_px"],
        valid_flow_vectors=meta["valid_flow_vectors"],
    )
    loaded, attrs = ds.load_local_sofima_flow_field(tile=0, round=1)
    np.testing.assert_array_equal(loaded, flow)

    identity = np.eye(4, dtype=np.float32)
    kwargs = dict(
        transform_zyx_um=identity,
        spacing_zyx_um=(1.0, 1.0, 1.0),
        reference_shape=ref.shape,
    )
    a = warp_affine_plus_flow(
        moving, flow,
        map_stride_zyx_px=meta["map_stride_zyx_px"],
        map_box_start_xyz_px=meta["map_box_start_xyz_px"], **kwargs,
    )
    b = warp_affine_plus_flow(
        moving, loaded,
        map_stride_zyx_px=attrs["map_stride_zyx_px"],
        map_box_start_xyz_px=attrs["map_box_start_xyz_px"], **kwargs,
    )
    np.testing.assert_array_equal(a, b)
