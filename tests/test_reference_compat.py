"""Reference public-API name compatibility.

The reference package exposes a flat utility surface that user scripts
import directly (`utils/rlgc.py`, `utils/chromatic.py`,
`utils/multiview_registration.py`, `utils/registration.py`, plus
module-level helpers in `PixelDecoder.py:70-305` and
`DataRegistration.py:2337-2360`). These tests pin that every
reference-named entry exists here and behaves on small inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _bead_volume(shape=(10, 40, 40), centers=((5, 10, 12), (4, 28, 30))):
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    vol = np.zeros(shape, np.float32)
    for z, y, x in centers:
        vol += 800.0 * np.exp(
            -(((zz - z) / 1.2) ** 2 + ((yy - y) / 1.5) ** 2 + ((xx - x) / 1.5) ** 2)
        )
    vol += np.random.default_rng(3).normal(10, 1, shape).astype(np.float32)
    return vol.astype(np.float32)


class TestRlgcCompat:
    def test_kl_div_zero_for_identical(self):
        from merfish3d_tpu.ops.rlgc import kl_div

        p = np.random.default_rng(0).random((4, 8, 8)).astype(np.float32)
        assert kl_div(p, p) == pytest.approx(0.0, abs=1e-6)
        assert kl_div(p, p + 0.05) > 0.0

    def test_pad_for_linear_fft_round_trip(self):
        from merfish3d_tpu.ops.rlgc import pad_for_linear_fft, remove_padding_zyx

        img = np.random.default_rng(1).random((6, 20, 20)).astype(np.float32)
        padded, pw = pad_for_linear_fft(img, (3, 5, 5))
        assert all(b >= 1 and a >= 1 for b, a in pw)
        back = np.asarray(remove_padding_zyx(padded, pw))
        np.testing.assert_allclose(back, img, rtol=1e-6)

    def test_next_gpu_fft_size_smooth(self):
        from merfish3d_tpu.ops.rlgc import next_gpu_fft_size

        for x in (1, 7, 37, 100, 1000):
            n = next_gpu_fft_size(x)
            assert n >= x
            while n % 2 == 0:
                n //= 2
            while n % 3 == 0:
                n //= 3
            assert n in (1, 5)  # {2,3}-smooth with at most one factor 5

    def test_clear_rlgc_caches_runs(self):
        from merfish3d_tpu.ops.rlgc import clear_rlgc_caches

        clear_rlgc_caches()


class TestChromaticCompat:
    def test_parse_csv_floats(self):
        from merfish3d_tpu.utils.chromatic_calibration import parse_csv_floats

        assert parse_csv_floats(None) is None
        assert parse_csv_floats("1.0, 2.5,3") == (1.0, 2.5, 3.0)
        assert parse_csv_floats([1, 2]) == (1.0, 2.0)

    def test_detect_bead_centroids_dataframe(self):
        from merfish3d_tpu.utils.chromatic_calibration import detect_bead_centroids

        df = detect_bead_centroids(_bead_volume(), min_intensity_quantile=0.0)
        assert list(df.columns) == ["z", "y", "x", "sum_decon_pixels"]
        assert len(df) >= 2
        # sorted brightest-first like the reference
        sums = df["sum_decon_pixels"].to_numpy()
        assert (np.diff(sums) <= 1e-6).all()

    def test_generate_channel_psfs_normalized(self):
        from merfish3d_tpu.utils.chromatic_calibration import generate_channel_psfs

        psfs = generate_channel_psfs(
            num_z=9,
            voxel_size_zyx_um=(0.3, 0.1, 0.1),
            wavelengths_um=(0.52, 0.67),
            psf_nx=11,
        )
        assert len(psfs) == 2
        for psf in psfs:
            assert psf.shape == (9, 11, 11)
            assert psf.sum() == pytest.approx(1.0, rel=1e-3)

    def test_deconvolve_channels_shape(self):
        from merfish3d_tpu.utils.chromatic_calibration import (
            deconvolve_channels,
            generate_channel_psfs,
        )

        stack = np.stack([_bead_volume(), _bead_volume()])
        psfs = generate_channel_psfs(
            num_z=9,
            voxel_size_zyx_um=(0.3, 0.1, 0.1),
            wavelengths_um=(0.52,),
            psf_nx=11,
        )
        out = deconvolve_channels(stack, psfs, max_iters=2)
        assert out.shape == stack.shape
        assert np.isfinite(out).all()

    def test_load_bead_channel_stack_ome_round_trip(self, tmp_path):
        from merfish3d_tpu.utils.chromatic_calibration import load_bead_channel_stack
        from merfish3d_tpu.utils.ometiff import write_ome_tiff_stack

        stack = np.random.default_rng(2).integers(
            0, 1000, (2, 4, 16, 16)
        ).astype(np.uint16)
        path = tmp_path / "beads.ome.tiff"
        write_ome_tiff_stack(
            path,
            stack,
            spacing_zyx_um=(0.3, 0.1, 0.1),
            emission_wavelengths_um=(0.52, 0.67),
        )
        loaded, meta = load_bead_channel_stack(path)
        np.testing.assert_array_equal(loaded, stack)
        assert meta["voxel_size_zyx_um"] == (0.3, 0.1, 0.1)
        assert meta["wavelengths_um"] == (0.52, 0.67)

    def test_save_calibration_json(self, tmp_path):
        import json

        from merfish3d_tpu.utils.chromatic_calibration import save_calibration_json

        out = tmp_path / "nested" / "cal.json"
        save_calibration_json({"reference_wavelength_um": 0.52}, out)
        assert json.loads(out.read_text())["reference_wavelength_um"] == 0.52


class TestMultiviewCompat:
    def test_registration_binning_from_spacing(self):
        from merfish3d_tpu.ops.registration import registration_binning_from_spacing

        assert registration_binning_from_spacing((0.31, 0.098, 0.098)) == {
            "z": 1,
            "y": 3,
            "x": 3,
        }
        with pytest.raises(ValueError):
            registration_binning_from_spacing((1.0, 1.0))

    def test_cucim_phase_correlation_registration_contract(self):
        from merfish3d_tpu.ops.registration import (
            cucim_phase_correlation_registration,
        )

        rng = np.random.default_rng(0)
        fixed = rng.normal(size=(32, 32)).astype(np.float32)
        moving = np.roll(fixed, (3, -2), (0, 1))
        res = cucim_phase_correlation_registration(fixed, moving)
        assert set(res) == {"affine_matrix", "quality"}
        assert res["affine_matrix"].shape == (3, 3)
        np.testing.assert_allclose(
            res["affine_matrix"][:2, 2], [-3.0, 2.0], atol=0.5
        )
        assert res["quality"] > 0.9

    def test_warp_array_to_reference_gpu_translation(self):
        from merfish3d_tpu.ops.registration import warp_array_to_reference_gpu

        vol = _bead_volume((6, 16, 16), centers=((3, 8, 8),))
        T = np.eye(4)
        T[1, 3] = 2.0  # pull: output y maps to moving y+2
        out = warp_array_to_reference_gpu(
            vol,
            transform_zyx_um=T,
            spacing_zyx_um=(1.0, 1.0, 1.0),
            reference_shape=vol.shape,
        )
        np.testing.assert_allclose(out[:, :-2, :], vol[:, 2:, :], atol=1e-3)


class TestLegacyRegistrationCompat:
    def test_compute_rigid_and_apply(self):
        from merfish3d_tpu.utils.legacy_registration import (
            apply_transform,
            compute_rigid_transform,
        )

        vol = _bead_volume()
        moved = np.roll(vol, 2, axis=0)
        transform, shift_xyz = compute_rigid_transform(
            vol, moved, downsample_factors=[1, 1, 1]
        )
        assert shift_xyz[2] == pytest.approx(2.0, abs=0.2)
        out = apply_transform(vol, moved, transform)
        np.testing.assert_allclose(out[3:-3], vol[3:-3], atol=1.0)

    def test_projection_z_mode_round_trips(self):
        from merfish3d_tpu.utils.legacy_registration import (
            apply_transform,
            compute_rigid_transform,
        )

        vol = _bead_volume()
        moved = np.roll(vol, (3, -2), axis=(1, 2))
        t, shift_xyz = compute_rigid_transform(
            vol, moved, downsample_factors=[1, 1, 1], projection="z"
        )
        # pull convention: offsets equal the displacement of the moving image
        assert shift_xyz[0] == pytest.approx(-2.0, abs=0.2)  # x
        assert shift_xyz[1] == pytest.approx(3.0, abs=0.2)  # y
        assert shift_xyz[2] == 0.0
        out = apply_transform(vol, moved, t)
        np.testing.assert_allclose(
            out[:, 4:-4, 4:-4], vol[:, 4:-4, 4:-4], atol=1.0
        )

    def test_projection_y_mode_round_trips(self):
        from merfish3d_tpu.utils.legacy_registration import (
            apply_transform,
            compute_rigid_transform,
        )

        vol = _bead_volume()
        moved = np.roll(vol, (2, 3), axis=(0, 2))
        t, shift_xyz = compute_rigid_transform(
            vol, moved, downsample_factors=[1, 1, 1], projection="y"
        )
        assert len(shift_xyz) == 3
        assert shift_xyz[0] == pytest.approx(3.0, abs=0.2)  # x
        assert shift_xyz[1] == 0.0
        assert shift_xyz[2] == pytest.approx(2.0, abs=0.2)  # z
        out = apply_transform(vol, moved, t)
        np.testing.assert_allclose(
            out[3:-3, :, 4:-4], vol[3:-3, :, 4:-4], atol=1.0
        )

    def test_search_mode_round_trips(self):
        from merfish3d_tpu.utils.legacy_registration import (
            apply_transform,
            compute_rigid_transform,
        )

        vol = _bead_volume()
        moved = np.roll(vol, 2, axis=0)
        t, shift_xyz = compute_rigid_transform(
            vol, moved, downsample_factors=[1, 1, 1], projection="search"
        )
        assert shift_xyz[2] == pytest.approx(2.0, abs=0.2)
        out = apply_transform(vol, moved, t)
        np.testing.assert_allclose(out[3:-3], vol[3:-3], atol=1.0)
        # different z extents: the search scores every moving plane
        _t2, shift2 = compute_rigid_transform(
            vol, moved[:-2], downsample_factors=[1, 1, 1], projection="search"
        )
        assert len(shift2) == 3


class TestOrchestratorCompat:
    def test_pixeldecoder_module_surface(self):
        import merfish3d_tpu.PixelDecoder as PD

        assert callable(PD.decode_tiles_worker)
        assert callable(PD.preload_cuda_libraries)
        assert isinstance(PD.time_stamp(), str)
        # post-hoc accessors exist on the class
        assert isinstance(PD.PixelDecoder.decoded_barcodes, property)
        assert isinstance(PD.PixelDecoder.decoded_image, property)
        assert callable(PD.PixelDecoder.save_decoded_barcodes)

    def test_dataregistration_module_surface(self):
        import merfish3d_tpu.DataRegistration as DR

        assert DR.no_op(1, x=2) is None
        assert isinstance(DR.time_stamp(), str)
        cfg = DR.GlobalRegistrationConfig()
        assert cfg.registration_binning() == {"z": 3, "y": 6, "x": 6}
        for name in (
            "datastore",
            "dataset_path",
            "tile_id",
            "perform_deformable_registration",
            "overwrite_registered",
        ):
            assert isinstance(getattr(DR.DataRegistration, name), property)
        assert callable(DR.DataRegistration.apply_registration_to_one_tile)

    def test_viewer_run_exists(self):
        from merfish3d_tpu.viz.viewer import Qi2labViewer

        assert callable(Qi2labViewer.run)
