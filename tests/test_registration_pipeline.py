"""DataRegistration + global stitching pipeline tests on synthetic data."""

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.datastore import qi2labDataStore
from merfish3d_tpu.pipeline.registration import DataRegistration
from merfish3d_tpu.pipeline.stitching import global_register
from merfish3d_tpu.utils.simulation import generate_synthetic_experiment


def _make_shifted_experiment(tmp_path, shift_px=(0.0, 3.0, -4.0)):
    """Synthetic experiment where moving rounds are analytically shifted
    copies of the round-1 fiducial."""
    rng = np.random.default_rng(0)
    shape = (12, 96, 96)
    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["fid", "r1", "r2"]
    ds.num_tiles = 1
    ds.voxel_size_zyx_um = [0.31, 0.098, 0.098]
    ds.experiment_order = np.array([[1, 1, 2], [2, 3, 4]])
    cb = pd.DataFrame(
        {"gene_id": ["g1", "g2"], **{f"bit{i:02d}": [1, 0] for i in range(1, 5)}}
    )
    ds.codebook = cb
    ds.initialize_tile(0)

    def beads(offset):
        r = np.random.default_rng(1)
        zz, yy, xx = np.meshgrid(
            *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
        )
        zz, yy, xx = zz - offset[0], yy - offset[1], xx - offset[2]
        vol = np.zeros(shape, np.float32)
        for _ in range(60):
            c = [r.uniform(6, s - 6) for s in shape]
            vol += (
                r.uniform(400, 1200)
                * np.exp(
                    -((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
                    / (2 * 1.2**2)
                )
            ).astype(np.float32)
        return vol

    fixed = beads((0, 0, 0)) + rng.normal(0, 1, shape).astype(np.float32)
    moving = beads(shift_px) + rng.normal(0, 1, shape).astype(np.float32)
    for r, img in ((0, fixed), (1, moving)):
        ds.save_local_corrected_image(
            np.clip(img + 20, 0, 65535).astype(np.uint16), tile=0, round=r
        )
        ds.save_local_stage_position_zyx_um([0, 0, 0], tile=0, round=r)
        ds.save_local_wavelengths_um((0.488, 0.520), tile=0, round=r)
    for b in range(4):
        ds.save_local_corrected_image(
            np.clip(fixed + 20, 0, 65535).astype(np.uint16), tile=0, bit=b
        )
        ds.save_local_wavelengths_um((0.561, 0.590), tile=0, bit=b)
    return ds, np.asarray(shift_px)


def test_register_one_tile_recovers_round_shift(tmp_path):
    ds, shift_px = _make_shifted_experiment(tmp_path)
    reg = DataRegistration(
        ds,
        decon_fiducial=False,
        decon_readout=False,
        global_registration=False,
        verbose=0,
    )
    reg.register_one_tile(0)
    xf = ds.load_local_round_transform_zyx_um(0, 1)
    assert xf is not None
    spacing = np.asarray(ds.voxel_size_zyx_um)
    est_px = xf[:3, 3] / spacing
    np.testing.assert_allclose(est_px, shift_px, atol=0.5)
    # readout outputs exist
    for b in range(4):
        assert ds.load_local_registered_image(tile=0, bit=b) is not None
        prob = ds.load_local_feature_predictor_image(tile=0, bit=b)
        assert prob is not None and prob.min() >= 0 and prob.max() <= 1
        spots = ds.load_local_feature_predictor_spots(tile=0, bit=b)
        assert spots is not None and len(spots) > 10


def test_register_all_tiles_resume(tmp_path):
    ds, _ = _make_shifted_experiment(tmp_path)
    reg = DataRegistration(
        ds, decon_fiducial=False, decon_readout=False,
        global_registration=False, verbose=0,
    )
    reg.register_all_tiles()
    assert ds.datastore_state["LocalRegistered"] is True
    assert reg._is_tile_complete(0)
    # second call skips without error
    reg.register_all_tiles()


def test_global_register_two_tiles(tmp_path):
    """Two overlapping tiles with a known stage error: global registration
    must recover the correction and produce a fused volume."""
    shape = (8, 64, 96)
    spacing = np.asarray([0.31, 0.098, 0.098])
    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["fid", "r1", "r2"]
    ds.num_tiles = 2
    ds.voxel_size_zyx_um = list(spacing)
    ds.experiment_order = np.array([[1, 1, 2]])
    ds.codebook = pd.DataFrame(
        {"gene_id": ["g1", "g2"], "bit01": [1, 0], "bit02": [0, 1]}
    )

    # a wide bead field; tile 1 sees it shifted by the true stage offset
    rng = np.random.default_rng(2)
    big = np.zeros((8, 64, 160), np.float32)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in big.shape], indexing="ij"
    )
    for _ in range(120):
        c = [rng.uniform(2, s - 2) for s in big.shape]
        big += (
            rng.uniform(400, 1200)
            * np.exp(
                -((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
                / (2 * 1.2**2)
            )
        ).astype(np.float32)

    # tile 0: x ∈ [0, 96); tile 1 true position x = 64 px, stage reports 66 px
    true_x_px = 64
    stage_x_px = 66
    tile0 = big[:, :, :96]
    tile1 = big[:, :, true_x_px : true_x_px + 96]
    for t, (img, stage_px) in enumerate(
        [(tile0, 0.0), (tile1, stage_x_px)]
    ):
        ds.initialize_tile(t)
        ds.save_local_corrected_image(
            np.clip(img + 20, 0, 65535).astype(np.uint16), tile=t, round=0
        )
        ds.save_local_registered_image(
            np.clip(img + 20, 0, 65535).astype(np.uint16), tile=t, round=0
        )
        ds.save_local_stage_position_zyx_um(
            [0, 0, stage_px * spacing[2]], tile=t, round=0
        )
        ds.save_local_wavelengths_um((0.488, 0.520), tile=t, round=0)
        ds.save_local_round_transform_zyx_um(np.eye(4), tile=t, round=0)

    global_register(ds, verbose=0)
    xf0 = ds.load_global_coord_xforms_um(0)
    xf1 = ds.load_global_coord_xforms_um(1)
    assert xf0 is not None and xf1 is not None
    # tile 1 correction ≈ (true - stage) offset = -2 px in x
    corr_px = xf1[0][:3, 3] / spacing
    np.testing.assert_allclose(corr_px, [0, 0, true_x_px - stage_x_px], atol=0.5)
    fused = ds.load_global_fiducial_image()
    assert fused is not None
    img, (affine, origin, sp) = fused
    assert img.shape[2] >= 96 + true_x_px - 2
    assert ds.datastore_state["Fused"] is True


def test_deformable_registration_pipeline(tmp_path):
    """With deformable_registration=True the pipeline estimates and stores
    a SOFIMA flow field for each moving round, and the decode-time warp
    consumes it."""
    ds, shift_px = _make_shifted_experiment(tmp_path, shift_px=(0.0, 2.0, -3.0))
    reg = DataRegistration(
        ds,
        decon_fiducial=False,
        decon_readout=False,
        deformable_registration=True,
        global_registration=False,
        verbose=0,
    )
    from merfish3d_tpu.ops.flow import SofimaRegistrationConfig

    reg._sofima_config = SofimaRegistrationConfig(
        patch_size_zyx=(8, 24, 24), stride_zyx=(4, 12, 12),
        num_residual_iterations=1,
    )
    reg.register_one_tile(0)
    flow = ds.load_local_sofima_flow_field(0, 1)
    assert flow is not None
    field, attrs = flow
    assert field.shape[0] == 3
    assert attrs["sofima_status"] == "ok"
    # residual flow after a correct affine should be small
    assert np.abs(field).max() < 2.5

    # decode-time warp path picks up affine + flow without error
    from merfish3d_tpu.pipeline.decode_warping import warp_bit_image_to_reference

    img = np.asarray(ds.load_local_corrected_image(tile=0, bit=2), np.float32)
    warped = warp_bit_image_to_reference(
        img, datastore=ds, tile=0, bit_id="bit003",
        emission_wavelength_um=0.590,
    )
    assert warped.shape == img.shape
    assert np.all(np.isfinite(warped))


def test_resume_rejects_corrupt_registered_image(tmp_path):
    """A truncated registered image (wrong shape) must fail the resume scan
    and be reprocessed (reference `_validate_core_image_shape:2100-2144`)."""
    ds, _ = _make_shifted_experiment(tmp_path)
    reg = DataRegistration(
        ds, decon_fiducial=False, decon_readout=False,
        global_registration=False, verbose=0,
    )
    reg.register_all_tiles()
    assert reg._is_tile_complete(0)

    # corrupt one bit's decon image: overwrite with a truncated-z volume
    good = np.asarray(ds.load_local_registered_image(tile=0, bit=2))
    ds.save_local_registered_image(good[:3], tile=0, bit=2)
    assert not reg._is_tile_complete(0)

    # re-run: the corrupt bit is re-deconvolved back to the full shape
    reg.register_all_tiles()
    fixed = np.asarray(ds.load_local_registered_image(tile=0, bit=2))
    assert fixed.shape == good.shape
    assert reg._is_tile_complete(0)


def test_register_all_tiles_multidevice_fanout(tmp_path):
    """Tiles fan out across the 8 virtual devices; results must match the
    sequential path exactly (same per-round transforms)."""
    import jax

    assert len(jax.devices()) == 8

    def build(sub):
        ds, gt = generate_synthetic_experiment(
            tmp_path / sub / "ds", shape=(8, 64, 64), n_spots=30, seed=9,
            n_tiles=3, tile_offset_px=(0.0, 0.0, 48.0),
        )
        return ds

    # overwrite=True: the generator pre-populates identity registration,
    # so without it register_all_tiles would skip every tile (vacuous test)
    ds_seq = build("seq")
    reg_seq = DataRegistration(
        ds_seq, decon_fiducial=False, decon_readout=False,
        global_registration=False, verbose=0, num_devices=1, overwrite=True,
    )
    reg_seq.register_all_tiles()

    ds_fan = build("fan")
    reg_fan = DataRegistration(
        ds_fan, decon_fiducial=False, decon_readout=False,
        global_registration=False, verbose=0, overwrite=True,
        registration_diagnostics=False,
    )
    assert len(jax.devices()) > 1
    reg_fan.register_all_tiles()

    for t in range(3):
        for r in range(ds_seq.num_rounds):
            a = ds_seq.load_local_round_transform_zyx_um(t, r)
            b = ds_fan.load_local_round_transform_zyx_um(t, r)
            np.testing.assert_array_equal(a, b)
        for bit in range(4):
            a = np.asarray(ds_seq.load_local_registered_image(tile=t, bit=bit))
            b = np.asarray(ds_fan.load_local_registered_image(tile=t, bit=bit))
            np.testing.assert_array_equal(a, b)
