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


SPACING = np.asarray([0.31, 0.098, 0.098])


def _bead_field(shape, seed=2):
    rng = np.random.default_rng(seed)
    big = np.zeros(shape, np.float32)
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
    return big


def _build_two_tile_store(
    tmp_path,
    *,
    true_off_px=(0, 0, 64),
    stage_off_px=(0, 0, 66),
    tile1_noise=False,
):
    """Two overlapping (8, 64, 96) tiles cut from one bead field; tile 1's
    stage position carries a known error (stage_off - true_off)."""
    tile_shape = (8, 64, 96)
    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["fid", "r1", "r2"]
    ds.num_tiles = 2
    ds.voxel_size_zyx_um = list(SPACING)
    ds.experiment_order = np.array([[1, 1, 2]])
    ds.codebook = pd.DataFrame(
        {"gene_id": ["g1", "g2"], "bit01": [1, 0], "bit02": [0, 1]}
    )
    canvas = tuple(
        s + abs(int(o)) + 2 for s, o in zip(tile_shape, true_off_px)
    )
    big = _bead_field(canvas)
    sl0 = tuple(slice(0, s) for s in tile_shape)
    sl1 = tuple(
        slice(int(o), int(o) + s) for o, s in zip(true_off_px, tile_shape)
    )
    tile0 = big[sl0]
    if tile1_noise:
        tile1 = np.random.default_rng(7).uniform(
            0, 1200, tile_shape
        ).astype(np.float32)
    else:
        tile1 = big[sl1]
    for t, (img, stage_px) in enumerate(
        [(tile0, np.zeros(3)), (tile1, np.asarray(stage_off_px, np.float64))]
    ):
        ds.initialize_tile(t)
        u16 = np.clip(img + 20, 0, 65535).astype(np.uint16)
        ds.save_local_corrected_image(u16, tile=t, round=0)
        ds.save_local_registered_image(u16, tile=t, round=0)
        ds.save_local_stage_position_zyx_um(stage_px * SPACING, tile=t, round=0)
        ds.save_local_wavelengths_um((0.488, 0.520), tile=t, round=0)
        ds.save_local_round_transform_zyx_um(np.eye(4), tile=t, round=0)
    return ds


def _correction_px(ds, tile=1):
    xf = ds.load_global_coord_xforms_um(tile)
    assert xf is not None
    return xf[0][:3, 3] / SPACING


def test_global_register_two_tiles(tmp_path):
    """Two overlapping tiles with a known stage error: global registration
    must recover the correction and produce a fused volume."""
    from merfish3d_tpu.pipeline.registration import GlobalRegistrationConfig

    ds = _build_two_tile_store(tmp_path)
    global_register(
        ds,
        config=GlobalRegistrationConfig(binning_zyx=(1, 1, 1)),
        verbose=0,
    )
    # tile 1 correction ≈ (true - stage) offset = -2 px in x
    np.testing.assert_allclose(_correction_px(ds), [0, 0, -2], atol=0.5)
    fused = ds.load_global_fiducial_image()
    assert fused is not None
    img, (affine, origin, sp) = fused
    assert img.shape[2] >= 96 + 64 - 2
    assert ds.datastore_state["Fused"] is True


def test_global_register_binning_is_honored(tmp_path):
    """binning_zyx must change behavior: at (3, 6, 6) the binned overlap of
    these tiny tiles is below the minimum registrable size, so the pair is
    dropped and the correction stays zero; at (1, 1, 1) the -2 px error is
    recovered (see test_global_register_two_tiles)."""
    from merfish3d_tpu.pipeline.registration import GlobalRegistrationConfig

    ds = _build_two_tile_store(tmp_path)
    global_register(
        ds,
        config=GlobalRegistrationConfig(binning_zyx=(3, 6, 6)),
        verbose=0,
    )
    np.testing.assert_allclose(_correction_px(ds), [0, 0, 0], atol=1e-9)


def test_global_register_quality_threshold_rejects_garbage(tmp_path):
    """A pair whose overlap content does not match (noise tile) must be
    rejected by the Spearman quality filter, leaving the stage position
    uncorrected (reference `post_registration_do_quality_filter`)."""
    from merfish3d_tpu.pipeline.registration import GlobalRegistrationConfig

    ds = _build_two_tile_store(tmp_path, tile1_noise=True)
    global_register(
        ds,
        config=GlobalRegistrationConfig(binning_zyx=(1, 1, 1)),
        verbose=0,
    )
    np.testing.assert_allclose(_correction_px(ds), [0, 0, 0], atol=1e-9)


def test_global_register_keep_axis_aligned_prunes_diagonal(tmp_path):
    """A diagonally-offset pair is pruned when keep_axis_aligned=True (no
    correction applied) but registered when False (correction recovered)."""
    from merfish3d_tpu.pipeline.registration import GlobalRegistrationConfig

    diag = dict(true_off_px=(0, 30, 46), stage_off_px=(0, 30, 48))
    ds = _build_two_tile_store(tmp_path / "a", **diag)
    global_register(
        ds,
        config=GlobalRegistrationConfig(
            binning_zyx=(1, 1, 1), keep_axis_aligned=True
        ),
        verbose=0,
    )
    np.testing.assert_allclose(_correction_px(ds), [0, 0, 0], atol=1e-9)

    ds2 = _build_two_tile_store(tmp_path / "b", **diag)
    global_register(
        ds2,
        config=GlobalRegistrationConfig(
            binning_zyx=(1, 1, 1), keep_axis_aligned=False
        ),
        verbose=0,
    )
    np.testing.assert_allclose(_correction_px(ds2), [0, 0, -2], atol=0.5)


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
        residual_iterations=1,
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


def test_spot_table_localization_and_schema():
    """CC-centroid spot calling recovers subvoxel positions (±0.5 px) and
    carries the reference column contract (`_apply_bits_on_gpu:929-989`)."""
    from merfish3d_tpu.pipeline.registration import _spot_table_from_probability

    shape = (10, 48, 48)
    truth = np.array([[4.3, 12.6, 30.2], [6.8, 33.1, 9.7], [2.2, 40.4, 40.9]])
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape],
                             indexing="ij")
    decon = np.zeros(shape, np.float32)
    for z, y, x in truth:
        decon += 1000.0 * np.exp(
            -((zz - z) ** 2) / (2 * 1.2**2)
            - ((yy - y) ** 2 + (xx - x) ** 2) / (2 * 1.4**2)
        ).astype(np.float32)
    prob = np.clip(decon / 400.0, 0, 1).astype(np.float32)

    df = _spot_table_from_probability(decon, prob, tile_idx=3, bit_idx=7)
    assert len(df) == 3
    for col in ("z", "y", "x", "probability", "sum_prob_pixels",
                "sum_decon_pixels", "tile_idx", "bit_idx",
                "tile_z_px", "tile_y_px", "tile_x_px"):
        assert col in df.columns, col
    got = df[["z", "y", "x"]].to_numpy()
    got = got[np.lexsort((got[:, 2], got[:, 1], got[:, 0]))]
    want = truth[np.lexsort((truth[:, 2], truth[:, 1], truth[:, 0]))]
    np.testing.assert_allclose(got, want, atol=0.5)
    assert (df["bit_idx"] == 8).all()  # 1-based
    assert (df["sum_decon_pixels"] > 0).all()


def test_fanout_aggregates_worker_failures(tmp_path, monkeypatch):
    """A failing tile in the multi-device fan-out must not kill sibling
    workers: the other tiles complete and the error surfaces with the
    failed tile listed (reference worker exitcode/queue monitoring,
    `DataRegistration.py:2175-2212`, `_join_gpu_workers`)."""
    ds, _ = generate_synthetic_experiment(
        tmp_path / "ds", shape=(6, 48, 48), n_spots=20, seed=5,
        n_tiles=4, tile_offset_px=(0.0, 0.0, 32.0),
    )
    reg = DataRegistration(
        ds, decon_fiducial=False, decon_readout=False,
        global_registration=False, verbose=0,
    )
    real = DataRegistration.register_one_tile
    done = []

    def flaky(self, tile_idx):
        if tile_idx == 0:
            real(self, tile_idx)  # warm-up tile on the main thread
            done.append(tile_idx)
            return
        if tile_idx == 2:
            raise ValueError("injected tile failure")
        real(self, tile_idx)
        done.append(tile_idx)

    monkeypatch.setattr(DataRegistration, "register_one_tile", flaky)
    with pytest.raises(RuntimeError, match=r"tiles \[2\]"):
        reg._register_tiles_fanout([0, 1, 2, 3], __import__("jax").devices()[:4])
    # siblings were not killed by the injected failure
    assert set(done) == {0, 1, 3}
