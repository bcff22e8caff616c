"""Device-resident register→decode handoff: the cached fast path must be
bit-identical to the persisted-then-reloaded path, and deferred
persistence must land the same bytes as sync persistence."""

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.pipeline import PixelDecoder
from merfish3d_tpu.pipeline.handoff import TileDeviceCache
from merfish3d_tpu.pipeline.registration import DataRegistration
from merfish3d_tpu.utils.simulation import generate_synthetic_experiment


def _run_registration(ds, **kwargs):
    reg = DataRegistration(
        ds,
        decon_fiducial=False,
        decon_readout=True,
        decon_max_iters=4,
        global_registration=False,
        overwrite=True,
        verbose=0,
        **kwargs,
    )
    reg.register_all_tiles()
    return reg


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("handoff")
    ds, _gt = generate_synthetic_experiment(
        root / "qi2labdatastore", shape=(6, 64, 64), n_spots=25, seed=5
    )
    return ds


def test_cached_decode_matches_disk_decode(experiment):
    ds = experiment
    cache = TileDeviceCache()
    reg = _run_registration(ds, device_cache=cache, persist="deferred")

    # decode straight off the device cache, BEFORE persistence lands
    dec_cached = PixelDecoder(
        ds, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0,
        device_cache=cache,
    )
    df_cached = dec_cached.decode_one_tile(0, save=False)

    reg.drain_persistence()

    dec_disk = PixelDecoder(
        ds, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0
    )
    df_disk = dec_disk.decode_one_tile(0, save=False)

    assert len(df_cached) > 0
    pd.testing.assert_frame_equal(
        df_cached.reset_index(drop=True), df_disk.reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        dec_cached.decoded_image, dec_disk.decoded_image
    )


def test_warped_memo_reuse(experiment):
    ds = experiment
    dec = PixelDecoder(
        ds, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0
    )
    df1 = dec.decode_one_tile(0, save=False)
    assert dec._warped_memo is not None
    df2 = dec.decode_one_tile(0, save=False)  # memo hit
    pd.testing.assert_frame_equal(df1, df2)
    dec._invalidate_warped_memo()
    df3 = dec.decode_one_tile(0, save=False)
    pd.testing.assert_frame_equal(df1, df3)


def test_deferred_persistence_matches_sync(tmp_path):
    ds_sync, _ = generate_synthetic_experiment(
        tmp_path / "sync", shape=(6, 48, 48), n_spots=15, seed=9
    )
    ds_def, _ = generate_synthetic_experiment(
        tmp_path / "deferred", shape=(6, 48, 48), n_spots=15, seed=9
    )
    _run_registration(ds_sync, persist="sync")
    reg = _run_registration(ds_def, persist="deferred", device_cache=TileDeviceCache())
    reg.drain_persistence()

    for bit_idx in range(ds_sync.num_bits):
        a = np.asarray(ds_sync.load_local_registered_image(tile=0, bit=bit_idx))
        b = np.asarray(ds_def.load_local_registered_image(tile=0, bit=bit_idx))
        np.testing.assert_array_equal(a, b)
        pa = np.asarray(
            ds_sync.load_local_feature_predictor_image(tile=0, bit=bit_idx)
        )
        pb = np.asarray(
            ds_def.load_local_feature_predictor_image(tile=0, bit=bit_idx)
        )
        np.testing.assert_array_equal(pa, pb)
    for r in range(ds_sync.num_rounds):
        ta = ds_sync.load_local_round_transform_zyx_um(0, r)
        tb = ds_def.load_local_round_transform_zyx_um(0, r)
        np.testing.assert_allclose(ta, tb)
        ia = ds_sync.load_local_registered_image(tile=0, round=r)
        ib = ds_def.load_local_registered_image(tile=0, round=r)
        assert (ia is None) == (ib is None)
        if ia is not None:
            np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_minimal_persistence_decode_and_spot_tables(tmp_path):
    """persist='minimal': same-process decode off the device cache matches
    the sync-persisted decode exactly; the probability map lands on disk
    byte-identical (sparse link encoding is lossless); decon volumes are
    NOT re-persisted; spot tables match the sync path (dilated-support
    readback covers every ROI voxel)."""
    ds_min, _ = generate_synthetic_experiment(
        tmp_path / "min" / "qi2labdatastore", shape=(6, 64, 64), n_spots=25,
        seed=5,
    )
    ds_ref, _ = generate_synthetic_experiment(
        tmp_path / "ref" / "qi2labdatastore", shape=(6, 64, 64), n_spots=25,
        seed=5,
    )

    cache = TileDeviceCache()
    reg_min = _run_registration(ds_min, device_cache=cache, persist="minimal")
    df_min = PixelDecoder(
        ds_min, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0,
        device_cache=cache,
    ).decode_one_tile(0, save=False)
    reg_min.drain_persistence()

    _run_registration(ds_ref, persist="sync")
    df_ref = PixelDecoder(
        ds_ref, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0
    ).decode_one_tile(0, save=False)

    assert len(df_min) > 0
    pd.testing.assert_frame_equal(
        df_min.reset_index(drop=True), df_ref.reset_index(drop=True)
    )
    for b in range(len(ds_min.bit_ids)):
        # decon skipped, probability identical, spot tables identical
        assert ds_min.local_image_shape(0, bit=b, image="registered") is None
        np.testing.assert_array_equal(
            np.asarray(ds_min.load_local_feature_predictor_image(tile=0, bit=b)),
            np.asarray(ds_ref.load_local_feature_predictor_image(tile=0, bit=b)),
        )
        pd.testing.assert_frame_equal(
            ds_min.load_local_feature_predictor_spots(tile=0, bit=b),
            ds_ref.load_local_feature_predictor_spots(tile=0, bit=b),
        )
    # resume scan treats minimal tiles as incomplete (decon recompute path)
    assert not reg_min._is_tile_complete(0)


def test_minimal_requires_device_cache():
    with pytest.raises(ValueError, match="minimal"):
        DataRegistration(object.__new__(object), persist="minimal")


def test_cache_miss_populates_from_persisted_forms(experiment):
    """A decoder handed an EMPTY cache (the resumed-run case: registration
    skipped, cache cold) must repopulate it from the persisted u16/u8
    forms — after one decode the cache holds the tile and the result is
    bit-identical to the plain disk decode."""
    ds = experiment
    _run_registration(ds, persist="sync")

    cold_cache = TileDeviceCache()
    dec = PixelDecoder(
        ds, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0,
        device_cache=cold_cache,
    )
    with pytest.warns(UserWarning, match="cache miss"):
        df_pop = dec.decode_one_tile(0, save=False)
    assert cold_cache.has_bits(0, range(len(ds.bit_ids)))

    df_disk = PixelDecoder(
        ds, minimum_pixels=2, magnitude_threshold=(0.5, 10.0), verbose=0
    ).decode_one_tile(0, save=False)
    pd.testing.assert_frame_equal(
        df_pop.reset_index(drop=True), df_disk.reset_index(drop=True)
    )
