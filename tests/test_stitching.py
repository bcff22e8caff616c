"""Streamed chunked fusion tests: chunked output must equal the dense
result, host memory stays bounded by the chunk + tile cache, and
all-channel fusion warps readout bits through the stored decode transforms
(reference `DataRegistration.py:1650-1837`, `cli/.../fuseall.py`)."""

import numpy as np
import pandas as pd

from merfish3d_tpu.datastore import qi2labDataStore
from merfish3d_tpu.pipeline.registration import (
    GlobalFusionConfig,
    GlobalRegistrationConfig,
)
from merfish3d_tpu.pipeline.stitching import fuse_global_registered, global_register

SPACING = np.asarray([0.31, 0.098, 0.098])
TILE = (6, 48, 48)
STEP = 40  # 8 px overlap


def _bead_field(shape, seed=3):
    rng = np.random.default_rng(seed)
    big = np.zeros(shape, np.float32)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
    )
    for _ in range(200):
        c = [rng.uniform(2, s - 2) for s in shape]
        big += (
            rng.uniform(400, 1200)
            * np.exp(
                -((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
                / (2 * 1.1**2)
            )
        ).astype(np.float32)
    return big


def _build_grid_store(tmp_path, ny=3, nx=3):
    """ny x nx tile grid cut from one field, exact stage positions."""
    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["fid", "r1", "r2"]
    ds.num_tiles = ny * nx
    ds.voxel_size_zyx_um = list(SPACING)
    ds.experiment_order = np.array([[1, 1, 2]])
    ds.codebook = pd.DataFrame(
        {"gene_id": ["g1", "g2"], "bit01": [1, 0], "bit02": [0, 1]}
    )
    canvas = (TILE[0], TILE[1] + STEP * (ny - 1), TILE[2] + STEP * (nx - 1))
    big = _bead_field(canvas)
    t = 0
    for iy in range(ny):
        for ix in range(nx):
            img = big[
                :, iy * STEP : iy * STEP + TILE[1], ix * STEP : ix * STEP + TILE[2]
            ]
            ds.initialize_tile(t)
            u16 = np.clip(img + 20, 0, 65535).astype(np.uint16)
            ds.save_local_corrected_image(u16, tile=t, round=0)
            ds.save_local_registered_image(u16, tile=t, round=0)
            ds.save_local_stage_position_zyx_um(
                np.asarray([0.0, iy * STEP, ix * STEP]) * SPACING, tile=t, round=0
            )
            ds.save_local_wavelengths_um((0.488, 0.520), tile=t, round=0)
            ds.save_local_round_transform_zyx_um(np.eye(4), tile=t, round=0)
            t += 1
    return ds


def test_chunked_fusion_matches_dense(tmp_path):
    """Fusing with a chunk size far smaller than the global volume must be
    identical to fusing in one giant chunk; the streaming path's peak host
    allocation is a single chunk, not the global bounding box."""
    ds = _build_grid_store(tmp_path)
    for t in range(9):
        ds.save_global_coord_xforms_um(
            t,
            affine_zyx_um=np.eye(4),
            origin_zyx_um=np.asarray(
                [0.0, (t // 3) * STEP, (t % 3) * STEP]
            )
            * SPACING,
            spacing_zyx_um=SPACING,
        )

    fuse_global_registered(
        ds,
        config=GlobalFusionConfig(chunk_px=24, tile_cache_tiles=2),
        verbose=0,
    )
    chunked, (a1, o1, s1) = ds.load_global_fiducial_image()

    fuse_global_registered(
        ds, config=GlobalFusionConfig(chunk_px=4096), verbose=0
    )
    dense, (a2, o2, s2) = ds.load_global_fiducial_image()

    assert chunked.shape == dense.shape
    np.testing.assert_array_equal(chunked, dense)
    np.testing.assert_allclose(o1, o2)
    # global volume spans the full grid
    assert chunked.shape[1] >= TILE[1] + 2 * STEP - 1
    # interior equals the source field away from feather boundaries
    assert chunked.max() > 100


def test_global_register_then_streamed_fusion_grid(tmp_path):
    """End-to-end: registration on the grid (identity corrections expected,
    exact stage positions) then streamed fusion reproduces the mosaic."""
    ds = _build_grid_store(tmp_path)
    global_register(
        ds,
        config=GlobalRegistrationConfig(binning_zyx=(1, 1, 1)),
        fusion_config=GlobalFusionConfig(chunk_px=32, tile_cache_tiles=3),
        verbose=0,
    )
    for t in range(9):
        corr = ds.load_global_coord_xforms_um(t)[0][:3, 3] / SPACING
        np.testing.assert_allclose(corr, 0, atol=0.6)
    fused, _ = ds.load_global_fiducial_image()
    assert ds.datastore_state["Fused"] is True
    assert fused.shape[0] == TILE[0]
    # max projection artifact written
    assert (
        ds._datastore_path
        / "segmentation"
        / "cellpose"
        / "fiducial_max_projection.ome.tiff"
    ).exists()


def test_fuse_all_channels_applies_decode_warp(tmp_path):
    """Readout bits are warped through round affine ∘ chromatic⁻¹ before
    fusion: a bit stored with a known round shift must land aligned with
    the fiducial in the fused all-channels volume."""
    from merfish3d_tpu.cli.qi2lab.fuseall import fuse_all_channels

    ds = qi2labDataStore(tmp_path / "ds")
    ds.channels_in_data = ["fid", "r1", "r2"]
    ds.num_tiles = 1
    ds.voxel_size_zyx_um = list(SPACING)
    # 2 rounds: bits 1+2 in round 1, bits 3+4 in round 2
    ds.experiment_order = np.array([[1, 1, 2], [2, 3, 4]])
    ds.codebook = pd.DataFrame(
        {"gene_id": ["g1", "g2"], **{f"bit{i:02d}": [1, 0] for i in range(1, 5)}}
    )
    base = _bead_field(TILE, seed=5)
    ds.initialize_tile(0)
    u16 = np.clip(base + 20, 0, 65535).astype(np.uint16)
    ds.save_local_corrected_image(u16, tile=0, round=0)
    ds.save_local_registered_image(u16, tile=0, round=0)
    ds.save_local_stage_position_zyx_um(np.zeros(3), tile=0, round=0)
    ds.save_local_wavelengths_um((0.488, 0.520), tile=0, round=0)
    ds.save_local_round_transform_zyx_um(np.eye(4), tile=0, round=0)

    # round 2 sees the scene shifted: moving[x] = base[x+3]. The stored
    # round transform maps reference coords -> moving coords, so reference
    # x corresponds to moving x-3 (translation -3 px * spacing).
    shift_px = 3.0
    xf = np.eye(4)
    xf[2, 3] = -shift_px * SPACING[2]
    ds.save_local_round_transform_zyx_um(xf, tile=0, round=1)
    ds.save_local_stage_position_zyx_um(np.zeros(3), tile=0, round=1)

    moving = np.roll(base, -int(shift_px), axis=2)
    for bit, img in [(0, base), (1, base), (2, moving), (3, moving)]:
        ds.save_local_registered_image(
            np.clip(img + 20, 0, 65535).astype(np.uint16), tile=0, bit=bit
        )
        ds.save_local_wavelengths_um((0.561, 0.590), tile=0, bit=bit)

    ds.save_global_coord_xforms_um(
        0,
        affine_zyx_um=np.eye(4),
        origin_zyx_um=np.zeros(3),
        spacing_zyx_um=SPACING,
    )
    fuse_all_channels(ds, verbose=0, chunk_px=32)
    fused, _ = ds.load_global_fiducial_image(all_channels=True)
    assert fused.shape[0] == 5  # fiducial + 4 bits

    # warped bit 3 aligns with the fiducial channel (high correlation on
    # the interior, away from warp fill + feather edges); the global bbox
    # may be ceil-padded beyond the tile, so crop to the tile extent first
    tile_box = tuple(slice(0, s) for s in TILE)
    interior = (slice(1, -1), slice(4, -4), slice(8, -8))
    fid = fused[0][tile_box][interior].astype(np.float64)
    b3 = fused[3][tile_box][interior].astype(np.float64)
    fid -= fid.mean()
    b3 -= b3.mean()
    ncc = (fid * b3).sum() / np.sqrt((fid**2).sum() * (b3**2).sum())
    assert ncc > 0.98

    # unwarped fusion of the same bit would misalign: compare against the
    # raw shifted volume pasted without the round transform
    raw = np.roll(base, -int(shift_px), axis=2)[interior]
    raw = raw - raw.mean()
    ncc_unwarped = (fid * raw).sum() / np.sqrt((fid**2).sum() * (raw**2).sum())
    assert ncc > ncc_unwarped + 0.005


def test_stream_fuse_bounded_memory_discipline():
    """The streaming pass touches the output only in chunk-shaped writes
    and holds at most `tile_cache` tiles: fusing a grid whose global
    volume far exceeds one chunk never materializes more than
    (chunk buffer + cache) — the direct-to-zarr discipline (reference
    `DataRegistration.py:1728-1743`)."""
    from merfish3d_tpu.pipeline.stitching import _TileCache, stream_fuse

    tile_shape = (4, 32, 32)
    step = 24
    n = 4  # 4x4 grid -> global ~ (4, 104, 104), chunk 32 -> many chunks
    rng = np.random.default_rng(0)
    tiles = {
        t: rng.uniform(0, 1000, tile_shape).astype(np.float32)
        for t in range(n * n)
    }
    starts = [
        np.asarray([0, (t // n) * step, (t % n) * step]) for t in range(n * n)
    ]
    out_shape = np.asarray([4, 32 + step * (n - 1), 32 + step * (n - 1)])

    loads = []

    def loader(t):
        loads.append(t)
        return tiles[t]

    cache = _TileCache(loader, 2)

    writes = []

    class SpyOut:
        def __init__(self):
            self.data = np.zeros(tuple(out_shape), np.uint16)

        def __setitem__(self, key, value):
            writes.append(tuple(value.shape))
            self.data[key] = value

    spy = SpyOut()
    stream_fuse(
        spy,
        out_shape=out_shape,
        tile_starts_px=starts,
        tile_shape_px=tile_shape,
        tile_cache=cache,
        chunk_px=32,
        feather_px=8,
    )
    # every write is at most one chunk
    assert writes and all(
        s[0] <= 64 and s[1] <= 32 and s[2] <= 32 for s in writes
    )
    # the cache re-loaded tiles instead of holding them all: with capacity
    # 2 and 16 tiles the loader must have been called more than 16 times,
    # and the cache never held more than 2
    assert len(loads) > n * n
    assert len(cache._cache) <= 2
    # and the fused content is correct: interior of a central tile matches
    # (weights sum to the feather everywhere it's the only contributor)
    t5 = tiles[5]
    s5 = starts[5]
    inner = spy.data[
        1:3, s5[1] + 12 : s5[1] + 20, s5[2] + 12 : s5[2] + 20
    ]
    expect = np.clip(t5[1:3, 12:20, 12:20], 0, 65535).astype(np.uint16)
    np.testing.assert_allclose(
        inner.astype(float), expect.astype(float), atol=1.0
    )
