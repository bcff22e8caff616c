"""Viewer data layer (reference `viewer.py:27-1275`) + ImageJ ROI zip
round-trip, exercised hermetically against a stub datastore."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.utils.imagej_rois import (
    decode_polygon_roi,
    encode_polygon_roi,
    read_imagej_rois_zip,
    write_imagej_rois_zip,
)
from merfish3d_tpu.viz import viewer as vw


def test_imagej_roi_roundtrip(tmp_path):
    poly1 = np.array([[1.25, 2.5], [10.75, 2.5], [10.75, 9.0], [1.25, 9.0]])
    poly2 = np.array([[-3.5, 4.0], [5.0, -1.25], [7.5, 8.5]])
    blob = encode_polygon_roi(poly1)
    assert blob[:4] == b"Iout"
    np.testing.assert_allclose(decode_polygon_roi(blob), poly1, atol=1e-6)

    path = write_imagej_rois_zip(tmp_path / "rois.zip", {7: poly1, 9: poly2})
    loaded = read_imagej_rois_zip(path)
    assert set(loaded) == {1, 2}
    np.testing.assert_allclose(loaded[1], poly1, atol=1e-6)
    np.testing.assert_allclose(loaded[2], poly2, atol=1e-6)

    # integer fallback: strip the float block, keep the int16 coordinates
    header_and_ints = bytearray(blob[: 64 + 4 * len(poly1)])
    header_and_ints[50:52] = (0).to_bytes(2, "big")  # clear sub-pixel option
    coarse = decode_polygon_roi(bytes(header_and_ints))
    np.testing.assert_allclose(coarse, np.round(poly1), atol=0.5)


class _StubStore:
    """Minimal datastore surface the viewer layer consumes."""

    def __init__(self, path: Path):
        self._datastore_path = Path(path)
        self.datastore_state = {"Calibrations": True, "FilteredSpots": True}
        self.num_tiles = 2
        self.voxel_size_zyx_um = [0.31, 0.098, 0.098]
        self.tile_ids = ["tile0000", "tile0001"]
        self.round_ids = ["round001"]
        self.bit_ids = ["bit001", "bit002"]
        self._img = np.random.default_rng(0).normal(
            size=(4, 8, 8)
        ).astype(np.float32)
        self.spots = pd.DataFrame(
            {
                "tile_z": [1.0, 2.0],
                "tile_y": [3.0, 6.0],
                "tile_x": [4.0, 2.0],
                "global_y": [0.5, 0.9],
                "global_x": [0.2, 0.7],
                "gene_id": ["a", "b"],
                "tile_idx": [0, 1],
            }
        )
        self.outlines = {
            "cells": [
                {"cell_id": 1,
                 "polygon_global_yx": [[0.1, 0.1], [0.1, 0.6], [0.6, 0.6], [0.6, 0.1]]}
            ]
        }

    def load_local_corrected_image(self, tile=None, round=None, bit=None):
        return self._img

    def load_local_registered_image(self, tile=None, round=None, bit=None):
        return self._img * 2

    def load_local_feature_predictor_image(self, tile=None, bit=None):
        return None

    def load_global_filtered_decoded_spots(self):
        return self.spots

    def load_local_decoded_spots(self, tile=None):
        return self.spots

    def load_global_cellpose_outlines(self):
        return self.outlines

    def load_global_cellpose_segmentation_image(self, return_future=False):
        return (self._img[:1] > 0).astype(np.uint32)

    def load_global_fiducial_image(self, return_future=False):
        return self._img, (np.eye(4), np.zeros(3), np.asarray(self.voxel_size_zyx_um))

    def load_global_coord_xforms_um(self, tile=None):
        return np.eye(4), np.zeros(3), np.asarray(self.voxel_size_zyx_um)

    def load_codebook_parsed(self):
        return ["a", "b"], np.array([[1, 0], [1, 1]])


def test_channel_stack_and_micron_coords(tmp_path):
    ds = _StubStore(tmp_path)
    stack = vw.load_image_channels(
        ds, "tile0000", ["corrected", "registered"], ["bit001"],
        ["corrected", "registered", "feature"],
    )
    # feature predictor is unavailable → skipped
    assert stack.data.shape == (4, 4, 8, 8)
    assert stack.labels[0].endswith("fiducial corrected")
    assert vw.selected_image_channel_count(
        ["corrected", "registered"], ["bit001"], ["corrected", "registered"], True
    ) == 4

    ms = vw.stack_with_micron_coords(stack, ds.voxel_size_zyx_um, (1.0, 2.0, 3.0))
    assert ms.dims == ("c", "z_um", "y_um", "x_um")
    np.testing.assert_allclose(ms.coords["z_um"][:2], [1.0, 1.31])
    assert vw.empty_micron_stack().data.shape == (1, 1, 2, 2)

    with pytest.raises(ValueError):
        vw.load_image_channels(ds, "tile0000", [], [], [])
    assert vw.unavailable_data_message(ValueError("x")).startswith("Data not")


def test_availability_and_codebook(tmp_path):
    ds = _StubStore(tmp_path)
    summary = vw.component_summary(ds)
    assert summary["FilteredSpots"] and not summary["Fused"]
    assert vw.decoded_available(ds)
    assert vw.cell_outlines_available(ds)  # via outline JSON fallback
    assert vw.global_cellpose_segmentation_available(ds)
    assert vw.codebook_gene_bits(ds) == {"a": ["bit001"], "b": ["bit001", "bit002"]}


def test_overlays(tmp_path):
    ds = _StubStore(tmp_path)
    overlay = vw.rasterize_decoded_spots(ds.spots, (4, 8, 8))
    assert overlay[1, 3, 4] == 1.0 and overlay[2, 6, 2] == 1.0
    only_a = vw.rasterize_decoded_spots(ds.spots, (4, 8, 8), genes=["a"])
    assert only_a[1, 3, 4] == 1.0 and only_a[2, 6, 2] == 0.0

    per_tile = vw.decoded_overlay_for_tile(ds, "tile0001", (4, 8, 8))
    assert per_tile[2, 6, 2] == 1.0 and per_tile[1, 3, 4] == 0.0  # tile filter

    spacing = np.asarray([0.31, 0.1, 0.1])
    glob = vw.rasterize_global_decoded_spots(
        ds.spots, (1, 16, 16), np.zeros(3), spacing
    )
    assert glob[0, 5, 2] == 1.0 and glob[0, 9, 7] == 1.0
    assert vw.global_decoded_overlay(ds, (1, 16, 16), np.zeros(3), spacing) is not None

    # outlines: tile overlay via inverse affine, global overlay direct
    tile_ov = vw.cell_outline_overlay_for_tile(ds, "tile0000", (2, 12, 12))
    assert tile_ov.shape == (2, 12, 12) and tile_ov.max() == 1.0
    np.testing.assert_array_equal(tile_ov[0], tile_ov[1])  # z-repeated
    glob_ov = vw.global_cell_outline_overlay(
        ds, (1, 12, 12), np.zeros(3), np.asarray([1.0, 0.1, 0.1])
    )
    assert glob_ov.max() == 1.0

    # roi zip takes precedence once written
    write_imagej_rois_zip(
        Path(tmp_path) / "segmentation" / "cellpose" / "imagej_rois"
        / "global_coords_rois.zip",
        {1: np.array([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6]])},
    )
    assert vw._load_global_cellpose_roi_zip(ds) is not None


def test_global_channels_and_append(tmp_path):
    ds = _StubStore(tmp_path)
    gs = vw.load_global_image_channels(ds)
    assert gs.stack.data.shape[0] == 2  # projection + segmentation
    assert gs.stack.data.shape[1] == 1  # max projection keeps one plane
    stack = vw.load_image_channels(ds, "tile0000", ["corrected"], [], [])
    merged = vw.append_overlay_channel(
        stack, np.ones_like(stack.data[0]), "overlay"
    )
    assert merged.data.shape[0] == 2 and merged.labels[-1] == "overlay"
    with pytest.raises(ValueError):
        vw.append_overlay_channel(stack, np.ones((1, 2, 2)), "bad")
    assert vw.append_overlay_channel(stack, None, "none") is stack

    class _Viewer:
        def __init__(self):
            self.labels = None

        def set_channel_labels(self, labels):
            self.labels = labels

    v = _Viewer()
    assert vw.apply_lut_channel_labels(v, ["a", "b"]) == 2
    assert v.labels == ["a", "b"]
    assert vw.apply_lut_channel_labels(object(), ["a"]) == 0


def test_normalize_datastore_path(tmp_path):
    direct = tmp_path / "qi2labdatastore"
    direct.mkdir()
    (direct / "datastore_state.json").write_text("{}")
    assert vw.normalize_datastore_path(tmp_path) == direct.resolve()
    assert vw.normalize_datastore_path(direct) == direct.resolve()
    with pytest.raises(FileNotFoundError):
        vw.normalize_datastore_path(tmp_path / "nothing")


def test_interactive_viewer_headless(tmp_path):
    """The interactive shell (matplotlib widgets) drives headless on Agg:
    z/channel stepping, tile paging, overlay toggles, and PNG export all
    work against a real populated datastore."""
    from merfish3d_tpu.utils.simulation import generate_synthetic_experiment
    from merfish3d_tpu.viz.interactive import MatplotlibViewer
    from merfish3d_tpu.viz.viewer import Qi2labViewer

    ds, _gt = generate_synthetic_experiment(
        tmp_path / "ds", shape=(6, 48, 48), n_spots=20, seed=3
    )
    v = MatplotlibViewer(ds, backend="Agg")
    f0 = v.current_frame()
    assert f0 is not None and f0.shape == (48, 48)

    v.set_z(3)
    assert v._z == 3
    v.set_channel(1)
    f1 = v.current_frame()
    assert f1 is not None
    assert not np.array_equal(f0, f1)  # different channel content

    labels = [d[0] for d in v._channel_descriptors()]
    # fiducial + (decon + probability) per bit
    assert any("fiducial" in L for L in labels)
    assert any("probability" in L for L in labels)

    v.toggle_spots()
    v.toggle_outlines()
    v.next_view()  # single tile, wraps back
    assert v.view == ds.tile_ids[0]

    png = tmp_path / "frame.png"
    v.savefig(png)
    assert png.exists() and png.stat().st_size > 1000
    v.close()

    # the GUI wrapper resolves to the matplotlib shell in this environment
    w = Qi2labViewer(ds, backend="Agg")
    assert w._backend_kind == "matplotlib"
    assert w.current_frame() is not None
    w.close()
