"""Segmentation fallback + external-mask ingestion tests.

The reference delegates segmentation to Cellpose-SAM
(`cli/qi2lab_microscopes/segment_fiducial.py:24-270`); this build accepts
external label masks and ships a watershed fallback that must split
touching cells.
"""

import numpy as np
import pytest

from merfish3d_tpu.pipeline.segmentation import (
    threshold_segment,
    watershed_segment,
)


def _two_touching_blobs(shape=(128, 128), c1=(64, 44), c2=(64, 84), r=12):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img = np.zeros(shape, np.float32)
    for cy, cx in (c1, c2):
        img += 1000.0 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r**2)))
    return img


def test_watershed_splits_touching_cells():
    img = _two_touching_blobs()
    merged = threshold_segment(img, sigma=2.0, min_area=50)
    # the plain threshold fallback merges the touching pair...
    assert merged.max() == 1
    labels = watershed_segment(
        img, sigma=2.0, min_area=50, min_seed_distance=15
    )
    # ...the watershed splits it
    assert labels.max() == 2
    # each seed center belongs to its own label
    assert labels[64, 44] != 0
    assert labels[64, 84] != 0
    assert labels[64, 44] != labels[64, 84]


def test_watershed_empty_image():
    labels = watershed_segment(np.zeros((32, 32), np.float32))
    assert labels.max() == 0


def test_external_mask_to_cell_assignment(tmp_path):
    """External ("Cellpose") label mask through --mask-path → decode with
    cell assignment must produce distinct nontrivial cell ids for spots in
    adjacent cells (reference `segment_fiducial.py` + `_assign_cells`)."""
    from merfish3d_tpu.cli.qi2lab import segment_fiducial as seg_cli
    from merfish3d_tpu.pipeline import PixelDecoder
    from merfish3d_tpu.utils.simulation import generate_synthetic_experiment

    path = tmp_path / "qi2labdatastore"
    ds, gt = generate_synthetic_experiment(
        path, shape=(8, 64, 96), n_spots=60, seed=13
    )
    spacing = np.asarray(ds.voxel_size_zyx_um, np.float64)
    ds.save_global_fiducial_image(
        np.zeros((8, 64, 96), np.uint16),
        affine_zyx_um=np.eye(4),
        origin_zyx_um=[0.0, 0.0, 0.0],
        spacing_zyx_um=list(spacing),
    )
    # two adjacent cells split at x = 48 (inset from the borders so the
    # outline contours close)
    mask = np.zeros((64, 96), np.uint16)
    mask[2:62, 2:48] = 1
    mask[2:62, 48:94] = 2
    mask_file = tmp_path / "cellpose_mask.npy"
    np.save(mask_file, mask)
    seg_cli.main(
        ["--datastore-path", str(ds.datastore_path), "--mask-path", str(mask_file)]
    )
    # the CLI re-opened the store by path; reload state from disk
    from merfish3d_tpu.datastore import qi2labDataStore

    reopened = qi2labDataStore(ds.datastore_path)
    assert reopened.datastore_state["SegmentedCells"] is True

    decoder = PixelDecoder(
        ds, minimum_pixels=4, magnitude_threshold=(0.9, 10.0), verbose=0
    )
    decoder._load_global_normalization_vectors(recalculate=True)
    df = decoder.decode_all_tiles(
        assign_to_cells=True, filter_method="none"
    )
    assert "cell_id" in df.columns
    assigned = df[df["cell_id"] > 0]
    assert len(assigned) > 0
    # both cells receive spots
    assert set(assigned["cell_id"].unique()) == {1, 2}
    # assignment is geometrically correct: cell 1 spots left of the split
    left = assigned[assigned["cell_id"] == 1]
    right = assigned[assigned["cell_id"] == 2]
    split_um = 48 * spacing[2]
    assert (left["global_x"] < split_um + spacing[2]).all()
    assert (right["global_x"] > split_um - 2 * spacing[2]).all()
