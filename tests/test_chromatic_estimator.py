"""Chromatic affine estimation contract tests (modeled on the reference
`tests/test_chromatic_estimator.py`): the estimator must recover a known
chromatic affine from decoded on-bit centroids in the presence of random
outliers, same-wavelength distractors, and systematically-shifted blank
transcripts."""

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.pipeline.chromatic import (
    ChromaticAffineEstimationConfig,
    estimate_chromatic_affines_from_barcodes,
    fit_affine_zyx_um,
    save_identity_chromatic_affines,
)


@dataclass
class _FakeDataStore:
    voxel_size_zyx_um: np.ndarray
    bit_ids: list
    tile_ids: list
    calibration: dict | None = None

    def load_local_wavelengths_um(self, tile, bit):
        bit_index = self.bit_ids.index(bit) + 1
        if bit_index in (1, 2):
            return 0.49, 0.58
        return 0.63, 0.67

    def load_chromatic_affine_transforms_zyx_um(self):
        return self.calibration or {}

    def save_chromatic_affine_transforms_zyx_um(self, calibration):
        self.calibration = calibration


def _true_affine():
    affine = np.eye(4)
    affine[0, 3] = 0.18
    affine[1, 1] = 0.9982
    affine[1, 3] = 0.42
    affine[2, 2] = 0.9982
    affine[2, 3] = -0.31
    return affine


def _transform(affine, pts):
    homo = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    return (homo @ affine.T)[:, :3]


def _empty_row():
    row = {"on_bit_1": 1, "on_bit_2": 2, "on_bit_3": 3, "on_bit_4": 4,
           "gene_id": "GeneA"}
    for b in range(1, 5):
        for sfx in ("center_z", "center_y", "center_x", "intensity_sum"):
            row[f"bit{b:02d}_{sfx}"] = np.nan
    return row


def _add_center(row, b, center_px, weight):
    row[f"bit{b:02d}_center_z"] = float(center_px[0])
    row[f"bit{b:02d}_center_y"] = float(center_px[1])
    row[f"bit{b:02d}_center_x"] = float(center_px[2])
    row[f"bit{b:02d}_intensity_sum"] = float(weight)


def _make_table(spacing, true_affine, n_good=500, n_outliers=300,
                n_same_wl=500, n_blank=900, seed=12345):
    rng = np.random.default_rng(seed)
    inv = np.linalg.inv(true_affine)
    blank_affine = np.eye(4)
    blank_affine[:3, 3] = [-0.8, -5.0, 4.0]
    inv_blank = np.linalg.inv(blank_affine)
    rows = []
    ref_pts = np.column_stack(
        [rng.uniform(2, 18, n_good), rng.uniform(0, 200, n_good),
         rng.uniform(0, 200, n_good)]
    )
    red_pts = _transform(inv, ref_pts)
    for rp, dp in zip(ref_pts, red_pts):
        row = _empty_row()
        for b in (1, 2):
            _add_center(row, b, (rp + rng.normal(0, 0.035, 3)) / spacing,
                        rng.uniform(80, 140))
        for b in (3, 4):
            _add_center(row, b, (dp + rng.normal(0, 0.035, 3)) / spacing,
                        rng.uniform(80, 140))
        rows.append(row)
    for _ in range(n_outliers):
        row = _empty_row()
        rp = np.array([rng.uniform(2, 18), rng.uniform(0, 200), rng.uniform(0, 200)])
        dp = np.array([rng.uniform(2, 18), rng.uniform(0, 200), rng.uniform(0, 200)])
        for b in (1, 2):
            _add_center(row, b, (rp + rng.normal(0, 0.035, 3)) / spacing,
                        rng.uniform(80, 140))
        for b in (3, 4):
            _add_center(row, b, (dp + rng.normal(0, 0.035, 3)) / spacing,
                        rng.uniform(80, 140))
        rows.append(row)
    for _ in range(n_same_wl):
        row = _empty_row()
        p = np.array([rng.uniform(2, 18), rng.uniform(0, 200), rng.uniform(0, 200)])
        if rng.random() < 0.5:
            row.update({"on_bit_1": 1, "on_bit_2": 2, "on_bit_3": 1, "on_bit_4": 2})
            bits = (1, 2)
        else:
            row.update({"on_bit_1": 3, "on_bit_2": 4, "on_bit_3": 3, "on_bit_4": 4})
            bits = (3, 4)
        for b in bits:
            _add_center(row, b, (p + rng.normal(0, 0.035, 3)) / spacing,
                        rng.uniform(80, 140))
        rows.append(row)
    blank_ref = np.column_stack(
        [rng.uniform(2, 18, n_blank), rng.uniform(0, 200, n_blank),
         rng.uniform(0, 200, n_blank)]
    )
    blank_red = _transform(inv_blank, blank_ref)
    for rp, dp in zip(blank_ref, blank_red):
        row = _empty_row()
        row["gene_id"] = "Blank-1"
        for b in (1, 2):
            _add_center(row, b, (rp + rng.normal(0, 0.015, 3)) / spacing,
                        rng.uniform(200, 260))
        for b in (3, 4):
            _add_center(row, b, (dp + rng.normal(0, 0.015, 3)) / spacing,
                        rng.uniform(200, 260))
        rows.append(row)
    return pd.DataFrame(rows).sample(frac=1, random_state=42).reset_index(drop=True)


def test_chromatic_estimator_recovers_affine_with_distractors():
    spacing = np.array([0.32, 0.098, 0.098], dtype=np.float32)
    true_affine = _true_affine()
    ds = _FakeDataStore(
        voxel_size_zyx_um=spacing,
        bit_ids=["bit001", "bit002", "bit003", "bit004"],
        tile_ids=["tile0000"],
    )
    table = _make_table(spacing, true_affine)
    estimate_chromatic_affines_from_barcodes(
        ds, table, n_merfish_bits=4,
        config=ChromaticAffineEstimationConfig(min_pairs=20),
    )
    channel = ds.calibration["channels"]["wavelength_0.670000"]
    assert channel["status"] == "affine_estimated"
    assert channel["diagnostics"]["paired_transcripts"] == 800
    fit = channel["diagnostics"]["path_fits"][0]["fit"]
    assert fit["candidate_pairs"] >= 500
    assert fit["used_pairs"] >= 300
    assert fit["median_residual_um"] < 0.12
    estimated = np.asarray(channel["affine_zyx_um"])
    np.testing.assert_allclose(estimated, true_affine, atol=0.006)


def test_identity_initialization():
    spacing = np.array([0.32, 0.098, 0.098], dtype=np.float32)
    ds = _FakeDataStore(
        voxel_size_zyx_um=spacing,
        bit_ids=["bit001", "bit002", "bit003", "bit004"],
        tile_ids=["tile0000"],
    )
    save_identity_chromatic_affines(ds, 4)
    channels = ds.calibration["channels"]
    assert set(channels) == {"wavelength_0.580000", "wavelength_0.670000"}
    assert channels["wavelength_0.580000"]["status"] == "identity_reference"
    assert channels["wavelength_0.670000"]["status"] == "identity_initialization"
    np.testing.assert_allclose(
        channels["wavelength_0.670000"]["affine_zyx_um"], np.eye(4)
    )


def test_fit_affine_rejects_degenerate_inputs():
    cfg = ChromaticAffineEstimationConfig(min_pairs=5)
    # too few pairs
    affine, diag = fit_affine_zyx_um(
        np.zeros((3, 3)), np.zeros((3, 3)), min_pairs=5, config=cfg
    )
    assert affine is None and diag["status"] == "insufficient_pairs"
    # rank-deficient lateral geometry (all on a line)
    src = np.column_stack([np.zeros(30), np.arange(30.0), np.arange(30.0)])
    affine, diag = fit_affine_zyx_um(src, src, min_pairs=5, config=cfg)
    assert affine is None and diag["status"] == "insufficient_lateral_spatial_rank"


def test_chromatic_estimator_ignores_invalid_rows():
    """Mirrors reference `test_chromatic_estimator_counts_only_valid_
    nonblank_cross_wavelength_rows`: empty/missing gene ids, out-of-range
    on-bit indices, and NaN centers must not contribute pairs or shift the
    recovered affine."""
    spacing = np.array([0.32, 0.098, 0.098], dtype=np.float32)
    true_affine = _true_affine()
    ds = _FakeDataStore(
        voxel_size_zyx_um=spacing,
        bit_ids=["bit001", "bit002", "bit003", "bit004"],
        tile_ids=["tile0000"],
    )
    table = _make_table(spacing, true_affine, n_good=200, n_outliers=0,
                        n_same_wl=0, n_blank=0)

    invalid = []
    row = _empty_row()
    row["gene_id"] = ""
    _add_center(row, 1, [5, 50, 50], 1000.0)
    _add_center(row, 3, [5, 90, 90], 1000.0)
    invalid.append(row)
    row = _empty_row()
    row["gene_id"] = None
    _add_center(row, 1, [5, 50, 50], 1000.0)
    _add_center(row, 3, [5, 90, 90], 1000.0)
    invalid.append(row)
    row = _empty_row()  # on-bit indices outside the bit table
    row.update({"on_bit_1": 99, "on_bit_2": 98, "on_bit_3": 97, "on_bit_4": 96})
    for b in range(1, 5):
        _add_center(row, b, [5, 40, 40], 1000.0)
    invalid.append(row)
    row = _empty_row()  # NaN centers on the red channel
    for b in range(1, 5):
        _add_center(row, b, [5, 60, 60], 1000.0)
    row["bit03_center_y"] = np.nan
    row["bit04_center_y"] = np.nan
    invalid.append(row)

    full = pd.concat([table, pd.DataFrame(invalid)], ignore_index=True)
    estimate_chromatic_affines_from_barcodes(
        ds, full, n_merfish_bits=4,
        config=ChromaticAffineEstimationConfig(min_pairs=20),
    )
    channel = ds.calibration["channels"]["wavelength_0.670000"]
    assert channel["status"] == "affine_estimated"
    # exactly the 200 good rows pair across wavelengths; the NaN-center row
    # still has a valid yellow centroid but no red partner
    assert channel["diagnostics"]["paired_transcripts"] == 200
    np.testing.assert_allclose(
        np.asarray(channel["affine_zyx_um"]), true_affine, atol=0.006
    )
