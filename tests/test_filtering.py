"""Unit tests for transcript filtering, dedup, and cell assignment."""

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.pipeline.filtering import (
    assign_cells,
    filter_blank_fraction,
    filter_lr,
    remove_duplicates_in_tile_overlap,
    remove_duplicates_within_tile,
)


def _synthetic_barcodes(n_coding=1000, n_blank=100, seed=0):
    """Coding transcripts are bright/compact/low-distance; blanks are dim
    noise-like — separable in the (magnitude, area, distance) space."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_coding):
        rows.append(
            {
                "gene_id": f"gene{i % 20:03d}",
                "magnitude_mean": rng.normal(3.0, 0.5),
                "area": rng.integers(15, 60),
                "distance_min": rng.uniform(0.05, 0.3),
                "signal_mean": rng.normal(0.8, 0.1),
                "s-b_mean": rng.normal(0.7, 0.1),
                "inertia_tensor_eigvals-0": rng.uniform(1, 4),
                "inertia_tensor_eigvals-1": rng.uniform(0.5, 2),
                "inertia_tensor_eigvals-2": rng.uniform(0.2, 1),
                "tile_idx": 0,
                "global_z": rng.uniform(0, 10),
                "global_y": rng.uniform(0, 200),
                "global_x": rng.uniform(0, 200),
            }
        )
    for i in range(n_blank):
        rows.append(
            {
                "gene_id": f"blank{i % 4:02d}",
                "magnitude_mean": rng.normal(1.2, 0.4),
                "area": rng.integers(4, 20),
                "distance_min": rng.uniform(0.3, 0.52),
                "signal_mean": rng.normal(0.3, 0.1),
                "s-b_mean": rng.normal(0.15, 0.1),
                "inertia_tensor_eigvals-0": rng.uniform(1, 4),
                "inertia_tensor_eigvals-1": rng.uniform(0.5, 2),
                "inertia_tensor_eigvals-2": rng.uniform(0.2, 1),
                "tile_idx": 0,
                "global_z": rng.uniform(0, 10),
                "global_y": rng.uniform(0, 200),
                "global_x": rng.uniform(0, 200),
            }
        )
    return pd.DataFrame(rows)


def test_blank_fraction_filter_hits_target():
    df = _synthetic_barcodes()
    diag = {}
    out = filter_blank_fraction(
        df, n_blank_codewords=4, n_total_codewords=24,
        target_misid_rate=0.05, diagnostics_out=diag,
    )
    assert diag["target_reached"]
    assert diag["achieved_gross_misid_rate"] <= 0.05
    # most coding transcripts survive, most blanks die
    coding_kept = (~out["gene_id"].str.startswith("blank")).sum()
    blank_kept = out["gene_id"].str.startswith("blank").sum()
    assert coding_kept > 800
    assert blank_kept < 30
    assert (out["cell_id"] == -1).all()
    assert "blank_fraction" in out.columns


def test_blank_fraction_no_blanks_keeps_all():
    df = _synthetic_barcodes(n_coding=50, n_blank=0)
    out = filter_blank_fraction(
        df, n_blank_codewords=4, n_total_codewords=24, target_misid_rate=0.05
    )
    assert len(out) == 50


def test_lr_filter():
    df = _synthetic_barcodes()
    out = filter_lr(
        df, target_misid_rate=0.05, n_blank_codewords=4, n_total_codewords=24
    )
    assert "predicted_probability" in out.columns
    coding_kept = (~out["gene_id"].str.startswith("blank")).sum()
    blank_kept = out["gene_id"].str.startswith("blank").sum()
    assert coding_kept > 700
    assert blank_kept < coding_kept * 0.1


def test_remove_duplicates_within_tile():
    df = pd.DataFrame(
        {
            "gene_id": ["g1", "g1", "g1", "g2"],
            "tile_idx": [0, 0, 0, 0],
            "global_z": [1.0, 1.3, 5.0, 1.0],
            "global_y": [10.0, 10.02, 10.0, 10.0],
            "global_x": [10.0, 10.03, 10.0, 10.0],
            "distance_min": [0.2, 0.1, 0.3, 0.4],
        }
    )
    out = remove_duplicates_within_tile(df, radius_xy=0.1, radius_z=0.5)
    # rows 0,1 cluster (same gene, close XY, different z within window):
    # keep row 1 (lower distance). Row 2 far in z; row 3 different gene.
    assert len(out) == 3
    kept = out[(out["gene_id"] == "g1") & (out["global_z"] < 2)]
    assert len(kept) == 1
    assert kept.iloc[0]["distance_min"] == 0.1


def test_remove_duplicates_in_tile_overlap():
    df = pd.DataFrame(
        {
            "gene_id": ["g1", "g1", "g1"],
            "tile_idx": [0, 1, 1],
            "global_z": [1.0, 1.1, 8.0],
            "global_y": [10.0, 10.1, 10.0],
            "global_x": [10.0, 10.1, 10.0],
            "distance_min": [0.3, 0.1, 0.2],
        }
    )
    out = remove_duplicates_in_tile_overlap(df, radius_um=0.75)
    # rows 0 and 1 are cross-tile duplicates; row 1 has lower distance
    assert len(out) == 2
    assert 0.1 in out["distance_min"].values
    assert 0.3 not in out["distance_min"].values


def test_assign_cells():
    df = pd.DataFrame(
        {
            "gene_id": ["g1", "g2"],
            "global_y": [5.0, 50.0],
            "global_x": [5.0, 50.0],
        }
    )
    outlines = {
        "cells": [
            {"cell_id": 7, "polygon_global_yx": [[0, 0], [0, 10], [10, 10], [10, 0]]}
        ]
    }
    out = assign_cells(df, outlines)
    assert out["cell_id"].tolist() == [7, -1]


def test_blank_fraction_tolerates_non_finite_feature_rows():
    """A NaN/inf feature row must be excluded, not crash the whole stage
    (review r3: ravel_multi_index raised on the unclipped upper bin)."""
    df = _synthetic_barcodes(n_coding=200, n_blank=20)
    df.loc[7, "distance_min"] = np.nan
    df.loc[11, "magnitude_mean"] = np.inf
    out = filter_blank_fraction(
        df, n_blank_codewords=4, n_total_codewords=24, target_misid_rate=0.05
    )
    assert len(out) > 0
    # the poisoned rows never pass the filter
    assert 7 not in out.index or np.isfinite(out.loc[7, "distance_min"])


def test_lr_filter_all_blank_falls_back():
    """A table with <=1 coding transcript cannot train a 2-class LR —
    fall back to keep-everything like the blank-starved path
    (review r3: single-class y crashed LogisticRegression.fit)."""
    df = _synthetic_barcodes(n_coding=1, n_blank=50)
    out = filter_lr(df, target_misid_rate=0.05)
    assert len(out) == len(df)


def test_overlap_dedup_chain_keeps_non_duplicate():
    """a–b and b–c within radius, a–c not: c must survive (review r3:
    greedy pair order dropped c against the already-dead b)."""
    base = dict(
        gene_id="geneA", magnitude_mean=1.0, area=10,
        signal_mean=1.0, **{"s-b_mean": 1.0},
        **{f"inertia_tensor_eigvals-{i}": 1.0 for i in range(3)},
        global_z=0.0, global_y=0.0,
    )
    df = pd.DataFrame(
        [
            {**base, "tile_idx": 0, "global_x": 0.0, "distance_min": 0.1},   # a
            {**base, "tile_idx": 1, "global_x": 0.6, "distance_min": 0.2},   # b
            {**base, "tile_idx": 0, "global_x": 1.2, "distance_min": 0.3},   # c
        ]
    )
    out = remove_duplicates_in_tile_overlap(df, radius_um=0.75)
    # b dropped against a; c survives (its only in-radius neighbor died)
    assert len(out) == 2
    assert set(out["distance_min"]) == {0.1, 0.3}
