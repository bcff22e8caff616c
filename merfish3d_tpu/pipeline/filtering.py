"""Transcript filtering, duplicate removal, and cell assignment.

Host-side post-processing over decoded-feature tables (tiny vs imaging
data): the blank-fraction histogram filter
(reference `PixelDecoder._filter_all_barcodes_blank_fraction:2957-3418`),
the logistic-regression filter (`_filter_all_barcodes_LR:3480-3631`),
within-tile cross-plane dedup (`_remove_duplicates_within_tile:3755-3939`),
cross-tile overlap dedup (`_remove_duplicates_in_tile_overlap:3712-3753`),
and cell assignment (`_assign_cells:3650-3710`, reimplemented with
matplotlib.path point-in-polygon instead of shapely/rtree).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from scipy.spatial import cKDTree


def _is_blank(df: pd.DataFrame) -> np.ndarray:
    return (
        df["gene_id"].astype("string").str.lower().str.startswith("blank")
        .fillna(False)
        .to_numpy(dtype=bool)
    )


def _quantile_edges(values: np.ndarray, n: int = 11) -> np.ndarray:
    edges = np.unique(np.quantile(values, np.linspace(0.0, 1.0, n)))
    edges = edges[np.isfinite(edges)]
    if edges.size < 2 or np.allclose(edges[0], edges[-1]):
        center = float(np.mean(values)) if edges.size else 0.0
        edges = np.array([center - 0.5, center + 0.5])
    edges[0] = min(edges[0], float(np.min(values)))
    edges[-1] = max(edges[-1], float(np.max(values)))
    edges[-1] = np.nextafter(edges[-1], np.inf)
    return edges


def _voxel_count_edges(values: np.ndarray) -> np.ndarray:
    """Integer-aware edges for area (reference `:3120-3170`)."""
    min_v = int(np.floor(np.min(values)))
    max_v = int(np.ceil(np.max(values)))
    if max_v - min_v + 1 <= 10:
        edges = np.arange(min_v - 0.5, max_v + 1.5, 1.0)
    else:
        quantiles = np.quantile(values, np.linspace(0.0, 1.0, 11))
        qe = np.unique(np.floor(quantiles).astype(float))
        if qe.size == 0:
            qe = np.array([float(min_v), float(max_v + 1)])
        if qe[0] > min_v:
            qe = np.insert(qe, 0, float(min_v))
        if qe[-1] <= max_v:
            qe = np.append(qe, float(max_v + 1))
        edges = qe - 0.5
    edges = np.unique(edges[np.isfinite(edges)])
    if edges.size < 2 or np.allclose(edges[0], edges[-1]):
        center = float(np.mean(values))
        edges = np.array([center - 0.5, center + 0.5])
    edges[0] = min(edges[0], float(np.min(values)))
    edges[-1] = max(edges[-1], float(np.max(values)))
    edges[-1] = np.nextafter(edges[-1], np.inf)
    return edges


def _distance_edges(values: np.ndarray) -> np.ndarray:
    edges = np.unique(np.linspace(float(np.min(values)), float(np.max(values)), 11))
    edges = edges[np.isfinite(edges)]
    if edges.size < 2 or np.allclose(edges[0], edges[-1]):
        center = float(np.mean(values))
        edges = np.array([center - 0.5, center + 0.5])
    edges[0] = min(edges[0], float(np.min(values)))
    edges[-1] = max(edges[-1], float(np.max(values)))
    edges[-1] = np.nextafter(edges[-1], np.inf)
    return edges


def filter_blank_fraction(
    df: pd.DataFrame,
    *,
    n_blank_codewords: int,
    n_total_codewords: int,
    target_misid_rate: float = 0.05,
    diagnostics_out: Optional[dict] = None,
) -> pd.DataFrame:
    """3D blank-fraction histogram filter over
    (magnitude_mean, area, distance_min): quantile-derived bin edges,
    per-bin blank fraction, threshold sweep to hit the target gross
    misidentification rate ``(blank_kept/blank_codewords)/
    (total_kept/total_codewords)``, else best-effort
    (reference `_filter_all_barcodes_blank_fraction:2957-3418`)."""
    diagnostics = {
        "target_gross_misid_rate": float(target_misid_rate),
        "chosen_threshold": np.nan,
        "achieved_gross_misid_rate": np.inf,
        "target_reached": False,
    }
    out = df.copy()
    out["blank_fraction_bin"] = -1
    out["blank_fraction"] = np.nan
    out["blank_fraction_keep"] = False
    if out.empty:
        diagnostics["reason"] = "no_transcripts"
    else:
        feats = out[["magnitude_mean", "area", "distance_min"]].to_numpy(dtype=float)
        valid = np.all(np.isfinite(feats), axis=1)
        is_blank = _is_blank(out)
        if not valid.any():
            diagnostics["reason"] = "no_valid_features"
        elif n_blank_codewords <= 0:
            out.loc[valid, "blank_fraction_keep"] = True
            diagnostics["reason"] = "no_blank_barcodes"
        elif not is_blank[valid].any():
            out.loc[valid, "blank_fraction_keep"] = True
            diagnostics["reason"] = "no_blank_transcripts"
        else:
            v = feats[valid]
            i_edges = _quantile_edges(v[:, 0])
            n_edges = _voxel_count_edges(v[:, 1])
            d_edges = _distance_edges(v[:, 2])
            bins = np.column_stack(
                [
                    np.searchsorted(i_edges, feats[:, 0], side="right") - 1,
                    np.searchsorted(n_edges, feats[:, 1], side="right") - 1,
                    np.searchsorted(d_edges, feats[:, 2], side="right") - 1,
                ]
            )
            shape = (len(i_edges) - 1, len(n_edges) - 1, len(d_edges) - 1)
            in_range = (
                valid
                & np.isfinite(feats).all(axis=1)
                & (bins >= 0).all(axis=1)
                & (bins[:, 0] < shape[0])
                & (bins[:, 1] < shape[1])
                & (bins[:, 2] < shape[2])
            )
            if not in_range.any():
                diagnostics["reason"] = "no_transcripts_in_histogram_range"
            else:
                idx = bins[in_range]
                all_hist = np.zeros(shape, np.int64)
                np.add.at(all_hist, tuple(idx.T), 1)
                blank_hist = np.zeros(shape, np.int64)
                bidx = bins[in_range & is_blank]
                if bidx.size:
                    np.add.at(blank_hist, tuple(bidx.T), 1)
                bf_hist = np.full(shape, np.nan, np.float64)
                nonempty = all_hist > 0
                bf_hist[nonempty] = blank_hist[nonempty] / all_hist[nonempty]
                flat = np.ravel_multi_index(tuple(idx.T), shape)
                bf = np.full(len(out), np.nan)
                bf[in_range] = bf_hist.ravel()[flat]
                # clip BOTH ends: a NaN/inf feature row (excluded by
                # in_range) otherwise lands at bin == shape and
                # ravel_multi_index raises on the whole column (review r3)
                bins_safe = np.minimum(
                    bins.clip(0), np.asarray(shape) - 1
                )
                out["blank_fraction_bin"] = np.where(
                    in_range, np.ravel_multi_index(tuple(bins_safe.T), shape), -1
                )
                out["blank_fraction"] = bf
                chosen, achieved, reached = np.nan, np.inf, False
                keep_mask = np.zeros(len(out), bool)
                sweep = []
                for thr in np.unique(bf_hist[nonempty]):
                    km = in_range & (bf <= float(thr))
                    if km.any():
                        blank_kept = int((km & is_blank).sum())
                        total_kept = int(km.sum())
                        rate = (blank_kept / n_blank_codewords) / (
                            total_kept / n_total_codewords
                        )
                    else:
                        rate = np.inf
                    sweep.append((float(thr), float(rate), int(km.sum())))
                    if rate <= target_misid_rate:
                        chosen, achieved, keep_mask, reached = (
                            float(thr),
                            float(rate),
                            km.copy(),
                            True,
                        )
                if not reached and sweep:
                    best = min(range(len(sweep)), key=lambda i: sweep[i][1])
                    chosen, achieved = sweep[best][0], sweep[best][1]
                    keep_mask = in_range & (bf <= chosen)
                out["blank_fraction_keep"] = keep_mask
                diagnostics.update(
                    {
                        "chosen_threshold": chosen,
                        "achieved_gross_misid_rate": achieved,
                        "target_reached": reached,
                        "threshold_sweep": pd.DataFrame(
                            sweep,
                            columns=[
                                "threshold",
                                "gross_misid_rate",
                                "kept_transcripts",
                            ],
                        ),
                    }
                )
    if diagnostics_out is not None:
        diagnostics_out.update(diagnostics)
    filtered = out[out["blank_fraction_keep"]].copy()
    filtered["cell_id"] = -1
    return filtered.reset_index(drop=True)


def _gross_misid_rate(
    keep: np.ndarray, is_blank: np.ndarray, n_blank: int, n_total: int
) -> float:
    if not keep.any() or n_blank <= 0 or n_total <= 0:
        return np.inf
    return (int((keep & is_blank).sum()) / n_blank) / (int(keep.sum()) / n_total)


def filter_lr(
    df: pd.DataFrame,
    *,
    target_misid_rate: float = 0.05,
    is_3D: bool = True,
    n_blank_codewords: Optional[int] = None,
    n_total_codewords: Optional[int] = None,
) -> pd.DataFrame:
    """Logistic-regression blank-vs-coding filter with FDR threshold scan
    (reference `_filter_all_barcodes_LR:3480-3631`)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    out = df.copy()
    is_blank = _is_blank(out)
    out["X"] = ~is_blank
    features = [
        "area",
        "signal_mean",
        "s-b_mean",
        "distance_min",
        "magnitude_mean",
        "inertia_tensor_eigvals-0",
        "inertia_tensor_eigvals-1",
    ]
    if is_3D:
        features.append("inertia_tensor_eigvals-2")
    n_blank = n_blank_codewords or max(int(is_blank.sum()), 1)
    n_total = n_total_codewords or len(out)
    df_true = out[out["X"]][["X"] + features]
    df_false = out[~out["X"]][["X"] + features]
    # the regression needs both classes populated enough to survive the
    # 10% test split — too few blanks OR too few coding rows both fall
    # back to keep-everything (review r3: an all-blank table crashed
    # LogisticRegression.fit with a single-class y)
    if len(df_false) <= 1 or len(df_true) <= 1:
        filtered = out.copy()
        filtered["cell_id"] = -1
        return filtered.drop(columns=["X"]).reset_index(drop=True)
    df_true_sampled = df_true.sample(n=min(len(df_false), len(df_true)), random_state=42)
    combined = pd.concat([df_true_sampled, df_false])
    x = combined.drop("X", axis=1)
    y = combined["X"]
    X_train, X_test, y_train, y_test = train_test_split(
        x, y, test_size=0.1, random_state=42
    )
    scaler = StandardScaler()
    X_train_scaled = scaler.fit_transform(X_train)
    logistic = LogisticRegression(solver="liblinear", random_state=42)
    logistic.fit(X_train_scaled, y_train)
    full_scaled = scaler.transform(out[features])
    out["predicted_probability"] = logistic.predict_proba(full_scaled)[:, 1]

    probs = out["predicted_probability"].to_numpy()
    chosen = 0.0
    for thr in np.arange(0.0, 1.0, 0.1):
        keep = probs >= thr
        if _gross_misid_rate(keep, is_blank, n_blank, n_total) <= target_misid_rate:
            chosen = thr
            break
    for thr in np.arange(max(chosen - 0.1, 0.0), min(chosen + 0.1, 1.0), 0.01):
        keep = probs >= thr
        if _gross_misid_rate(keep, is_blank, n_blank, n_total) <= target_misid_rate:
            chosen = thr
            break
    filtered = out[out["predicted_probability"] >= chosen].copy()
    filtered["cell_id"] = -1
    return filtered.drop(columns=["X"]).reset_index(drop=True)


def remove_duplicates_within_tile(
    df: pd.DataFrame, radius_xy: float = 0.1, radius_z: float = 0.50
) -> pd.DataFrame:
    """2D-mode cross-plane dedup: union-find clusters of same-tile,
    same-gene rows within XY radius and Z window; keep min distance_min
    (reference `_remove_duplicates_within_tile:3755-3939`)."""
    if df.empty:
        return df
    df = df.reset_index(drop=True)
    coords_xy = df[["global_y", "global_x"]].to_numpy(dtype=float)
    z = df["global_z"].to_numpy(dtype=float)
    tiles = df["tile_idx"].to_numpy()
    genes = df["gene_id"].to_numpy()
    dist = df["distance_min"].to_numpy(dtype=float)

    tree = cKDTree(coords_xy)
    raw_pairs = tree.query_pairs(radius_xy, output_type="ndarray")
    if len(raw_pairs):
        i = raw_pairs[:, 0]
        j = raw_pairs[:, 1]
        ok = (
            (tiles[i] == tiles[j])
            & (genes[i] == genes[j])
            & (z[i] != z[j])
            & (np.abs(z[i] - z[j]) <= radius_z)
        )
        pairs = raw_pairs[ok]
    else:
        pairs = np.empty((0, 2), np.int64)

    from ..native import union_find

    roots = union_find(pairs, len(df))
    # per-cluster winner: lowest (distance_min, index)
    order = np.lexsort((np.arange(len(df)), dist))
    seen = set()
    keep_rows = []
    for i in order:
        r = roots[i]
        if r in seen:
            continue
        seen.add(r)
        keep_rows.append(i)
    return df.iloc[sorted(keep_rows)].reset_index(drop=True)


def remove_duplicates_in_tile_overlap(
    df: pd.DataFrame, radius_um: float = 0.75
) -> pd.DataFrame:
    """Cross-tile dedup: cKDTree pairs within ``radius_um`` between different
    tiles; keep the row with lower (distance_min, index)
    (reference `_remove_duplicates_in_tile_overlap:3712-3753`)."""
    if df.empty:
        return df
    df = df.reset_index(drop=True)
    coords = df[["global_z", "global_y", "global_x"]].to_numpy(dtype=float)
    tiles = df["tile_idx"].to_numpy()
    dist = df["distance_min"].to_numpy(dtype=float)
    tree = cKDTree(coords)
    drop = set()
    # resolve pairs best-first so a row is only ever dropped against a
    # SURVIVING duplicate — greedy per-pair deletion in arbitrary order
    # could drop c against an already-dead b in an a–b–c chain even when
    # a–c are not duplicates (review r3)
    pairs = [
        (min((dist[i], i), (dist[j], j)), i, j)
        for i, j in tree.query_pairs(radius_um)
        if tiles[i] != tiles[j]
    ]
    for _, i, j in sorted(pairs):
        if i in drop or j in drop:
            continue
        if (dist[i], i) <= (dist[j], j):
            drop.add(j)
        else:
            drop.add(i)
    return df.drop(sorted(drop)).reset_index(drop=True)


def assign_cells(df: pd.DataFrame, outlines: dict) -> pd.DataFrame:
    """Assign transcripts to cells by point-in-polygon on (global_y,
    global_x) (reference `_assign_cells:3650-3710`; shapely/rtree →
    native ray-casting with a bounding-box prefilter)."""
    from ..native import points_in_polygon

    df = df.copy()
    df["cell_id"] = -1
    cells = outlines.get("cells", [])
    if not cells or df.empty:
        return df
    pts = df[["global_y", "global_x"]].to_numpy(dtype=float)
    for cell in cells:
        poly = np.asarray(cell["polygon_global_yx"], dtype=float)
        if len(poly) < 3:
            continue
        lo = poly.min(axis=0)
        hi = poly.max(axis=0)
        cand = np.where(
            (pts[:, 0] >= lo[0])
            & (pts[:, 0] <= hi[0])
            & (pts[:, 1] >= lo[1])
            & (pts[:, 1] <= hi[1])
        )[0]
        if cand.size == 0:
            continue
        inside = points_in_polygon(pts[cand], poly)
        df.loc[df.index[cand[inside]], "cell_id"] = int(cell["cell_id"])
    return df
