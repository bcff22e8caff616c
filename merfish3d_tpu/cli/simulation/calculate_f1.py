"""F1 scoring of decoded spots against ground truth.

Greedy closest-first one-to-one same-gene matching within a radius via
per-gene KD-trees (reference
`cli/statphysbio_simulation/calculate_F1.py:19-185`).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd
from scipy.spatial import cKDTree


def match_spots_f1(
    decoded: pd.DataFrame,
    ground_truth: pd.DataFrame,
    *,
    radius_um: float = 1.0,
    coords=("global_z", "global_y", "global_x"),
) -> dict:
    """Greedy one-to-one same-gene matching; returns precision/recall/F1."""
    from ...native import greedy_match

    tp = 0
    n_decoded = len(decoded)
    n_gt = len(ground_truth)
    genes = sorted(set(ground_truth["gene_id"].astype(str)))
    for gene in genes:
        d = decoded[decoded["gene_id"].astype(str) == gene]
        g = ground_truth[ground_truth["gene_id"].astype(str) == gene]
        if d.empty or g.empty:
            continue
        d_pts = d[list(coords)].to_numpy(dtype=float)
        g_pts = g[list(coords)].to_numpy(dtype=float)
        tree = cKDTree(g_pts)
        k = min(4, len(g_pts))
        dists, idxs = tree.query(d_pts, k=k)
        dists = np.asarray(dists).reshape(len(d_pts), k)
        idxs = np.asarray(idxs).reshape(len(d_pts), k)
        src = np.repeat(np.arange(len(d_pts)), k)
        dst = idxs.reshape(-1)
        dd = dists.reshape(-1)
        ok = np.isfinite(dd) & (dd <= radius_um)
        accepted = greedy_match(
            src[ok], dst[ok], dd[ok], len(d_pts), len(g_pts)
        )
        tp += len(accepted)
    fp = n_decoded - tp
    fn = n_gt - tp
    precision = tp / n_decoded if n_decoded else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {
        "true_positives": tp,
        "false_positives": fp,
        "false_negatives": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_decoded": n_decoded,
        "n_ground_truth": n_gt,
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="sim-f1score", description="F1 score decoded spots vs ground truth"
    )
    parser.add_argument("--decoded", required=True, type=Path)
    parser.add_argument("--ground-truth", required=True, type=Path)
    parser.add_argument("--radius-um", type=float, default=1.0)
    parser.add_argument("--output", type=Path, default=None)
    args = parser.parse_args(argv)
    decoded = (
        pd.read_parquet(args.decoded)
        if args.decoded.suffix == ".parquet"
        else pd.read_csv(args.decoded)
    )
    gt = pd.read_csv(args.ground_truth)
    result = match_spots_f1(decoded, gt, radius_um=args.radius_um)
    print(json.dumps(result, indent=2))
    if args.output:
        args.output.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
