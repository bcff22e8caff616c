"""sim-sweep: decode-parameter sweep with F1 scoring per cell
(mirrors `cli/statphysbio_simulation/sweep_f1.py`): grid over
feature-predictor thresholds / magnitude thresholds / minimum pixels,
decode-only per point, writes a results table."""

from __future__ import annotations

import argparse
import itertools
import json
from pathlib import Path

import pandas as pd


def sweep(
    datastore_path: Path,
    ground_truth_csv: Path,
    *,
    magnitude_lows=(0.7, 0.9, 1.1),
    minimum_pixels_grid=(16, 28, 40),
    radius_um: float = 1.0,
    output_csv: Path | None = None,
) -> pd.DataFrame:
    from ...datastore import qi2labDataStore
    from ...pipeline.decoder import PixelDecoder
    from .calculate_f1 import match_spots_f1

    gt = pd.read_csv(ground_truth_csv)
    rows = []
    for mag_lo, min_px in itertools.product(magnitude_lows, minimum_pixels_grid):
        ds = qi2labDataStore(datastore_path, validate=False)
        decoder = PixelDecoder(
            ds,
            magnitude_threshold=(mag_lo, 10.0),
            minimum_pixels=min_px,
            verbose=0,
        )
        decoder.optimize_normalization_by_decoding(n_random_tiles=5, n_iterations=2)
        df = decoder.decode_all_tiles(filter_method="blank_fraction")
        score = match_spots_f1(df, gt, radius_um=radius_um)
        rows.append(
            {
                "magnitude_low": mag_lo,
                "minimum_pixels": min_px,
                **{k: score[k] for k in ("f1", "precision", "recall",
                                         "true_positives", "n_decoded")},
            }
        )
        print(json.dumps(rows[-1]))
    result = pd.DataFrame(rows)
    if output_csv is not None:
        result.to_csv(output_csv, index=False)
    return result


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sim-sweep")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--ground-truth", required=True, type=Path)
    p.add_argument("--magnitude-lows", type=float, nargs="+", default=(0.7, 0.9, 1.1))
    p.add_argument("--minimum-pixels-grid", type=int, nargs="+", default=(16, 28, 40))
    p.add_argument("--radius-um", type=float, default=1.0)
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)
    sweep(
        args.datastore_path,
        args.ground_truth,
        magnitude_lows=tuple(args.magnitude_lows),
        minimum_pixels_grid=tuple(args.minimum_pixels_grid),
        radius_um=args.radius_um,
        output_csv=args.output,
    )


if __name__ == "__main__":
    main()
