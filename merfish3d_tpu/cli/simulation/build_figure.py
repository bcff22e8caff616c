"""sim-buildfigure: summary figures for the simulation harness
(mirrors `cli/statphysbio_simulation/build_figure.py:179-438`).

Two figure kinds:

- ``--sweep-csv``: F1-vs-threshold curves from a `sim-sweep` table.
- ``--case-dirs``: the reference's multi-spacing comparison figure — one
  column per axial spacing showing the max-projected readout data with
  ground-truth spots (circles) vs decoded spots (crosses) overlaid and
  the per-case F1 in the title (reference composes raw image panels +
  GT/decoded point overlays + F1 across the 0.315/1.0/1.5 µm cases).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def build_figure(sweep_csv: Path, output_png: Path) -> None:
    """F1 sweep curves (one line per minimum-pixels setting)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(sweep_csv)
    fig, ax = plt.subplots(figsize=(6, 4))
    for min_px, grp in df.groupby("min_pixels" if "min_pixels" in df else "minimum_pixels"):
        col = "mag_lower_thresh" if "mag_lower_thresh" in grp else "magnitude_low"
        ax.plot(grp[col], grp["f1"], marker="o", label=f"min px {min_px}")
    ax.set_xlabel("magnitude threshold (low)")
    ax.set_ylabel("F1")
    ax.set_ylim(0, 1.02)
    ax.legend(frameon=False)
    ax.set_title("decode F1 vs thresholds")
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)


def _case_panel_data(case_dir: Path):
    """(max projection, GT spots, decoded spots, F1 dict) for one case
    workspace laid out as raw/ + qi2labdatastore/."""
    from .calculate_f1 import match_spots_f1

    raw = case_dir / "raw"
    ds_dir = case_dir / "qi2labdatastore"
    gt = pd.read_csv(raw / "GT_spots.csv")
    decoded_path = (
        ds_dir / "all_tiles_filtered_decoded_features" / "decoded_features.parquet"
    )
    decoded = pd.read_parquet(decoded_path) if decoded_path.exists() else None

    # max projection of the first bit stack for context
    proj = None
    bit_npy = sorted((raw / "tile0000").glob("bit*.npy"))
    if bit_npy:
        proj = np.max(np.load(bit_npy[0]), axis=0)

    score = None
    if decoded is not None and len(decoded):
        meta = raw / "metadata.json"
        radius = 1.0
        if meta.exists():
            import json

            vs = json.loads(meta.read_text()).get("voxel_size_zyx_um", [0.315])
            radius = 1.5 if float(vs[0]) >= 1.5 else 1.0
        score = match_spots_f1(decoded, gt, radius_um=radius)
    return proj, gt, decoded, score


def build_matrix_figure(
    case_dirs: list[Path], output_png: Path, labels: list[str] | None = None
) -> None:
    """Side-by-side panels per case: data + GT vs decoded overlay + F1."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(case_dirs)
    labels = labels or [Path(d).name for d in case_dirs]
    fig, axes = plt.subplots(1, n, figsize=(4.5 * n, 4.5), squeeze=False)
    for ax, case_dir, label in zip(axes[0], case_dirs, labels):
        proj, gt, decoded, score = _case_panel_data(Path(case_dir))
        if proj is not None:
            lo, hi = np.percentile(proj, (1, 99.8))
            ax.imshow(proj, cmap="gray", vmin=lo, vmax=hi)
        ax.scatter(
            gt["x"], gt["y"], s=40, facecolors="none", edgecolors="tab:cyan",
            linewidths=0.8, label="ground truth",
        )
        if decoded is not None and len(decoded):
            ax.scatter(
                decoded["tile_x"], decoded["tile_y"], s=14, marker="x",
                c="tab:red", linewidths=0.8, label="decoded",
            )
        title = label
        if score is not None:
            title += f"  F1={score['f1']:.3f}"
        ax.set_title(title)
        ax.set_axis_off()
    axes[0][0].legend(frameon=False, loc="lower left", fontsize=8)
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sim-buildfigure")
    p.add_argument("--sweep-csv", type=Path, default=None)
    p.add_argument(
        "--case-dirs", type=Path, nargs="+", default=None,
        help="case workspaces (raw/ + qi2labdatastore/), one panel each",
    )
    p.add_argument("--labels", type=str, nargs="+", default=None)
    p.add_argument("--output", required=True, type=Path)
    args = p.parse_args(argv)
    if args.sweep_csv is not None:
        build_figure(args.sweep_csv, args.output)
    elif args.case_dirs:
        build_matrix_figure(args.case_dirs, args.output, labels=args.labels)
    else:
        raise SystemExit("provide --sweep-csv or --case-dirs")


if __name__ == "__main__":
    main()
