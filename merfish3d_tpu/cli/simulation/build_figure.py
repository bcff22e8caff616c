"""sim-buildfigure: F1 sweep summary figure
(mirrors `cli/statphysbio_simulation/build_figure.py`)."""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def build_figure(sweep_csv: Path, output_png: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(sweep_csv)
    fig, ax = plt.subplots(figsize=(6, 4))
    for min_px, grp in df.groupby("minimum_pixels"):
        ax.plot(
            grp["magnitude_low"], grp["f1"], marker="o",
            label=f"min px {min_px}",
        )
    ax.set_xlabel("magnitude threshold (low)")
    ax.set_ylabel("F1")
    ax.set_ylim(0, 1.02)
    ax.legend(frameon=False)
    ax.set_title("decode F1 vs thresholds")
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sim-buildfigure")
    p.add_argument("--sweep-csv", required=True, type=Path)
    p.add_argument("--output", required=True, type=Path)
    args = p.parse_args(argv)
    build_figure(args.sweep_csv, args.output)


if __name__ == "__main__":
    main()
