"""qi2lab-chromatic-calibration: bead-based chromatic calibration
(mirrors `cli/qi2lab_microscopes/chromatic_calibration.py`)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-chromatic-calibration")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument(
        "--bead-stacks", required=True, type=Path, nargs="+",
        help="one bead stack (.npy/.tif) per channel",
    )
    p.add_argument(
        "--wavelengths-um", required=True, type=float, nargs="+",
        help="emission wavelength per stack",
    )
    p.add_argument("--deconvolve", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--detection-threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    if len(args.bead_stacks) != len(args.wavelengths_um):
        raise SystemExit("--bead-stacks and --wavelengths-um must align")

    from ...datastore import qi2labDataStore
    from ...utils.chromatic_calibration import run_chromatic_calibration
    from ...utils.dataio import load_stack

    ds = qi2labDataStore(args.datastore_path, validate=False)
    volumes = [load_stack(s) for s in args.bead_stacks]
    calibration = run_chromatic_calibration(
        ds, volumes, args.wavelengths_um,
        deconvolve=args.deconvolve,
        detection_threshold=args.detection_threshold,
    )
    print(json.dumps({k: v.get("status") for k, v in calibration["channels"].items()}, indent=2))


if __name__ == "__main__":
    main()
