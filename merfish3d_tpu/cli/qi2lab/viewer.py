"""qi2lab-viewer: experiment viewer entry point
(mirrors `cli/qi2lab_microscopes/viewer.py`)."""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-viewer")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--export-png", type=Path, default=None,
                   help="write a static overview instead of launching the GUI")
    args = p.parse_args(argv)

    from ...viz.viewer import run_viewer

    run_viewer(args.datastore_path, output_png=args.export_png)


if __name__ == "__main__":
    main()
