"""qi2lab-viewer: experiment viewer entry point
(mirrors `cli/qi2lab_microscopes/viewer.py`).

Three front-ends over the same data layer (`viz/viewer.py`):

- default: the interactive matplotlib shell (`viz/interactive.py`),
- ``--export-png``: a static overview figure,
- ``--export-html`` (optionally ``--serve``): the self-contained
  browser GUI (`viz/web.py`) — the no-Qt/no-napari equivalent of the
  reference's ndv viewer, usable over SSH by copying one file.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-viewer")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--export-png", type=Path, default=None,
                   help="write a static overview instead of launching the GUI")
    p.add_argument("--export-html", type=Path, default=None,
                   help="write the self-contained interactive HTML viewer")
    p.add_argument("--serve", action="store_true",
                   help="host the browser GUI on localhost (exports to a "
                        "temporary file when --export-html is not given)")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max-edge", type=int, default=1024,
                   help="HTML export: downsample planes beyond this edge")
    p.add_argument("--tiles", nargs="*", default=None,
                   help="HTML export: restrict to these tile ids")
    args = p.parse_args(argv)

    if args.export_html is not None or args.serve:
        import tempfile

        from ...viz.viewer import normalize_datastore_path, open_datastore
        from ...viz.web import export_html, serve

        out = args.export_html
        if out is None:  # --serve alone: host from a temporary export
            out = Path(tempfile.mkdtemp(prefix="merfish3d_viewer_")) / "viewer.html"
        ds = open_datastore(normalize_datastore_path(args.datastore_path))
        path = export_html(ds, out, tiles=args.tiles, max_edge=args.max_edge)
        print(f"wrote {path}")
        if args.serve:
            serve(path, port=args.port)
        return

    from ...viz.viewer import run_viewer

    run_viewer(args.datastore_path, output_png=args.export_png)


if __name__ == "__main__":
    main()
