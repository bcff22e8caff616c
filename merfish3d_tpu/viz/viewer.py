"""Read-only experiment viewer: data layer + optional GUI.

Reimplements the reference viewer's data-preparation layer
(`viewer.py:27-1275`): feature-gated component summary, channel stacks with
micron coordinates, decoded-spot rasterization, cell-outline rasterization,
and global↔tile coordinate mapping through the stored affines. The GUI
(ndv/PyQt in the reference) is import-gated; a matplotlib static export
(`export_overview`) provides hermetic visualization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd


def component_summary(datastore) -> dict:
    """What exists in the datastore (reference `component_summary:147`)."""
    state = datastore.datastore_state
    fused = datastore.load_global_fiducial_image()
    decoded = datastore.load_global_filtered_decoded_spots()
    return {
        "state": state,
        "num_tiles": datastore.num_tiles,
        "num_rounds": datastore.num_rounds,
        "num_bits": datastore.num_bits,
        "decoded_available": decoded is not None and len(decoded) > 0,
        "global_fused_available": fused is not None,
        "segmentation_available": datastore.load_global_cellpose_outlines() is not None,
    }


def stack_with_micron_coords(datastore, tile, *, round=None, bit=None):
    """Channel stack plus micron coordinate vectors (reference
    `stack_with_micron_coords:27-75`); returns (array, coords dict)."""
    img = datastore.load_local_registered_image(tile=tile, round=round, bit=bit)
    if img is None:
        img = datastore.load_local_corrected_image(tile=tile, round=round, bit=bit)
    img = np.asarray(img)
    spacing = np.asarray(datastore.voxel_size_zyx_um, dtype=np.float64)
    coords = {
        ax: np.arange(img.shape[i]) * spacing[i] for i, ax in enumerate("zyx")
    }
    return img, coords


def _paint_point(volume: np.ndarray, zyx, radius: int = 1, value: float = 1.0):
    """(reference `_paint_point:549`)."""
    z, y, x = (int(round(v)) for v in zyx)
    nz, ny, nx = volume.shape
    zl, zh = max(0, z - radius), min(nz, z + radius + 1)
    yl, yh = max(0, y - radius), min(ny, y + radius + 1)
    xl, xh = max(0, x - radius), min(nx, x + radius + 1)
    if zl < zh and yl < yh and xl < xh:
        volume[zl:zh, yl:yh, xl:xh] = value


def rasterize_decoded_spots(
    decoded: pd.DataFrame,
    shape_zyx,
    *,
    origin_zyx_um,
    spacing_zyx_um,
    radius: int = 1,
    gene_ids: Optional[list[str]] = None,
) -> np.ndarray:
    """Paint decoded spots into an overlay volume
    (reference `rasterize_decoded_spots:579`)."""
    overlay = np.zeros(tuple(int(v) for v in shape_zyx), np.float32)
    origin = np.asarray(origin_zyx_um, np.float64)
    spacing = np.asarray(spacing_zyx_um, np.float64)
    df = decoded
    if gene_ids is not None:
        df = df[df["gene_id"].isin(gene_ids)]
    pts = df[["global_z", "global_y", "global_x"]].to_numpy(dtype=float)
    for p in pts:
        _paint_point(overlay, (p - origin) / spacing, radius=radius)
    return overlay


def _draw_line_2d(canvas: np.ndarray, p0, p1, value: float = 1.0):
    """Bresenham-style line rasterization (reference `_draw_line_2d:784`)."""
    y0, x0 = (int(round(v)) for v in p0)
    y1, x1 = (int(round(v)) for v in p1)
    n = max(abs(y1 - y0), abs(x1 - x0), 1)
    ys = np.linspace(y0, y1, n + 1).round().astype(int)
    xs = np.linspace(x0, x1, n + 1).round().astype(int)
    ok = (ys >= 0) & (ys < canvas.shape[0]) & (xs >= 0) & (xs < canvas.shape[1])
    canvas[ys[ok], xs[ok]] = value
    return canvas


def rasterize_cell_outlines(
    outlines: dict, shape_yx, *, origin_yx_um, spacing_yx_um
) -> np.ndarray:
    """(reference `rasterize_cell_outlines:857`)."""
    canvas = np.zeros(tuple(int(v) for v in shape_yx), np.float32)
    origin = np.asarray(origin_yx_um, np.float64)
    spacing = np.asarray(spacing_yx_um, np.float64)
    for cell in outlines.get("cells", []):
        poly = (np.asarray(cell["polygon_global_yx"], float) - origin) / spacing
        for i in range(len(poly) - 1):
            _draw_line_2d(canvas, poly[i], poly[i + 1])
    return canvas


def global_xy_to_tile_yx(datastore, tile, global_yx_um) -> np.ndarray:
    """Global µm → tile pixel coordinates through the stored affines
    (reference `_global_xy_to_tile_yx:821`)."""
    xf = datastore.load_global_coord_xforms_um(tile)
    spacing = np.asarray(datastore.voxel_size_zyx_um, np.float64)
    if xf is None:
        origin = np.zeros(3)
        affine = np.eye(4)
    else:
        affine, origin, spacing = xf
    inv = np.linalg.inv(affine)
    g = np.asarray([0.0, global_yx_um[0], global_yx_um[1], 1.0])
    local = (inv @ g)[:3] - origin
    return local[1:] / spacing[1:]


def export_overview(datastore, output_png: Path) -> Path:
    """Static overview: fused max projection + decoded spots + outlines."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fused = datastore.load_global_fiducial_image()
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    if fused is not None:
        img, (affine, origin, spacing) = fused
        proj = np.max(np.asarray(img, np.float32), axis=0)
        axes[0].imshow(proj, cmap="gray")
        axes[0].set_title("fused fiducial (max Z)")
        decoded = datastore.load_global_filtered_decoded_spots()
        if decoded is not None and len(decoded):
            ys = (decoded["global_y"].to_numpy() - origin[1]) / spacing[1]
            xs = (decoded["global_x"].to_numpy() - origin[2]) / spacing[2]
            axes[1].scatter(xs, ys, s=2, c="tab:red", alpha=0.6)
        axes[1].set_xlim(axes[0].get_xlim())
        axes[1].set_ylim(axes[0].get_ylim())
        axes[1].set_aspect("equal")
        axes[1].set_title("decoded spots")
        outlines = datastore.load_global_cellpose_outlines()
        if outlines:
            for cell in outlines.get("cells", []):
                poly = (np.asarray(cell["polygon_global_yx"]) - origin[1:]) / spacing[1:]
                axes[1].plot(poly[:, 1], poly[:, 0], lw=0.5, c="tab:blue")
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)
    return Path(output_png)


class Qi2labViewer:
    """GUI wrapper (reference `Qi2labViewer:1250-1275`). Requires ndv/PyQt
    which are not present in this environment; construction raises a clear
    error directing to :func:`export_overview`."""

    def __init__(self, datastore):
        try:
            import ndv  # noqa: F401
            from qtpy import QtWidgets  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "interactive viewer requires ndv + PyQt; use "
                "merfish3d_tpu.viz.viewer.export_overview for static output"
            ) from exc
        self._datastore = datastore


def run_viewer(datastore_path, output_png=None):
    from ..datastore import qi2labDataStore

    ds = qi2labDataStore(datastore_path, validate=False)
    summary = component_summary(ds)
    print(summary)
    if output_png is not None:
        export_overview(ds, output_png)
    else:
        Qi2labViewer(ds)
