"""Read-only experiment viewer data layer.

Provides the same *capabilities* as the reference viewer's data layer
(`/root/reference/src/merfish3danalysis/viewer.py`): availability
predicates with on-disk fallbacks, per-tile channel stacks with micron
coordinates, decoded-spot and cell-outline overlays in tile pixel space
and fused global micron space, ImageJ ROI ingestion, and global↔tile
coordinate mapping — but is organized around this package's own
primitives:

- all µm→px projection goes through one vectorized helper pair
  (:func:`_global_xy_to_tile_yx` / plain origin-spacing scaling),
- point overlays rasterize every spot in one vectorized scatter
  (:func:`_stamp_boxes`) instead of a per-spot paint loop,
- outline overlays rasterize whole polygons in one vectorized polyline
  trace (:func:`_trace_closed_polyline`),
- the tile and global variants of each overlay share a single internal
  rasterizer, differing only in how coordinates are projected.

The interactive GUI lives in `viz/interactive.py` (matplotlib) and
`viz/web.py` (dependency-free HTML); both consume this module.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import numpy as np


# --------------------------------------------------------------------------
# datastore discovery + feature availability
# --------------------------------------------------------------------------


def normalize_datastore_path(path: Path) -> Path:
    """Accept either an experiment root (containing ``qi2labdatastore/``)
    or the datastore directory itself; return the datastore directory."""
    root = Path(path).expanduser().resolve()
    for candidate in (root, root / "qi2labdatastore"):
        if (candidate / "datastore_state.json").is_file():
            return candidate
    raise FileNotFoundError(
        "Could not find qi2lab datastore. Select an experiment root containing "
        "'qi2labdatastore' or select the datastore directory directly."
    )


def open_datastore(datastore_path: Path):
    """Open a datastore for display without the full validation pass."""
    from ..datastore import qi2labDataStore

    return qi2labDataStore(datastore_path, validate=False)


_STAGE_FLAGS = (
    "Calibrations",
    "Corrected",
    "LocalRegistered",
    "GlobalRegistered",
    "Fused",
    "SegmentedCells",
    "DecodedSpots",
    "FilteredSpots",
)


def component_summary(datastore) -> dict[str, bool]:
    """Pipeline-stage flags from ``datastore_state.json`` as booleans."""
    state = datastore.datastore_state or {}
    return {flag: bool(state.get(flag, False)) for flag in _STAGE_FLAGS}


def _datastore_path(datastore) -> Optional[Path]:
    path = getattr(datastore, "_datastore_path", None)
    return Path(path) if path is not None else None


def _probe(datastore, *relative: str) -> Optional[Path]:
    """Path under the datastore root if the store has a local path."""
    root = _datastore_path(datastore)
    return root.joinpath(*relative) if root is not None else None


_FILTERED_SPOTS_REL = ("all_tiles_filtered_decoded_features",
                       "decoded_features.parquet")


def decoded_available(datastore) -> bool:
    """Decoded spots exist: state flags, else probe the decoded outputs on
    disk (the flags can be stale when a store is inspected mid-pipeline)."""
    flags = component_summary(datastore)
    if flags["DecodedSpots"] or flags["FilteredSpots"]:
        return True
    filtered = _probe(datastore, *_FILTERED_SPOTS_REL)
    if filtered is not None and filtered.exists():
        return True
    per_tile = _probe(datastore, "decoded")
    if per_tile is None or not per_tile.is_dir():
        return False
    return next(per_tile.glob("tile*_decoded_features.parquet"), None) is not None


def cell_outlines_available(datastore) -> bool:
    """Cell outlines exist: state flag, exported ROI zip, or outline JSON."""
    if component_summary(datastore)["SegmentedCells"]:
        return True
    roi_zip = _probe(datastore, "segmentation", "cellpose", "imagej_rois",
                     "global_coords_rois.zip")
    if roi_zip is not None and roi_zip.exists():
        return True
    return datastore.load_global_cellpose_outlines() is not None


def global_fused_available(datastore) -> bool:
    """A fused global fiducial image exists."""
    if component_summary(datastore)["Fused"]:
        return True
    meta = _probe(datastore, "fused", "fused.zarr",
                  "fused_fiducial_zyx.ome.zarr", "zarr.json")
    return meta is not None and meta.exists()


def global_cellpose_segmentation_available(datastore) -> bool:
    """A global segmentation label image exists."""
    if component_summary(datastore)["SegmentedCells"]:
        return True
    return datastore.load_global_cellpose_segmentation_image() is not None


def codebook_gene_bits(datastore) -> dict[str, list[str]]:
    """Per-gene list of datastore bit ids carrying that gene's on bits."""
    parsed = datastore.load_codebook_parsed()
    if parsed is None:
        return {}
    gene_ids, matrix = parsed
    bit_ids = list(datastore.bit_ids or [])
    on = np.asarray(matrix, dtype=bool)[:, : len(bit_ids)]
    return {
        str(gene): [bit_ids[i] for i in np.flatnonzero(row)]
        for gene, row in zip(gene_ids, on)
    }


# --------------------------------------------------------------------------
# coordinate projection (global µm ↔ tile px)
# --------------------------------------------------------------------------


def _global_xy_to_tile_yx(
    global_xy: np.ndarray,
    affine_zyx_um: np.ndarray,
    origin_zyx_um: np.ndarray,
    spacing_zyx_um: np.ndarray,
) -> np.ndarray:
    """Project global ``[x, y]`` µm vertices into one tile's ``[y, x]``
    pixel frame by undoing that tile's stored global affine, then removing
    the tile origin and voxel spacing. Vectorized over vertices; the z
    coordinate rides along as 0 and is discarded."""
    inv = np.linalg.inv(np.asarray(affine_zyx_um, dtype=float))
    xy = np.asarray(global_xy, dtype=float)
    homo = np.stack(
        [np.zeros(len(xy)), xy[:, 1], xy[:, 0], np.ones(len(xy))], axis=1
    )
    physical = (inv @ homo.T).T[:, :3]
    pixels = (physical - np.asarray(origin_zyx_um, float)) / np.asarray(
        spacing_zyx_um, float
    )
    return pixels[:, 1:]


def global_xy_to_tile_yx(datastore, tile, global_yx_um) -> np.ndarray:
    """Convenience: one global ``[y, x]`` µm point → tile ``[y, x]`` px."""
    xf = datastore.load_global_coord_xforms_um(tile)
    if xf is None:
        affine, origin = np.eye(4), np.zeros(3)
        spacing = np.asarray(datastore.voxel_size_zyx_um, np.float64)
    else:
        affine, origin, spacing = xf
    return _global_xy_to_tile_yx(
        np.asarray([[global_yx_um[1], global_yx_um[0]]], dtype=float),
        affine, origin, spacing,
    )[0]


def _canvas_yx_from_um(points_yx_um, origin_zyx_um, spacing_zyx_um) -> np.ndarray:
    """Global ``[y, x]`` µm points → fused-canvas ``[y, x]`` px."""
    origin = np.asarray(origin_zyx_um, dtype=float)[1:]
    spacing = np.asarray(spacing_zyx_um, dtype=float)[1:]
    return (np.asarray(points_yx_um, dtype=float) - origin) / spacing


# --------------------------------------------------------------------------
# rasterization primitives (vectorized)
# --------------------------------------------------------------------------


def _stamp_boxes(volume: np.ndarray, centers_zyx: np.ndarray, radius: int) -> None:
    """Set a ``(2r+1)³`` box of ones around every center, all in one
    scatter. Out-of-bounds box voxels are dropped individually, so boxes
    straddling the volume edge paint their in-bounds part."""
    centers = np.rint(np.asarray(centers_zyx, dtype=float)).astype(np.int64)
    if centers.size == 0:
        return
    r = int(radius)
    span = np.arange(-r, r + 1, dtype=np.int64)
    cube = np.stack(np.meshgrid(span, span, span, indexing="ij"), axis=-1)
    voxels = (centers[:, None, :] + cube.reshape(1, -1, 3)).reshape(-1, 3)
    inside = np.all(
        (voxels >= 0) & (voxels < np.asarray(volume.shape)), axis=1
    )
    voxels = voxels[inside]
    volume[voxels[:, 0], voxels[:, 1], voxels[:, 2]] = 1.0


def _trace_closed_polyline(canvas: np.ndarray, vertices_yx: np.ndarray) -> None:
    """Rasterize a closed polygon boundary onto a 2D canvas.

    All segments are sampled in one vectorized pass: each segment gets
    ``max(|Δy|, |Δx|) + 1`` evenly spaced samples between its rounded
    endpoints; samples landing off-canvas are dropped per pixel, so edges
    crossing the canvas still leave their in-bounds trace."""
    verts = np.rint(np.asarray(vertices_yx, dtype=float)).astype(np.int64)
    if len(verts) < 2:
        return
    starts = verts
    ends = np.roll(verts, -1, axis=0)  # closing edge last→first included
    counts = np.abs(ends - starts).max(axis=1) + 1
    seg = np.repeat(np.arange(len(starts)), counts)
    offsets = np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts,
                                                  counts)
    denom = np.maximum(counts - 1, 1)
    frac = (offsets / denom[seg])[:, None]
    samples = np.rint(starts[seg] + frac * (ends[seg] - starts[seg])).astype(
        np.int64
    )
    inside = np.all(
        (samples >= 0) & (samples < np.asarray(canvas.shape)), axis=1
    )
    samples = samples[inside]
    canvas[samples[:, 0], samples[:, 1]] = 1.0


def _select_genes(spots, genes: Optional[list[str]]):
    """Restrict a spot table to the requested genes (whitespace-trimmed;
    an empty or all-blank request means no restriction)."""
    if not genes:
        return spots
    wanted: set[str] = set()
    for gene in genes:
        name = str(gene).strip()
        if name:
            wanted.add(name)
    if not wanted:
        return spots
    return spots[spots["gene_id"].astype(str).isin(wanted)]


def _spot_volume(shape_zyx, centers_zyx: np.ndarray, radius: int) -> np.ndarray:
    overlay = np.zeros(tuple(int(v) for v in shape_zyx), dtype=np.float32)
    _stamp_boxes(overlay, centers_zyx, radius)
    return overlay


def _outline_volume(shape_zyx, polygons_yx_px) -> np.ndarray:
    """Rasterize polygon boundaries once in 2D, then broadcast across z
    (outlines are global-XY objects; every z plane shows the same trace)."""
    shape_zyx = tuple(int(v) for v in shape_zyx)
    plane = np.zeros(shape_zyx[1:], dtype=np.float32)
    for poly in polygons_yx_px:
        _trace_closed_polyline(plane, poly)
    return np.broadcast_to(plane, shape_zyx).copy()


# --------------------------------------------------------------------------
# decoded-spot overlays
# --------------------------------------------------------------------------


def rasterize_decoded_spots(
    decoded_spots,
    shape_zyx,
    genes: Optional[list[str]] = None,
    radius: int = 1,
) -> np.ndarray:
    """Decoded spots → per-tile overlay volume, via tile pixel coords."""
    needed = {"tile_z", "tile_y", "tile_x", "gene_id"}
    if (
        decoded_spots is None
        or len(decoded_spots) == 0
        or not needed.issubset(decoded_spots.columns)
    ):
        return np.zeros(tuple(int(v) for v in shape_zyx), dtype=np.float32)
    spots = _select_genes(decoded_spots, genes)
    centers = spots[["tile_z", "tile_y", "tile_x"]].to_numpy(dtype=float)
    return _spot_volume(shape_zyx, centers, radius)


def rasterize_global_decoded_spots(
    decoded_spots,
    shape_zyx,
    origin_zyx_um,
    spacing_zyx_um,
    genes: Optional[list[str]] = None,
    radius: int = 1,
) -> np.ndarray:
    """Decoded spots → fused-canvas overlay, via global micron XY (the
    fused canvas is viewed as a max projection, so all spots land on z=0)."""
    needed = {"global_y", "global_x", "gene_id"}
    if (
        decoded_spots is None
        or len(decoded_spots) == 0
        or not needed.issubset(decoded_spots.columns)
    ):
        return np.zeros(tuple(int(v) for v in shape_zyx), dtype=np.float32)
    spots = _select_genes(decoded_spots, genes)
    yx_px = _canvas_yx_from_um(
        spots[["global_y", "global_x"]].to_numpy(dtype=float),
        origin_zyx_um, spacing_zyx_um,
    )
    centers = np.concatenate([np.zeros((len(yx_px), 1)), yx_px], axis=1)
    return _spot_volume(shape_zyx, centers, radius)


def decoded_overlay_for_tile(
    datastore,
    tile: str,
    shape_zyx,
    genes: Optional[list[str]] = None,
) -> Optional[np.ndarray]:
    """Per-tile decoded overlay. Prefers the filtered global table
    (restricted to this tile's rows); falls back to per-tile spot tables."""
    filtered_path = _probe(datastore, *_FILTERED_SPOTS_REL)
    have_filtered = component_summary(datastore)["FilteredSpots"] or (
        filtered_path is not None and filtered_path.exists()
    )
    if have_filtered:
        spots = datastore.load_global_filtered_decoded_spots()
        if spots is None:
            return None
        tile_ids = list(datastore.tile_ids or [])
        if tile in tile_ids and "tile_idx" in spots.columns:
            spots = spots[spots["tile_idx"] == tile_ids.index(tile)]
        return rasterize_decoded_spots(spots, shape_zyx, genes=genes)
    if decoded_available(datastore):
        spots = datastore.load_local_decoded_spots(tile=tile)
        if spots is None:
            return None
        return rasterize_decoded_spots(spots, shape_zyx, genes=genes)
    return None


def global_decoded_overlay(
    datastore,
    shape_zyx,
    origin_zyx_um,
    spacing_zyx_um,
    genes: Optional[list[str]] = None,
) -> Optional[np.ndarray]:
    """Filtered decoded spots on the fused global canvas."""
    if not decoded_available(datastore):
        return None
    spots = datastore.load_global_filtered_decoded_spots()
    if spots is None:
        return None
    return rasterize_global_decoded_spots(
        spots, shape_zyx, origin_zyx_um, spacing_zyx_um, genes=genes
    )


# --------------------------------------------------------------------------
# cell-outline overlays
# --------------------------------------------------------------------------


def _normalize_outlines(outlines) -> dict:
    """Accept either the datastore JSON outline document
    (``{"cells": [{"cell_id", "polygon_global_yx"}, ...]}``) or the
    roifile-style mapping id → (N, 2) global ``[x, y]``; return the latter."""
    if outlines is None:
        return {}
    if isinstance(outlines, dict) and "cells" in outlines:
        return {
            cell.get("cell_id", i): np.asarray(
                cell["polygon_global_yx"], dtype=float
            )[:, ::-1]
            for i, cell in enumerate(outlines["cells"], start=1)
        }
    return dict(outlines)


def _valid_outline_xy(outline) -> Optional[np.ndarray]:
    xy = np.asarray(outline, dtype=float)
    if xy.ndim != 2 or xy.shape[0] < 2 or xy.shape[1] != 2:
        return None
    return xy


def _project_outlines(outlines, to_yx_px) -> list[np.ndarray]:
    """Normalize, validate, and project outlines with ``to_yx_px`` (a
    vectorized (N,2) global-[x,y]-µm → [y,x]-px map)."""
    polygons = []
    for outline in _normalize_outlines(outlines).values():
        xy = _valid_outline_xy(outline)
        if xy is not None:
            polygons.append(to_yx_px(xy))
    return polygons


def rasterize_cell_outlines(
    outlines,
    shape_zyx,
    affine_zyx_um,
    origin_zyx_um,
    spacing_zyx_um,
) -> np.ndarray:
    """Global outlines → one tile's pixel volume (through the tile's
    inverse global affine)."""
    polygons = _project_outlines(
        outlines,
        lambda xy: _global_xy_to_tile_yx(
            xy, affine_zyx_um, origin_zyx_um, spacing_zyx_um
        ),
    )
    return _outline_volume(shape_zyx, polygons)


def rasterize_global_cell_outlines(
    outlines,
    shape_zyx,
    origin_zyx_um,
    spacing_zyx_um,
) -> np.ndarray:
    """Global outlines → the fused global canvas (origin/spacing scaling)."""
    polygons = _project_outlines(
        outlines,
        lambda xy: _canvas_yx_from_um(xy[:, ::-1], origin_zyx_um,
                                      spacing_zyx_um),
    )
    return _outline_volume(shape_zyx, polygons)


def _load_global_cellpose_roi_zip(datastore) -> Optional[dict]:
    """Exported ImageJ ROI zip of global cell outlines, if present
    (parsed by the self-contained reader in `utils/imagej_rois.py`)."""
    roi_path = _probe(datastore, "segmentation", "cellpose", "imagej_rois",
                      "global_coords_rois.zip")
    if roi_path is None or not roi_path.exists():
        return None
    from ..utils.imagej_rois import read_imagej_rois_zip

    try:
        return read_imagej_rois_zip(roi_path)
    except (OSError, ValueError):
        return None


def _load_outlines(datastore) -> Optional[dict]:
    """ROI zip first (global pixel-exact export), JSON outlines second."""
    outlines = _load_global_cellpose_roi_zip(datastore)
    if outlines:
        return outlines
    return datastore.load_global_cellpose_outlines()


def cell_outline_overlay_for_tile(
    datastore, tile: str, shape_zyx
) -> Optional[np.ndarray]:
    """Cell outlines rasterized into one tile's pixel frame."""
    if not cell_outlines_available(datastore):
        return None
    outlines = _load_outlines(datastore)
    if outlines is None:
        return None
    xf = datastore.load_global_coord_xforms_um(tile=tile)
    if xf is None:
        return None
    affine, origin, spacing = xf
    return rasterize_cell_outlines(outlines, shape_zyx, affine, origin, spacing)


def global_cell_outline_overlay(
    datastore, shape_zyx, origin_zyx_um, spacing_zyx_um
) -> Optional[np.ndarray]:
    """Cell outlines rasterized onto the fused global canvas."""
    if not cell_outlines_available(datastore):
        return None
    outlines = _load_outlines(datastore)
    if outlines is None:
        return None
    return rasterize_global_cell_outlines(
        outlines, shape_zyx, origin_zyx_um, spacing_zyx_um
    )


# --------------------------------------------------------------------------
# channel stacks with micron coordinates
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ChannelStack:
    """Channel-stacked (c, z, y, x) image data + display labels."""

    data: np.ndarray
    labels: list[str]


@dataclass(frozen=True)
class GlobalChannelStack:
    """Global channel stack with micron coordinate metadata."""

    stack: ChannelStack
    origin_zyx_um: np.ndarray
    spacing_zyx_um: np.ndarray


@dataclass(frozen=True)
class MicronStack:
    """Coordinate-annotated stack (stands in for the reference's
    ``xarray.DataArray``; xarray is not in this environment)."""

    data: np.ndarray
    dims: tuple[str, ...]
    coords: dict[str, np.ndarray]
    attrs: dict[str, float]


def stack_with_micron_coords(
    stack: ChannelStack,
    voxel_size_zyx_um,
    origin_zyx_um=None,
) -> MicronStack:
    """Annotate a channel stack with physical zyx axes: each spatial axis
    gets the coordinate array ``origin + step · index`` in µm."""
    data = stack.data.astype(np.float32, copy=False)
    step = np.asarray(voxel_size_zyx_um, dtype=np.float32)
    if data.ndim != 4 or step.shape[0] != 3:
        raise ValueError("Expected channel stack shape (c, z, y, x).")
    if origin_zyx_um is None:
        start = np.zeros(3, dtype=np.float32)
    else:
        start = np.asarray(origin_zyx_um, dtype=np.float32)
        if start.shape[0] != 3:
            raise ValueError("Expected origin shape (3,).")
    coords: dict[str, np.ndarray] = {"c": np.arange(data.shape[0])}
    for name, length, o, s in zip(
        ("z_um", "y_um", "x_um"), data.shape[1:], start, step
    ):
        coords[name] = o + s * np.arange(length, dtype=np.float32)
    return MicronStack(
        data=data,
        dims=("c", "z_um", "y_um", "x_um"),
        coords=coords,
        attrs={"z_spacing_um": float(step[0])},
    )


def empty_micron_stack() -> MicronStack:
    """Minimal placeholder stack for axis initialization."""
    placeholder = ChannelStack(
        data=np.zeros((1, 1, 2, 2), dtype=np.float32), labels=["empty"]
    )
    return stack_with_micron_coords(placeholder, (1.0, 1.0, 1.0))


def _as_zyx(image) -> np.ndarray:
    """Squeeze any loaded image down to 3D zyx (2D inputs gain a z axis)."""
    array = np.squeeze(np.asarray(image))
    if array.ndim == 2:
        array = array[np.newaxis]
    if array.ndim != 3:
        raise ValueError(f"Expected a 2D or 3D image, got shape {array.shape}.")
    return array


def load_image_channels(
    datastore,
    tile: str,
    fiducial_sources: list[str],
    bit_ids: list[str],
    bit_sources: list[str],
) -> ChannelStack:
    """Load the selected per-tile channels as one (c, z, y, x) stack.

    ``fiducial_sources`` ⊆ {corrected, registered} select the round-1
    fiducial channel variants; ``bit_sources`` ⊆ {corrected, registered,
    feature} select per-bit variants for every requested bit id."""
    rounds = list(datastore.round_ids or [])
    requests: list[tuple[str, Any]] = []
    if rounds:
        r0 = rounds[0]
        if "corrected" in fiducial_sources:
            requests.append((
                f"{tile}:{r0}:fiducial corrected",
                lambda r0=r0: datastore.load_local_corrected_image(
                    tile=tile, round=r0),
            ))
        if "registered" in fiducial_sources:
            requests.append((
                f"{tile}:{r0}:fiducial registered/decon",
                lambda r0=r0: datastore.load_local_registered_image(
                    tile=tile, round=r0),
            ))
    for bit_id in bit_ids:
        if "corrected" in bit_sources:
            requests.append((
                f"{tile}:{bit_id}:corrected",
                lambda b=bit_id: datastore.load_local_corrected_image(
                    tile=tile, bit=b),
            ))
        if "registered" in bit_sources:
            requests.append((
                f"{tile}:{bit_id}:registered/decon",
                lambda b=bit_id: datastore.load_local_registered_image(
                    tile=tile, bit=b),
            ))
        if "feature" in bit_sources:
            requests.append((
                f"{tile}:{bit_id}:feature predictor",
                lambda b=bit_id: datastore.load_local_feature_predictor_image(
                    tile=tile, bit=b),
            ))
    channels: list[np.ndarray] = []
    labels: list[str] = []
    for label, loader in requests:
        image = loader()
        if image is not None:
            channels.append(_as_zyx(image))
            labels.append(label)
    if not channels:
        raise ValueError("No selected image channels were available to display.")
    if len({c.shape for c in channels}) > 1:
        raise ValueError("Selected image channels do not have matching shapes.")
    return ChannelStack(data=np.stack(channels, axis=0), labels=labels)


def selected_image_channel_count(
    fiducial_sources: list[str],
    bit_ids: list[str],
    bit_sources: list[str],
    has_fiducial_round: bool,
) -> int:
    """Channel count the current selection would produce."""
    fiducial = len(fiducial_sources) if has_fiducial_round else 0
    return fiducial + len(bit_ids) * len(bit_sources)


def unavailable_data_message(error: ValueError) -> str:
    """User-facing message for a failed channel selection."""
    return f"Data not available: {error}"


# --------------------------------------------------------------------------
# global fused channels
# --------------------------------------------------------------------------


def _match_global_overlay_shape(overlay, shape_zyx) -> np.ndarray:
    """Coerce a global overlay to the fused image's shape (a single-plane
    overlay is repeated across z); raise if the grids are incompatible."""
    overlay_zyx = _as_zyx(overlay)
    shape_zyx = tuple(int(v) for v in shape_zyx)
    if overlay_zyx.shape == shape_zyx:
        return overlay_zyx.astype(np.float32, copy=False)
    if overlay_zyx.shape[0] == 1 and overlay_zyx.shape[1:] == shape_zyx[1:]:
        return np.repeat(overlay_zyx, shape_zyx[0], axis=0).astype(np.float32)
    raise ValueError("Global overlay shape does not match fused global image.")


def load_global_image_channels(
    datastore, include_segmentation: bool = True
) -> GlobalChannelStack:
    """Fused global fiducial max projection (+ segmentation labels when a
    compatible-grid label image exists)."""
    loaded = datastore.load_global_fiducial_image()
    if loaded is None:
        raise ValueError("No fused global fiducial image was available to display.")
    fused_image, (affine, origin_zyx_um, spacing_zyx_um) = loaded
    projection = np.max(_as_zyx(fused_image), axis=0,
                        keepdims=True).astype(np.float32)
    channels = [projection]
    labels = ["global fiducial max projection"]
    if include_segmentation and global_cellpose_segmentation_available(datastore):
        segmentation = datastore.load_global_cellpose_segmentation_image()
        if segmentation is not None:
            try:
                channels.append(
                    _match_global_overlay_shape(segmentation, projection.shape)
                )
                labels.append("global fiducial segmentation")
            except ValueError:
                pass  # iso-downsampled masks with a different grid: skip
    return GlobalChannelStack(
        stack=ChannelStack(data=np.stack(channels, axis=0), labels=labels),
        origin_zyx_um=np.asarray(origin_zyx_um, dtype=np.float32),
        spacing_zyx_um=np.asarray(spacing_zyx_um, dtype=np.float32),
    )


def append_overlay_channel(
    stack: ChannelStack, overlay: Optional[np.ndarray], label: str
) -> ChannelStack:
    """Append an overlay as a new channel; ``None`` passes through."""
    if overlay is None:
        return stack
    overlay_zyx = _as_zyx(overlay)
    if overlay_zyx.shape != stack.data.shape[1:]:
        raise ValueError("Overlay shape does not match selected image channels.")
    return ChannelStack(
        data=np.concatenate([stack.data, overlay_zyx[np.newaxis]], axis=0),
        labels=[*stack.labels, label],
    )


def apply_lut_channel_labels(array_viewer: Any, labels: list[str]) -> int:
    """Apply channel labels to a viewer exposing ``set_channel_labels``
    (the ndv LUT-view hook in the reference); returns how many applied."""
    setter = getattr(array_viewer, "set_channel_labels", None)
    if callable(setter):
        setter(list(labels))
        return len(labels)
    return 0


# --------------------------------------------------------------------------
# static export + GUI gate
# --------------------------------------------------------------------------


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
            yx = _canvas_yx_from_um(
                decoded[["global_y", "global_x"]].to_numpy(dtype=float),
                origin, spacing,
            )
            axes[1].scatter(yx[:, 1], yx[:, 0], s=2, c="tab:red", alpha=0.6)
        axes[1].set_xlim(axes[0].get_xlim())
        axes[1].set_ylim(axes[0].get_ylim())
        axes[1].set_aspect("equal")
        axes[1].set_title("decoded spots")
        for xy in _normalize_outlines(
            datastore.load_global_cellpose_outlines()
        ).values():
            poly = _canvas_yx_from_um(np.asarray(xy)[:, ::-1], origin, spacing)
            axes[1].plot(poly[:, 1], poly[:, 0], lw=0.5, c="tab:blue")
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)
    return Path(output_png)


class Qi2labViewer:
    """Interactive GUI wrapper.

    Opens the built-in matplotlib-widget shell (`viz/interactive.py`:
    z/channel sliders, tile paging, decoded-spot + cell-outline overlays,
    global fused view, keyboard bindings) — a real interactive window on
    TkAgg, headless-drivable on Agg. The reference's ndv/PyQt stack can
    consume the same data layer (this module) directly when installed.
    """

    def __init__(self, datastore, **kwargs):
        self._datastore = datastore
        self._backend_kind = "matplotlib"
        from .interactive import MatplotlibViewer

        self._viewer = MatplotlibViewer(datastore, **kwargs)

    def __getattr__(self, name):
        return getattr(self._viewer, name)

    def show(self) -> None:
        self._viewer.show()

    def run(self) -> None:
        """Blocking event loop."""
        self.show()


def run_viewer(datastore_path, output_png=None):
    ds = open_datastore(normalize_datastore_path(Path(datastore_path)))
    summary = component_summary(ds)
    summary["decoded_available"] = decoded_available(ds)
    summary["global_fused_available"] = global_fused_available(ds)
    print(summary)
    if output_png is not None:
        export_overview(ds, output_png)
    else:
        Qi2labViewer(ds).show()
