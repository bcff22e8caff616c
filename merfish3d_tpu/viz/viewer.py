"""Read-only experiment viewer: full data-preparation layer + optional GUI.

Reimplements the reference viewer's data layer (`viewer.py:27-1275`):
channel stacks with micron coordinates, availability predicates that fall
back to on-disk probing when state flags are stale, codebook gene→bit
mapping, decoded-spot and cell-outline rasterization (per-tile pixel space
and fused global micron space), ImageJ ROI zip ingestion, and global↔tile
coordinate mapping through the stored affines. The interactive GUI
(ndv/PyQt in the reference) is import-gated; a matplotlib static export
(`export_overview`) provides hermetic visualization.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import numpy as np


# --------------------------------------------------------------------------
# channel stacks (reference `viewer.py:10-95`)
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
    """Attach zyx micron coordinates to a channel stack
    (reference `stack_with_micron_coords:27-75`)."""
    data = stack.data.astype(np.float32, copy=False)
    voxel = np.asarray(voxel_size_zyx_um, dtype=np.float32)
    origin = (
        np.zeros(3, dtype=np.float32)
        if origin_zyx_um is None
        else np.asarray(origin_zyx_um, dtype=np.float32)
    )
    if data.ndim != 4 or voxel.shape[0] != 3:
        raise ValueError("Expected channel stack shape (c, z, y, x).")
    if origin.shape[0] != 3:
        raise ValueError("Expected origin shape (3,).")
    return MicronStack(
        data=data,
        dims=("c", "z_um", "y_um", "x_um"),
        coords={
            "c": np.arange(data.shape[0]),
            "z_um": origin[0] + np.arange(data.shape[1], dtype=np.float32) * voxel[0],
            "y_um": origin[1] + np.arange(data.shape[2], dtype=np.float32) * voxel[1],
            "x_um": origin[2] + np.arange(data.shape[3], dtype=np.float32) * voxel[2],
        },
        attrs={"z_spacing_um": float(voxel[0])},
    )


def empty_micron_stack() -> MicronStack:
    """Empty placeholder stack for axis initialization
    (reference `empty_micron_stack:77-94`)."""
    return stack_with_micron_coords(
        ChannelStack(data=np.zeros((1, 1, 2, 2), dtype=np.float32), labels=["empty"]),
        (1.0, 1.0, 1.0),
    )


# --------------------------------------------------------------------------
# datastore discovery + availability (reference `viewer.py:96-300`)
# --------------------------------------------------------------------------


def normalize_datastore_path(path: Path) -> Path:
    """Resolve an experiment root or direct datastore path
    (reference `normalize_datastore_path:96-124`)."""
    expanded = Path(path).expanduser().resolve()
    if (expanded / "datastore_state.json").exists():
        return expanded
    nested = expanded / "qi2labdatastore"
    if (nested / "datastore_state.json").exists():
        return nested
    raise FileNotFoundError(
        "Could not find qi2lab datastore. Select an experiment root containing "
        "'qi2labdatastore' or select the datastore directory directly."
    )


def open_datastore(datastore_path: Path):
    """Open a datastore without expensive validation
    (reference `open_datastore:127-144`)."""
    from ..datastore import qi2labDataStore

    return qi2labDataStore(datastore_path, validate=False)


def component_summary(datastore) -> dict[str, bool]:
    """Datastore pipeline-stage flags (reference `component_summary:147-172`)."""
    state = datastore.datastore_state or {}
    return {
        key: bool(state.get(key, False))
        for key in (
            "Calibrations", "Corrected", "LocalRegistered", "GlobalRegistered",
            "Fused", "SegmentedCells", "DecodedSpots", "FilteredSpots",
        )
    }


def _datastore_path(datastore) -> Optional[Path]:
    path = getattr(datastore, "_datastore_path", None)
    return Path(path) if path is not None else None


def decoded_available(datastore) -> bool:
    """Decoded spots exist — state flags or on-disk probe
    (reference `decoded_available:193-226`)."""
    state = component_summary(datastore)
    if state["DecodedSpots"] or state["FilteredSpots"]:
        return True
    path = _datastore_path(datastore)
    if path is None:
        return False
    if (path / "all_tiles_filtered_decoded_features"
            / "decoded_features.parquet").exists():
        return True
    decoded_dir = path / "decoded"
    return decoded_dir.exists() and any(
        decoded_dir.glob("tile*_decoded_features.parquet")
    )


def cell_outlines_available(datastore) -> bool:
    """(reference `cell_outlines_available:229-253`)."""
    if component_summary(datastore)["SegmentedCells"]:
        return True
    path = _datastore_path(datastore)
    if path is None:
        return False
    if (path / "segmentation" / "cellpose" / "imagej_rois"
            / "global_coords_rois.zip").exists():
        return True
    return datastore.load_global_cellpose_outlines() is not None


def global_fused_available(datastore) -> bool:
    """(reference `global_fused_available:256-276`)."""
    if component_summary(datastore)["Fused"]:
        return True
    path = _datastore_path(datastore)
    if path is None:
        return False
    return (path / "fused" / "fused.zarr" / "fused_fiducial_zyx.ome.zarr"
            / "zarr.json").exists()


def global_cellpose_segmentation_available(datastore) -> bool:
    """(reference `global_cellpose_segmentation_available:279-300`)."""
    if component_summary(datastore)["SegmentedCells"]:
        return True
    return datastore.load_global_cellpose_segmentation_image() is not None


def codebook_gene_bits(datastore) -> dict[str, list[str]]:
    """Map codebook genes to the datastore bit ids holding their on bits
    (reference `codebook_gene_bits:303-350`)."""
    parsed = datastore.load_codebook_parsed()
    if parsed is None:
        return {}
    gene_ids, matrix = parsed
    bit_ids = list(datastore.bit_ids or [])
    gene_to_bits: dict[str, list[str]] = {}
    for gene_id, row in zip(gene_ids, np.asarray(matrix)):
        gene_to_bits[str(gene_id)] = [
            bit_ids[i] for i, on in enumerate(np.asarray(row).astype(bool))
            if on and i < len(bit_ids)
        ]
    return gene_to_bits


# --------------------------------------------------------------------------
# channel loading (reference `viewer.py:352-530`)
# --------------------------------------------------------------------------


def _as_zyx(image) -> np.ndarray:
    """Squeeze a loaded image to 3D zyx (reference `_as_zyx:352-374`)."""
    array = np.squeeze(np.asarray(image))
    if array.ndim == 2:
        array = array[np.newaxis]
    if array.ndim != 3:
        raise ValueError(f"Expected a 2D or 3D image, got shape {array.shape}.")
    return array


def _append_channel(channels, labels, image, label) -> None:
    if image is None:
        return
    channels.append(_as_zyx(image))
    labels.append(label)


def load_image_channels(
    datastore,
    tile: str,
    fiducial_sources: list[str],
    bit_ids: list[str],
    bit_sources: list[str],
) -> ChannelStack:
    """Load the selected per-tile channels: fiducial corrected/registered,
    readout corrected/registered/feature-predictor
    (reference `load_image_channels:437-506`)."""
    channels: list[np.ndarray] = []
    labels: list[str] = []
    round_ids = list(datastore.round_ids or [])
    round_id = round_ids[0] if round_ids else None

    if round_id is not None:
        if "corrected" in fiducial_sources:
            _append_channel(
                channels, labels,
                datastore.load_local_corrected_image(tile=tile, round=round_id),
                f"{tile}:{round_id}:fiducial corrected",
            )
        if "registered" in fiducial_sources:
            _append_channel(
                channels, labels,
                datastore.load_local_registered_image(tile=tile, round=round_id),
                f"{tile}:{round_id}:fiducial registered/decon",
            )
    for bit_id in bit_ids:
        if "corrected" in bit_sources:
            _append_channel(
                channels, labels,
                datastore.load_local_corrected_image(tile=tile, bit=bit_id),
                f"{tile}:{bit_id}:corrected",
            )
        if "registered" in bit_sources:
            _append_channel(
                channels, labels,
                datastore.load_local_registered_image(tile=tile, bit=bit_id),
                f"{tile}:{bit_id}:registered/decon",
            )
        if "feature" in bit_sources:
            _append_channel(
                channels, labels,
                datastore.load_local_feature_predictor_image(tile=tile, bit=bit_id),
                f"{tile}:{bit_id}:feature predictor",
            )
    if not channels:
        raise ValueError("No selected image channels were available to display.")
    shape = channels[0].shape
    if any(c.shape != shape for c in channels):
        raise ValueError("Selected image channels do not have matching shapes.")
    return ChannelStack(data=np.stack(channels, axis=0), labels=labels)


def selected_image_channel_count(
    fiducial_sources: list[str],
    bit_ids: list[str],
    bit_sources: list[str],
    has_fiducial_round: bool,
) -> int:
    """(reference `selected_image_channel_count:509-530`)."""
    fiducial_count = len(fiducial_sources) if has_fiducial_round else 0
    return fiducial_count + len(bit_ids) * len(bit_sources)


def unavailable_data_message(error: ValueError) -> str:
    """(reference `unavailable_data_message:533-545`)."""
    return f"Data not available: {error}"


# --------------------------------------------------------------------------
# decoded-spot overlays (reference `viewer.py:548-780`)
# --------------------------------------------------------------------------


def _paint_point(volume: np.ndarray, zyx, radius: int = 1) -> None:
    """(reference `_paint_point:549-577`)."""
    z, y, x = np.round(np.asarray(zyx, dtype=float)).astype(int)
    zl, zh = max(0, z - radius), min(volume.shape[0], z + radius + 1)
    yl, yh = max(0, y - radius), min(volume.shape[1], y + radius + 1)
    xl, xh = max(0, x - radius), min(volume.shape[2], x + radius + 1)
    if zl < zh and yl < yh and xl < xh:
        volume[zl:zh, yl:yh, xl:xh] = 1.0


def _filter_genes(spots, genes):
    if genes:
        genes_set = {g.strip() for g in genes if g.strip()}
        if genes_set:
            return spots.loc[spots["gene_id"].astype(str).isin(genes_set)]
    return spots


def rasterize_decoded_spots(
    decoded_spots,
    shape_zyx,
    genes: Optional[list[str]] = None,
    radius: int = 1,
) -> np.ndarray:
    """Rasterize decoded spots via tile pixel coordinates
    (reference `rasterize_decoded_spots:579-624`)."""
    overlay = np.zeros(tuple(int(v) for v in shape_zyx), dtype=np.float32)
    if decoded_spots is None or len(decoded_spots) == 0:
        return overlay
    if not {"tile_z", "tile_y", "tile_x", "gene_id"}.issubset(decoded_spots.columns):
        return overlay
    spots = _filter_genes(decoded_spots, genes)
    for coord in spots[["tile_z", "tile_y", "tile_x"]].to_numpy(dtype=float):
        _paint_point(overlay, coord, radius)
    return overlay


def rasterize_global_decoded_spots(
    decoded_spots,
    shape_zyx,
    origin_zyx_um,
    spacing_zyx_um,
    genes: Optional[list[str]] = None,
    radius: int = 1,
) -> np.ndarray:
    """Rasterize decoded spots via global micron XY on the fused canvas
    (reference `rasterize_global_decoded_spots:627-680`)."""
    overlay = np.zeros(tuple(int(v) for v in shape_zyx), dtype=np.float32)
    if decoded_spots is None or len(decoded_spots) == 0:
        return overlay
    if not {"global_y", "global_x", "gene_id"}.issubset(decoded_spots.columns):
        return overlay
    spots = _filter_genes(decoded_spots, genes)
    origin = np.asarray(origin_zyx_um, dtype=float)
    spacing = np.asarray(spacing_zyx_um, dtype=float)
    coords_um = spots[["global_y", "global_x"]].to_numpy(dtype=float)
    for yx in (coords_um - origin[1:]) / spacing[1:]:
        _paint_point(overlay, (0.0, yx[0], yx[1]), radius)
    return overlay


def decoded_overlay_for_tile(
    datastore,
    tile: str,
    shape_zyx,
    genes: Optional[list[str]] = None,
) -> Optional[np.ndarray]:
    """Per-tile decoded overlay from filtered (preferred) or per-tile spots
    (reference `decoded_overlay_for_tile:683-737`)."""
    tile_ids = list(datastore.tile_ids or [])
    tile_idx = tile_ids.index(tile) if tile in tile_ids else None
    path = _datastore_path(datastore)
    filtered_path = (
        path / "all_tiles_filtered_decoded_features" / "decoded_features.parquet"
        if path is not None else None
    )
    if component_summary(datastore)["FilteredSpots"] or (
        filtered_path is not None and filtered_path.exists()
    ):
        spots = datastore.load_global_filtered_decoded_spots()
        if spots is None:
            return None
        if tile_idx is not None and "tile_idx" in spots.columns:
            spots = spots.loc[spots["tile_idx"] == tile_idx]
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
    """(reference `global_decoded_overlay:740-780`)."""
    if not decoded_available(datastore):
        return None
    spots = datastore.load_global_filtered_decoded_spots()
    if spots is None:
        return None
    return rasterize_global_decoded_spots(
        spots, shape_zyx, origin_zyx_um, spacing_zyx_um, genes=genes
    )


# --------------------------------------------------------------------------
# cell-outline overlays (reference `viewer.py:784-1100`)
# --------------------------------------------------------------------------


def _draw_line_2d(image: np.ndarray, start_yx, end_yx) -> None:
    """Integer-interpolated 2D line (reference `_draw_line_2d:784-820`)."""
    start_yx = np.asarray(start_yx, dtype=float)
    end_yx = np.asarray(end_yx, dtype=float)
    y0, x0 = np.round(start_yx).astype(int)
    y1, x1 = np.round(end_yx).astype(int)
    steps = int(max(abs(y1 - y0), abs(x1 - x0))) + 1
    ys = np.round(np.linspace(y0, y1, steps)).astype(int)
    xs = np.round(np.linspace(x0, x1, steps)).astype(int)
    ok = (ys >= 0) & (ys < image.shape[0]) & (xs >= 0) & (xs < image.shape[1])
    image[ys[ok], xs[ok]] = 1.0


def _global_xy_to_tile_yx(
    global_xy: np.ndarray,
    affine_zyx_um: np.ndarray,
    origin_zyx_um: np.ndarray,
    spacing_zyx_um: np.ndarray,
) -> np.ndarray:
    """Global [x, y] µm vertices → local tile [y, x] pixels through the
    inverse global affine (reference `_global_xy_to_tile_yx:823-855`)."""
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


def _normalize_outlines(outlines) -> dict:
    """Accept either the datastore JSON outline document
    ({"cells": [{"cell_id", "polygon_global_yx"}, ...]}) or the
    roifile-style mapping id → (N, 2) global [x, y]; return the latter."""
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


def rasterize_cell_outlines(
    outlines,
    shape_zyx,
    affine_zyx_um,
    origin_zyx_um,
    spacing_zyx_um,
) -> np.ndarray:
    """Rasterize global outlines into one tile's pixel volume
    (reference `rasterize_cell_outlines:857-911`)."""
    outlines = _normalize_outlines(outlines)
    shape_zyx = tuple(int(v) for v in shape_zyx)
    overlay_2d = np.zeros(shape_zyx[1:], dtype=np.float32)
    if not outlines:
        return np.zeros(shape_zyx, dtype=np.float32)
    for outline in outlines.values():
        xy = np.asarray(outline, dtype=float)
        if xy.ndim != 2 or xy.shape[0] < 2 or xy.shape[1] != 2:
            continue
        local_yx = _global_xy_to_tile_yx(
            xy, affine_zyx_um, origin_zyx_um, spacing_zyx_um
        )
        if (
            local_yx[:, 0].max() < 0 or local_yx[:, 0].min() >= overlay_2d.shape[0]
            or local_yx[:, 1].max() < 0 or local_yx[:, 1].min() >= overlay_2d.shape[1]
        ):
            continue
        for i in range(local_yx.shape[0]):
            _draw_line_2d(overlay_2d, local_yx[i - 1], local_yx[i])
    return np.repeat(overlay_2d[np.newaxis], shape_zyx[0], axis=0)


def rasterize_global_cell_outlines(
    outlines,
    shape_zyx,
    origin_zyx_um,
    spacing_zyx_um,
) -> np.ndarray:
    """Rasterize outlines directly on the fused global canvas
    (reference `rasterize_global_cell_outlines:914-962`)."""
    outlines = _normalize_outlines(outlines)
    shape_zyx = tuple(int(v) for v in shape_zyx)
    overlay_2d = np.zeros(shape_zyx[1:], dtype=np.float32)
    if not outlines:
        return np.zeros(shape_zyx, dtype=np.float32)
    origin = np.asarray(origin_zyx_um, dtype=float)
    spacing = np.asarray(spacing_zyx_um, dtype=float)
    for outline in outlines.values():
        xy = np.asarray(outline, dtype=float)
        if xy.ndim != 2 or xy.shape[0] < 2 or xy.shape[1] != 2:
            continue
        local_yx = (xy[:, ::-1] - origin[1:]) / spacing[1:]
        if (
            local_yx[:, 0].max() < 0 or local_yx[:, 0].min() >= overlay_2d.shape[0]
            or local_yx[:, 1].max() < 0 or local_yx[:, 1].min() >= overlay_2d.shape[1]
        ):
            continue
        for i in range(local_yx.shape[0]):
            _draw_line_2d(overlay_2d, local_yx[i - 1], local_yx[i])
    return np.repeat(overlay_2d[np.newaxis], shape_zyx[0], axis=0)


def _load_global_cellpose_roi_zip(datastore) -> Optional[dict]:
    """Load the exported ImageJ ROI zip of global cell outlines
    (reference `_load_global_cellpose_roi_zip:965-1010`, via `roifile`;
    here via the self-contained parser in `utils/imagej_rois.py`)."""
    path = _datastore_path(datastore)
    if path is None:
        return None
    roi_path = (
        path / "segmentation" / "cellpose" / "imagej_rois" / "global_coords_rois.zip"
    )
    if not roi_path.exists():
        return None
    from ..utils.imagej_rois import read_imagej_rois_zip

    try:
        return read_imagej_rois_zip(roi_path)
    except (OSError, ValueError):
        return None


def cell_outline_overlay_for_tile(
    datastore, tile: str, shape_zyx
) -> Optional[np.ndarray]:
    """(reference `cell_outline_overlay_for_tile:1013-1055`)."""
    if not cell_outlines_available(datastore):
        return None
    outlines = _load_global_cellpose_roi_zip(datastore)
    if not outlines:
        outlines = datastore.load_global_cellpose_outlines()
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
    """(reference `global_cell_outline_overlay:1058-1096`)."""
    if not cell_outlines_available(datastore):
        return None
    outlines = _load_global_cellpose_roi_zip(datastore)
    if not outlines:
        outlines = datastore.load_global_cellpose_outlines()
    if outlines is None:
        return None
    return rasterize_global_cell_outlines(
        outlines, shape_zyx, origin_zyx_um, spacing_zyx_um
    )


# --------------------------------------------------------------------------
# global fused channels (reference `viewer.py:1100-1240`)
# --------------------------------------------------------------------------


def _match_global_overlay_shape(overlay, shape_zyx) -> np.ndarray:
    """(reference `_match_global_overlay_shape:1100-1128`)."""
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
    """Fused global fiducial max projection + optional segmentation channel
    (reference `load_global_image_channels:1131-1180`)."""
    loaded = datastore.load_global_fiducial_image()
    if loaded is None:
        raise ValueError("No fused global fiducial image was available to display.")
    fused_image, (affine, origin_zyx_um, spacing_zyx_um) = loaded
    fused_zyx = _as_zyx(fused_image)
    fused_projection = np.max(fused_zyx, axis=0, keepdims=True).astype(np.float32)
    channels = [fused_projection]
    labels = ["global fiducial max projection"]
    if include_segmentation and global_cellpose_segmentation_available(datastore):
        segmentation = datastore.load_global_cellpose_segmentation_image()
        if segmentation is not None:
            try:
                channels.append(
                    _match_global_overlay_shape(segmentation, fused_projection.shape)
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
    """(reference `append_overlay_channel:1183-1215`)."""
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
    """Apply channel labels to a viewer's LUT views when it exposes them
    (reference `apply_lut_channel_labels:1218-1248`, ndv-specific there);
    returns the number of labels applied."""
    setter = getattr(array_viewer, "set_channel_labels", None)
    if callable(setter):
        setter(list(labels))
        return len(labels)
    return 0


def global_xy_to_tile_yx(datastore, tile, global_yx_um) -> np.ndarray:
    """Convenience: one global [y, x] µm point → tile [y, x] pixels."""
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
            ys = (decoded["global_y"].to_numpy() - origin[1]) / spacing[1]
            xs = (decoded["global_x"].to_numpy() - origin[2]) / spacing[2]
            axes[1].scatter(xs, ys, s=2, c="tab:red", alpha=0.6)
        axes[1].set_xlim(axes[0].get_xlim())
        axes[1].set_ylim(axes[0].get_ylim())
        axes[1].set_aspect("equal")
        axes[1].set_title("decoded spots")
        outlines = _normalize_outlines(datastore.load_global_cellpose_outlines())
        for xy in outlines.values():
            poly = (np.asarray(xy)[:, ::-1] - origin[1:]) / spacing[1:]
            axes[1].plot(poly[:, 1], poly[:, 0], lw=0.5, c="tab:blue")
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)
    return Path(output_png)


class Qi2labViewer:
    """Interactive GUI wrapper (reference `Qi2labViewer:1250-1275`).

    Opens the built-in matplotlib-widget shell (`viz/interactive.py`:
    z/channel sliders, tile paging, decoded-spot + cell-outline overlays,
    global fused view, keyboard bindings) — a real interactive window on
    TkAgg, headless-drivable on Agg. The reference's ndv/PyQt stack can
    consume the same data layer (`viz/viewer.py`) directly when installed.
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
        """Blocking event loop (reference `Qi2labViewer.run:1268-1275`)."""
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
