"""Cell segmentation interop: masks → outlines → datastore.

The reference runs Cellpose-SAM on the fused fiducial max projection
(`cli/qi2lab_microscopes/segment_fiducial.py:24-270`). Cellpose (torch
GPU) stays an external step (SURVEY.md §2.8): this module accepts an
externally produced label mask (or falls back to a classical
threshold+watershed-free segmentation for hermetic runs), derives cell
outlines in pixel and global coordinates, and persists the segmentation
into the datastore with the contract the decoder's cell assignment
consumes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import scipy.ndimage


def threshold_segment(
    image: np.ndarray, *, sigma: float = 4.0, min_area: int = 200
) -> np.ndarray:
    """Fallback segmentation: smoothed Otsu-like threshold + connected
    components (stand-in when no Cellpose mask is provided)."""
    img = scipy.ndimage.gaussian_filter(np.asarray(image, np.float32), sigma)
    # Otsu threshold (histogram-based)
    hist, edges = np.histogram(img.ravel(), bins=256)
    centers = (edges[:-1] + edges[1:]) / 2
    w = hist.astype(np.float64)
    total = w.sum()
    best_t, best_var = centers[0], -1.0
    csum = np.cumsum(w)
    cmean = np.cumsum(w * centers)
    mean_total = cmean[-1] / total
    with np.errstate(invalid="ignore", divide="ignore"):
        wb = csum / total
        mb = cmean / np.maximum(csum, 1e-9)
        between = wb * (1 - wb) * (mb - (mean_total - wb * mb) / np.maximum(1 - wb, 1e-9)) ** 2
    idx = int(np.nanargmax(between))
    mask = img > centers[idx]
    labels, n = scipy.ndimage.label(mask)
    if n:
        counts = np.bincount(labels.ravel())
        small = np.where(counts < min_area)[0]
        labels[np.isin(labels, small)] = 0
        # relabel densely
        uniq = np.unique(labels)
        remap = np.zeros(uniq.max() + 1, labels.dtype)
        remap[uniq] = np.arange(len(uniq))
        labels = remap[labels]
    return labels.astype(np.int32)


def watershed_segment(
    image: np.ndarray,
    *,
    sigma: float = 4.0,
    min_area: int = 200,
    min_seed_distance: int = 10,
    min_seed_height: float = 2.0,
) -> np.ndarray:
    """Distance-transform watershed fallback that SPLITS touching cells
    (the reference delegates this to Cellpose-SAM,
    `segment_fiducial.py:24-270`; this is the hermetic stand-in).

    Otsu foreground → Euclidean distance transform → local-maxima seeds
    (plateau-merged) → nearest-seed (Voronoi) assignment restricted to the
    foreground. No skimage in the image, so the watershed is approximated
    by the seeded Voronoi split along the ridge between distance peaks."""
    img = scipy.ndimage.gaussian_filter(np.asarray(image, np.float32), sigma)
    binary = img > _otsu_threshold(img)
    if not binary.any():
        return np.zeros(img.shape, np.int32)
    dist = scipy.ndimage.distance_transform_edt(binary)
    footprint = np.ones((min_seed_distance,) * img.ndim, bool)
    maxf = scipy.ndimage.maximum_filter(dist, footprint=footprint)
    seeds = (dist >= maxf) & (dist > min_seed_height)
    seed_labels, n_seeds = scipy.ndimage.label(seeds)
    if n_seeds == 0:
        labels, _ = scipy.ndimage.label(binary)
        return _drop_small_components(labels.astype(np.int32), min_area)
    # nearest-seed assignment: EDT from the seed set with index return
    idx = scipy.ndimage.distance_transform_edt(
        seed_labels == 0, return_distances=False, return_indices=True
    )
    labels = seed_labels[tuple(idx)]
    labels[~binary] = 0
    return _drop_small_components(labels.astype(np.int32), min_area)


def _otsu_threshold(img: np.ndarray) -> float:
    hist, edges = np.histogram(img.ravel(), bins=256)
    centers = (edges[:-1] + edges[1:]) / 2
    w = hist.astype(np.float64)
    total = w.sum()
    csum = np.cumsum(w)
    cmean = np.cumsum(w * centers)
    mean_total = cmean[-1] / total
    with np.errstate(invalid="ignore", divide="ignore"):
        wb = csum / total
        mb = cmean / np.maximum(csum, 1e-9)
        between = (
            wb * (1 - wb)
            * (mb - (mean_total - wb * mb) / np.maximum(1 - wb, 1e-9)) ** 2
        )
    return float(centers[int(np.nanargmax(between))])


def _drop_small_components(labels: np.ndarray, min_area: int) -> np.ndarray:
    if labels.max() == 0:
        return labels
    counts = np.bincount(labels.ravel())
    small = np.where(counts < min_area)[0]
    labels[np.isin(labels, small)] = 0
    uniq = np.unique(labels)
    remap = np.zeros(uniq.max() + 1, labels.dtype)
    remap[uniq] = np.arange(len(uniq))
    return remap[labels]


def mask_outlines(
    mask2d: np.ndarray,
    *,
    origin_yx_um=(0.0, 0.0),
    spacing_yx_um=(1.0, 1.0),
    affine_zyx_um: Optional[np.ndarray] = None,
) -> dict:
    """Extract per-cell boundary polygons from a 2D label mask (contourpy
    via matplotlib, replacing shapely/roifile). Returns the outlines dict
    stored by ``save_global_cellpose_outlines`` and consumed by
    ``assign_cells``: polygons in (global_y, global_x) µm.

    Pixel ROIs warp to global coordinates through origin + spacing and,
    when given, the stored fused-image 4x4 affine — the reference's
    `warp_points`/`_global_roi_from_pixel_roi` path
    (`segment_fiducial.py:272-333`)."""
    from contourpy import contour_generator

    mask2d = np.asarray(mask2d)
    origin = np.asarray(origin_yx_um, np.float64)
    spacing = np.asarray(spacing_yx_um, np.float64)
    cells = []
    for cell_id in np.unique(mask2d):
        if cell_id == 0:
            continue
        binary = (mask2d == cell_id).astype(np.float32)
        gen = contour_generator(z=binary)
        lines = gen.lines(0.5)
        if not lines:
            continue
        poly = max(lines, key=len)  # (N, 2) in (x, y) index order
        poly_yx_um = np.column_stack(
            [poly[:, 1] * spacing[0] + origin[0], poly[:, 0] * spacing[1] + origin[1]]
        )
        if affine_zyx_um is not None and not np.allclose(
            affine_zyx_um, np.eye(4)
        ):
            aff = np.asarray(affine_zyx_um, np.float64)
            pts = np.column_stack(
                [
                    np.zeros(len(poly_yx_um)),
                    poly_yx_um[:, 0],
                    poly_yx_um[:, 1],
                    np.ones(len(poly_yx_um)),
                ]
            )
            warped = (aff @ pts.T).T
            poly_yx_um = warped[:, 1:3]
        cells.append(
            {
                "cell_id": int(cell_id),
                "polygon_global_yx": poly_yx_um.tolist(),
            }
        )
    return {"cells": cells}


def segment_fiducial(
    datastore,
    *,
    mask_path: Optional[Path] = None,
    method: str = "watershed",
    model_path: Optional[Path] = None,
    downsampling: tuple[float, float, float] = (1.0, 1.0, 1.0),
    verbose: int = 1,
) -> dict:
    """Full segmentation step: external mask (npy), the native flow-field
    model (``method="flow"``, weights from ``model_path`` — see
    `models/cellpose.py`), or the classical watershed fallback, on the
    fused fiducial max projection → save mask + outlines to the
    datastore."""
    fused = datastore.load_global_fiducial_image()
    if fused is None:
        raise ValueError("global fused fiducial image required; run fusion first")
    img, (affine, origin, spacing) = fused
    if mask_path is not None:
        mask = np.load(mask_path)
    elif method == "flow":
        from ..models.cellpose import flow_segment, load_variables, train_cpnet

        variables = (
            load_variables(model_path) if model_path is not None
            else train_cpnet(verbose=verbose)
        )
        max_proj = np.max(np.asarray(img, np.float32), axis=0)
        mask = flow_segment(max_proj, variables)
    else:
        max_proj = np.max(np.asarray(img, np.float32), axis=0)
        segment = watershed_segment if method == "watershed" else threshold_segment
        mask = segment(max_proj)
    if mask.ndim == 2:
        mask3d = np.broadcast_to(mask, (img.shape[0], *mask.shape)).copy()
        mask2d = mask
    else:
        mask3d = mask
        mask2d = mask.max(axis=0)
    datastore.save_global_cellpose_segmentation_image(
        mask3d.astype(np.uint32), downsampling=downsampling
    )
    outlines = mask_outlines(
        mask2d,
        origin_yx_um=(origin[1], origin[2]),
        spacing_yx_um=(spacing[1], spacing[2]),
        affine_zyx_um=affine,
    )
    datastore.save_global_cellpose_outlines(outlines)
    # ImageJ RoiSet export of the global-micron outlines, as the reference
    # writes for downstream tools and the viewer
    # (`segmentation/cellpose/imagej_rois/global_coords_rois.zip`).
    from ..utils.imagej_rois import write_imagej_rois_zip

    write_imagej_rois_zip(
        Path(datastore._datastore_path)
        / "segmentation" / "cellpose" / "imagej_rois" / "global_coords_rois.zip",
        {
            cell["cell_id"]: np.asarray(cell["polygon_global_yx"], float)[:, ::-1]
            for cell in outlines["cells"]
            if len(cell["polygon_global_yx"]) >= 2
        },
    )
    state = datastore.datastore_state
    state.update({"SegmentedCells": True})
    datastore.datastore_state = state
    if verbose:
        print(f"segmented {len(outlines['cells'])} cells")
    return outlines
