"""Bead-based chromatic affine calibration.

Reimplementation of the reference bead-calibration workflow
(`utils/chromatic.py:run_chromatic_calibration / estimate_chromatic_affines /
fit_affine_source_to_reference`): multi-channel bead stacks → RLGC decon →
spot detection → mutual nearest-neighbor matching between channels →
robust least-squares affine per channel toward the reference (lowest)
wavelength. PSFs come from :mod:`merfish3d_tpu.models.psf` (replacing
psfmodels).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy.spatial import cKDTree


def detect_beads(
    volume: np.ndarray,
    *,
    threshold: float = 0.5,
    max_beads: int = 5000,
    intensity_mad_multiplier: float = 10.0,
    predictor=None,
) -> np.ndarray:
    """Bead centroids (z, y, x in px) via a spot-probability predictor +
    3D local maxima + a robust absolute-intensity gate (median + k·MAD,
    rejecting noise peaks) + intensity-weighted 3x3x3 refinement.

    ``predictor`` is any object with ``predict(volume) -> probability``
    (the reference runs U-FISH on the bead stacks, `chromatic.py:468-487`;
    pass :func:`merfish3d_tpu.models.ufish.get_predictor` output — default
    is the deterministic DoG fallback)."""
    import scipy.ndimage

    from ..models.ufish import DoGSpotPredictor

    vol = np.asarray(volume, np.float32)
    if predictor is None:
        predictor = DoGSpotPredictor()
    prob = predictor.predict(vol)
    med = float(np.median(vol))
    mad = float(np.median(np.abs(vol - med))) * 1.4826
    intensity_floor = med + intensity_mad_multiplier * max(mad, 1e-6)
    # local maxima on the raw intensity (the sigmoid probability saturates
    # into plateaus over bright beads, making every plateau voxel a "max")
    peaks = (
        (vol == scipy.ndimage.maximum_filter(vol, size=3))
        & (prob > threshold)
        & (vol > intensity_floor)
    )
    zs, ys, xs = np.nonzero(peaks)
    if len(zs) > max_beads:
        order = np.argsort(prob[zs, ys, xs])[::-1][:max_beads]
        zs, ys, xs = zs[order], ys[order], xs[order]
    centers = np.empty((len(zs), 3), np.float64)
    for i, (z, y, x) in enumerate(zip(zs, ys, xs)):
        zl, zh = max(0, z - 1), min(vol.shape[0], z + 2)
        yl, yh = max(0, y - 1), min(vol.shape[1], y + 2)
        xl, xh = max(0, x - 1), min(vol.shape[2], x + 2)
        roi = vol[zl:zh, yl:yh, xl:xh].astype(np.float64)
        w = roi.sum()
        if w <= 0:
            centers[i] = (z, y, x)
            continue
        zz, yy, xx = np.meshgrid(
            np.arange(zl, zh), np.arange(yl, yh), np.arange(xl, xh), indexing="ij"
        )
        centers[i] = (
            (roi * zz).sum() / w,
            (roi * yy).sum() / w,
            (roi * xx).sum() / w,
        )
    return centers


def mutual_nearest_neighbors(
    source_pts: np.ndarray, target_pts: np.ndarray, max_distance: float
) -> tuple[np.ndarray, np.ndarray]:
    """Mutual-NN correspondences within ``max_distance``
    (reference `chromatic.py` matching)."""
    if len(source_pts) == 0 or len(target_pts) == 0:
        return np.empty((0, 3)), np.empty((0, 3))
    t_tree = cKDTree(target_pts)
    s_tree = cKDTree(source_pts)
    d_st, j = t_tree.query(source_pts)
    d_ts, i = s_tree.query(target_pts)
    keep = []
    for s_idx, (t_idx, d) in enumerate(zip(j, d_st)):
        if d <= max_distance and i[t_idx] == s_idx:
            keep.append((s_idx, t_idx))
    if not keep:
        return np.empty((0, 3)), np.empty((0, 3))
    s_idx, t_idx = zip(*keep)
    return source_pts[list(s_idx)], target_pts[list(t_idx)]


def fit_affine_source_to_reference(
    source_zyx_um: np.ndarray,
    target_zyx_um: np.ndarray,
    *,
    n_iterations: int = 5,
    residual_threshold_um: float = 0.5,
) -> tuple[np.ndarray, dict]:
    """Robust full-affine LSQ with iterative residual trimming
    (reference `fit_affine_source_to_reference`)."""
    src = np.asarray(source_zyx_um, np.float64)
    tgt = np.asarray(target_zyx_um, np.float64)
    keep = np.ones(len(src), bool)
    affine = np.eye(4)
    for _ in range(max(1, n_iterations)):
        if keep.sum() < 4:
            break
        homo = np.concatenate([src[keep], np.ones((keep.sum(), 1))], axis=1)
        sol, *_ = np.linalg.lstsq(homo, tgt[keep], rcond=None)
        affine = np.eye(4)
        affine[:3, :4] = sol.T
        pred = (np.concatenate([src, np.ones((len(src), 1))], axis=1) @ affine.T)[:, :3]
        res = np.linalg.norm(pred - tgt, axis=1)
        new_keep = res <= residual_threshold_um
        if new_keep.sum() < 4 or np.array_equal(new_keep, keep):
            keep = new_keep if new_keep.sum() >= 4 else keep
            break
        keep = new_keep
    pred = (np.concatenate([src, np.ones((len(src), 1))], axis=1) @ affine.T)[:, :3]
    res = np.linalg.norm(pred - tgt, axis=1)
    diagnostics = {
        "n_pairs": int(len(src)),
        "n_inliers": int(keep.sum()),
        "median_residual_um": float(np.median(res[keep])) if keep.any() else np.nan,
    }
    return affine.astype(np.float32), diagnostics


def estimate_chromatic_affines(
    channel_volumes: Sequence[np.ndarray],
    emission_wavelengths_um: Sequence[float],
    *,
    voxel_size_zyx_um,
    max_match_distance_um: float = 1.0,
    detection_threshold: float = 0.5,
    predictor=None,
) -> dict:
    """Bead calibration across channels: detect beads per channel, match
    mutual NNs to the reference (lowest wavelength), fit one affine per
    channel (source = channel, target = reference, matching the
    decode-warp convention). Returns the structured calibration payload."""
    spacing = np.asarray(voxel_size_zyx_um, np.float64)
    wavelengths = [float(w) for w in emission_wavelengths_um]
    order = np.argsort(wavelengths)
    ref_idx = int(order[0])
    ref_wl = wavelengths[ref_idx]
    centers = [
        detect_beads(v, threshold=detection_threshold, predictor=predictor)
        * spacing
        for v in channel_volumes
    ]
    channels = {}
    for idx, wl in enumerate(wavelengths):
        key = f"wavelength_{wl:.6f}"
        if np.isclose(wl, ref_wl):
            channels[key] = {
                "channel_index": idx,
                "channel_name": key,
                "wavelength_um": wl,
                "reference_channel": True,
                "affine_zyx_um": np.eye(4).tolist(),
                "status": "identity_reference",
                "diagnostics": {"n_pairs": int(len(centers[idx]))},
            }
            continue
        src, tgt = mutual_nearest_neighbors(
            centers[idx], centers[ref_idx], max_match_distance_um
        )
        if len(src) < 4:
            channels[key] = {
                "channel_index": idx,
                "channel_name": key,
                "wavelength_um": wl,
                "reference_channel": False,
                "affine_zyx_um": np.eye(4).tolist(),
                "status": "insufficient_matches",
                "diagnostics": {"n_pairs": int(len(src))},
            }
            continue
        affine, diag = fit_affine_source_to_reference(src, tgt)
        channels[key] = {
            "channel_index": idx,
            "channel_name": key,
            "wavelength_um": wl,
            "reference_channel": False,
            "affine_zyx_um": np.asarray(affine, np.float64).tolist(),
            "status": "affine_estimated",
            "diagnostics": diag,
        }
    return {
        "reference_wavelength_um": ref_wl,
        "voxel_size_zyx_um": [float(v) for v in spacing],
        "estimator": "bead_mutual_nn_affine",
        "channels": channels,
    }


def run_chromatic_calibration(
    datastore,
    channel_volumes: Sequence[np.ndarray],
    emission_wavelengths_um: Sequence[float],
    *,
    deconvolve: bool = True,
    detection_threshold: float = 0.5,
    psf_model: str = "vectorial",
    ufish_model: str = "simfish",
    ufish_checkpoint=None,
    voxel_size_zyx_um=None,
) -> dict:
    """Full calibration: optional RLGC decon of the bead stacks, affine
    estimation, write-back to the datastore
    (reference `run_chromatic_calibration`; like the reference, the decon
    PSFs are VECTORIAL per channel by default and bead detection runs the
    U-FISH predictor when a checkpoint is available, `chromatic.py:468-487`
    — the DoG fallback otherwise).

    ``voxel_size_zyx_um`` overrides the datastore's experiment voxel size
    when the bead acquisition was taken at a different spacing (the
    reference parses it from the bead OME-TIFF, `chromatic.py:100-169`).
    """
    from ..models.psf import make_channel_psfs
    from ..models.ufish import get_predictor
    from ..ops.rlgc import rlgc

    if voxel_size_zyx_um is None:
        voxel_size_zyx_um = datastore.voxel_size_zyx_um
    vols = [np.asarray(v, np.float32) for v in channel_volumes]
    if deconvolve:
        psfs = make_channel_psfs(
            emission_wavelengths_um,
            na=datastore.na or 1.35,
            ri=datastore.ri or 1.4,
            voxel_size_zyx_um=voxel_size_zyx_um,
            shape_zyx=(15, 15, 15),
            model=psf_model,
        )
        vols = [rlgc(v, psf, max_iters=30) for v, psf in zip(vols, psfs)]
    calibration = estimate_chromatic_affines(
        vols,
        emission_wavelengths_um,
        voxel_size_zyx_um=voxel_size_zyx_um,
        detection_threshold=detection_threshold,
        predictor=get_predictor(ufish_model, ufish_checkpoint),
    )
    datastore.save_chromatic_affine_transforms_zyx_um(calibration)
    return calibration


# ---------------------------------------------------------------- reference
# name-compatible helpers (`utils/chromatic.py` public surface)
def parse_csv_floats(value) -> "tuple[float, ...] | None":
    """Parse '1.0,2.0' strings / float sequences (reference
    `chromatic.py:25-45`)."""
    if value is None:
        return None
    if isinstance(value, str):
        return tuple(float(v.strip()) for v in value.split(",") if v.strip())
    return tuple(float(v) for v in value)


def load_bead_channel_stack(
    image_path,
    *,
    channel_axis=None,
    voxel_size_zyx_um=None,
    wavelengths_um=None,
):
    """Load an OME-TIFF bead acquisition as a (C, Z, Y, X) stack plus
    metadata (reference `chromatic.py:154-330`; the axis layout comes
    from the OME DimensionOrder — ``channel_axis`` is accepted for
    signature parity but the OME metadata is authoritative here)."""
    from .ometiff import read_ome_tiff_stack

    stack, spacing, wavelengths = read_ome_tiff_stack(image_path)
    spacing = tuple(float(v) for v in (voxel_size_zyx_um or spacing or (1, 1, 1)))
    wavelengths = wavelengths_um or wavelengths
    if wavelengths is None:
        raise ValueError(
            "Channel wavelengths are required to generate PSFs. Provide OME "
            "wavelength metadata or pass wavelengths_um."
        )
    meta = {
        "voxel_size_zyx_um": spacing,
        "wavelengths_um": tuple(float(w) for w in wavelengths),
    }
    return np.asarray(stack), meta


def detect_bead_centroids(
    image_zyx: np.ndarray,
    *,
    ufish_model=None,
    min_intensity_quantile: float = 0.5,
    max_beads=None,
    threshold: float = 0.5,
):
    """Bead centroid table for one channel (reference
    `chromatic.py:331-387` returns a DataFrame with z/y/x +
    sum_decon_pixels; detection runs the spot-probability predictor)."""
    import pandas as pd

    from ..models.ufish import get_predictor

    predictor = None
    if ufish_model is not None:
        predictor = get_predictor("simfish", ufish_model)
    centers = detect_beads(
        image_zyx,
        threshold=threshold,
        max_beads=int(max_beads) if max_beads else 5000,
        predictor=predictor,
    )
    vol = np.asarray(image_zyx, np.float32)
    sums = []
    for z, y, x in np.round(centers).astype(int):
        zl, zh = max(0, z - 2), min(vol.shape[0], z + 3)
        yl, yh = max(0, y - 2), min(vol.shape[1], y + 3)
        xl, xh = max(0, x - 2), min(vol.shape[2], x + 3)
        sums.append(float(vol[zl:zh, yl:yh, xl:xh].sum()))
    df = pd.DataFrame(
        {
            "z": centers[:, 0] if len(centers) else [],
            "y": centers[:, 1] if len(centers) else [],
            "x": centers[:, 2] if len(centers) else [],
            "sum_decon_pixels": sums,
        }
    )
    if not df.empty:
        floor = df["sum_decon_pixels"].quantile(float(min_intensity_quantile))
        df = df[df["sum_decon_pixels"] >= floor]
        df = df.sort_values("sum_decon_pixels", ascending=False)
        if max_beads is not None:
            df = df.head(int(max_beads))
    return df.reset_index(drop=True)


def deconvolve_channels(
    stack_czyx: np.ndarray,
    psfs,
    *,
    crop_yx: int = 2048,
    max_iters: int = 30,
) -> np.ndarray:
    """RLGC-deconvolve every channel of a (C, Z, Y, X) bead stack
    (reference `chromatic.py:389-433`)."""
    from ..ops.rlgc import chunked_rlgc

    if len(psfs) not in (1, stack_czyx.shape[0]):
        raise ValueError("Provide either one shared PSF or one PSF per channel.")
    out = []
    for idx, image in enumerate(stack_czyx):
        psf = psfs[0] if len(psfs) == 1 else psfs[idx]
        out.append(
            chunked_rlgc(
                np.asarray(image, np.float32),
                np.asarray(psf, np.float32),
                crop_yx=crop_yx,
                max_iters=max_iters,
            )
        )
    return np.stack(out, axis=0)


def generate_channel_psfs(
    *,
    num_z: int,
    voxel_size_zyx_um,
    wavelengths_um,
    na: float = 1.35,
    ri: float = 1.51,
    psf_nx: int = 51,
):
    """One vectorial PSF per channel (reference `chromatic.py:435-505`
    uses psfmodels; here :func:`merfish3d_tpu.models.psf.vectorial_psf`)."""
    from ..models.psf import make_channel_psfs

    nz = min(int(num_z) | 1, int(psf_nx) | 1)
    return list(
        make_channel_psfs(
            wavelengths_um,
            na=na,
            ri=ri,
            voxel_size_zyx_um=voxel_size_zyx_um,
            shape_zyx=(nz, int(psf_nx) | 1, int(psf_nx) | 1),
            model="vectorial",
        )
    )


def save_calibration_json(calibration: dict, output_path) -> None:
    """Write the calibration payload as JSON (reference
    `chromatic.py:729-749`)."""
    import json
    from pathlib import Path

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, "w") as handle:
        json.dump(calibration, handle, indent=2)
