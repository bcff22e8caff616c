"""Global tile registration + fusion.

Own implementation replacing multiview-stitcher + dask + cupy fusion
(reference `DataRegistration.global_register:1839-2006` /
`_fuse_global_registered_msims:1650-1837`, SURVEY.md §2.8):

1. overlap graph from stage positions,
2. pairwise phase correlation on the stage-predicted overlap regions of
   the round-1 registered fiducial volumes (the same registration kernel
   as local registration — `cucim_phase_correlation_registration` analog),
3. weighted least-squares resolution of per-tile global translations
   (anchor = tile 0; translation transform_type, matching
   `GlobalRegistrationConfig`),
4. feathered weighted-average fusion onto the global bounding box, written
   to the datastore with (affine, origin, spacing) attributes plus the
   Cellpose max-projection input.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..ops.phase_corr import phase_cross_correlation


def _tile_origin_um(datastore, tile_idx) -> np.ndarray:
    stage = datastore.load_local_stage_position_zyx_um(tile_idx, round=0)
    if stage is None:
        return np.zeros(3)
    return np.asarray(stage[0], dtype=np.float64)


def _load_fiducial(datastore, tile_idx) -> np.ndarray:
    img = datastore.load_local_registered_image(tile=tile_idx, round=0)
    if img is None:
        img = datastore.load_local_corrected_image(tile=tile_idx, round=0)
    return np.asarray(img, np.float32)


def _overlap_bounds(o_i, o_j, shape_px, spacing):
    """Pixel bounds of the overlap box in each tile's frame, or None."""
    size_um = np.asarray(shape_px) * spacing
    lo = np.maximum(o_i, o_j)
    hi = np.minimum(o_i + size_um, o_j + size_um)
    if np.any(hi - lo <= spacing * 4):
        return None
    lo_i = np.floor((lo - o_i) / spacing).astype(int)
    hi_i = np.ceil((hi - o_i) / spacing).astype(int)
    lo_j = np.floor((lo - o_j) / spacing).astype(int)
    hi_j = np.ceil((hi - o_j) / spacing).astype(int)
    return (lo_i, hi_i), (lo_j, hi_j)


def global_register(datastore, *, config=None, fusion_config=None, verbose=1):
    """Estimate + save per-tile global coordinate transforms, then fuse."""
    ds = datastore
    n_tiles = len(ds.tile_ids)
    spacing = np.asarray(ds.voxel_size_zyx_um, dtype=np.float64)

    if n_tiles == 1:
        # single-tile shortcut: identity transform (reference `:1877-1893`)
        origin = _tile_origin_um(ds, 0)
        ds.save_global_coord_xforms_um(
            0, affine_zyx_um=np.eye(4), origin_zyx_um=origin, spacing_zyx_um=spacing
        )
        fuse_global_registered(ds, config=fusion_config, verbose=verbose)
        return

    origins = [_tile_origin_um(ds, t) for t in range(n_tiles)]
    images = [_load_fiducial(ds, t) for t in range(n_tiles)]
    shape_px = images[0].shape

    # pairwise measurements: correction_j - correction_i (µm)
    rows, rhs, weights = [], [], []
    for i in range(n_tiles):
        for j in range(i + 1, n_tiles):
            ob = _overlap_bounds(origins[i], origins[j], shape_px, spacing)
            if ob is None:
                continue
            (lo_i, hi_i), (lo_j, hi_j) = ob
            sub_i = images[i][
                lo_i[0] : hi_i[0], lo_i[1] : hi_i[1], lo_i[2] : hi_i[2]
            ]
            sub_j = images[j][
                lo_j[0] : hi_j[0], lo_j[1] : hi_j[1], lo_j[2] : hi_j[2]
            ]
            shp = np.minimum(sub_i.shape, sub_j.shape)
            shp = (shp // 4) * 4
            if np.any(shp < 4):
                continue
            sub_i = sub_i[: shp[0], : shp[1], : shp[2]]
            sub_j = sub_j[: shp[0], : shp[1], : shp[2]]
            shift_px = np.asarray(
                phase_cross_correlation(
                    jnp.asarray(sub_i), jnp.asarray(sub_j), upsample_factor=10
                )
            )
            # quality: NCC after shift (cheap proxy: plain NCC of overlap)
            a = sub_i - sub_i.mean()
            b = sub_j - sub_j.mean()
            q = float(
                np.sum(a * b)
                / max(np.sqrt(np.sum(a * a) * np.sum(b * b)), 1e-9)
            )
            # if sub_j(x) = sub_i(x - δ) then push = -δ and tile j's stage
            # origin overshoots by δ: correction_j - correction_i = -δ·s =
            # push·s
            measured_um = shift_px * spacing
            row = np.zeros(3 * n_tiles)
            row_block = np.zeros((3, 3 * n_tiles))
            for ax in range(3):
                row_block[ax, 3 * j + ax] = 1.0
                row_block[ax, 3 * i + ax] = -1.0
            rows.append(row_block)
            rhs.append(measured_um)
            weights.append(max(q, 1e-3))
            if verbose > 1:
                print(f"pair ({i},{j}): shift_px={shift_px}, q={q:.3f}")

    corrections = np.zeros((n_tiles, 3))
    if rows:
        A = np.concatenate(rows, axis=0)
        b = np.concatenate(rhs, axis=0)
        w = np.repeat(np.asarray(weights), 3)
        # anchor tile 0
        A = A[:, 3:]
        sol, *_ = np.linalg.lstsq(A * w[:, None], b * w, rcond=None)
        corrections[1:] = sol.reshape(n_tiles - 1, 3)

    for t in range(n_tiles):
        affine = np.eye(4)
        affine[:3, 3] = corrections[t]
        ds.save_global_coord_xforms_um(
            t,
            affine_zyx_um=affine,
            origin_zyx_um=origins[t],
            spacing_zyx_um=spacing,
        )
    state = ds.datastore_state
    state.update({"GlobalRegistered": True})
    ds.datastore_state = state
    fuse_global_registered(ds, config=fusion_config, verbose=verbose)


def _feather_weights(shape_px, edge: int = 64) -> np.ndarray:
    """Linear edge feathering (reference fusion overlap 64 px)."""
    w = np.ones(shape_px, np.float32)
    for ax, n in enumerate(shape_px):
        ramp = np.minimum(np.arange(n) + 1, np.arange(n)[::-1] + 1).astype(
            np.float32
        )
        ramp = np.minimum(ramp / max(min(edge, n // 2), 1), 1.0)
        shape = [1, 1, 1]
        shape[ax] = n
        w = w * ramp.reshape(shape)
    return w


def fuse_global_registered(datastore, *, config=None, verbose=1):
    """Feathered weighted-average fusion of round-1 fiducials onto the
    global bounding box; writes the fused OME-Zarr + global attrs + the
    Cellpose max-projection (reference `_fuse_global_registered_msims`)."""
    ds = datastore
    n_tiles = len(ds.tile_ids)
    spacing = np.asarray(ds.voxel_size_zyx_um, dtype=np.float64)
    overlap_px = getattr(config, "overlap_px", 64) if config else 64

    tiles, global_origins = [], []
    for t in range(n_tiles):
        img = _load_fiducial(ds, t)
        xf = ds.load_global_coord_xforms_um(t)
        if xf is None:
            origin = _tile_origin_um(ds, t)
            affine = np.eye(4)
        else:
            affine, origin, _ = xf
        tiles.append(img)
        global_origins.append(affine[:3, 3] + origin)

    shape_px = np.asarray(tiles[0].shape)
    lo = np.min(global_origins, axis=0)
    hi = np.max(global_origins, axis=0) + shape_px * spacing
    out_shape = np.ceil((hi - lo) / spacing).astype(int)

    acc = np.zeros(out_shape, np.float64)
    wacc = np.zeros(out_shape, np.float64)
    for img, origin in zip(tiles, global_origins):
        start = np.round((origin - lo) / spacing).astype(int)
        end = start + np.asarray(img.shape)
        w = _feather_weights(img.shape, edge=overlap_px)
        acc[start[0] : end[0], start[1] : end[1], start[2] : end[2]] += img * w
        wacc[start[0] : end[0], start[1] : end[1], start[2] : end[2]] += w
    fused = (acc / np.maximum(wacc, 1e-9)).astype(np.float32)
    fused_u16 = np.clip(fused, 0, 65535).astype(np.uint16)

    ds.save_global_fiducial_image(
        fused_u16,
        affine_zyx_um=np.eye(4),
        origin_zyx_um=lo,
        spacing_zyx_um=spacing,
    )
    if getattr(config, "create_max_proj_tiff", True) if config else True:
        # Cellpose input artifact, as the reference writes after fusion
        # (`DataRegistration.py:1786-1825`).
        from ..utils.ometiff import write_ome_tiff_2d

        write_ome_tiff_2d(
            Path(ds._datastore_path)
            / "segmentation" / "cellpose" / "fiducial_max_projection.ome.tiff",
            np.max(fused_u16, axis=0),
            spacing_yx_um=(spacing[1], spacing[2]),
        )
    state = ds.datastore_state
    state.update({"GlobalRegistered": True, "Fused": True})
    ds.datastore_state = state
    return fused_u16
