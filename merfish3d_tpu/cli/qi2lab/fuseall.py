"""qi2lab-fuse: fuse registered tiles into the global frame
(mirrors `cli/qi2lab_microscopes/fuseall.py`: per-channel fusion)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def fuse_all_channels(datastore, verbose: int = 1) -> None:
    """Fuse the fiducial plus every readout bit into a (C, Z, Y, X) global
    volume using the stored per-tile global transforms."""
    from ...pipeline.stitching import _feather_weights, _tile_origin_um

    ds = datastore
    spacing = np.asarray(ds.voxel_size_zyx_um, dtype=np.float64)
    n_tiles = len(ds.tile_ids)
    n_bits = ds.num_bits

    origins = []
    for t in range(n_tiles):
        xf = ds.load_global_coord_xforms_um(t)
        if xf is None:
            origins.append(_tile_origin_um(ds, t))
        else:
            affine, origin, _ = xf
            origins.append(affine[:3, 3] + origin)
    sample = np.asarray(ds.load_local_registered_image(tile=0, round=0))
    shape_px = np.asarray(sample.shape)
    lo = np.min(origins, axis=0)
    hi = np.max(origins, axis=0) + shape_px * spacing
    out_shape = np.ceil((hi - lo) / spacing).astype(int)

    channels = []
    for c in range(1 + n_bits):
        acc = np.zeros(out_shape, np.float64)
        wacc = np.zeros(out_shape, np.float64)
        for t in range(n_tiles):
            if c == 0:
                img = np.asarray(ds.load_local_registered_image(tile=t, round=0), np.float32)
            else:
                img = ds.load_local_registered_image(tile=t, bit=c - 1)
                if img is None:
                    continue
                img = np.asarray(img, np.float32)
            start = np.round((origins[t] - lo) / spacing).astype(int)
            end = start + np.asarray(img.shape)
            w = _feather_weights(img.shape)
            acc[start[0]:end[0], start[1]:end[1], start[2]:end[2]] += img * w
            wacc[start[0]:end[0], start[1]:end[1], start[2]:end[2]] += w
        channels.append(
            np.clip(acc / np.maximum(wacc, 1e-9), 0, 65535).astype(np.uint16)
        )
        if verbose:
            print(f"fused channel {c}/{n_bits}")
    stack = np.stack(channels)
    ds.save_global_fiducial_image(
        stack, affine_zyx_um=np.eye(4), origin_zyx_um=lo, spacing_zyx_um=spacing,
        all_channels=True,
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-fuse")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--fiducial-only", action=argparse.BooleanOptionalAction, default=False)
    args = p.parse_args(argv)

    from ...datastore import qi2labDataStore
    from ...pipeline.stitching import fuse_global_registered

    ds = qi2labDataStore(args.datastore_path, validate=False)
    if args.fiducial_only:
        fuse_global_registered(ds)
    else:
        fuse_global_registered(ds)
        fuse_all_channels(ds)


if __name__ == "__main__":
    main()
