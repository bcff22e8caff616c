"""qi2lab-datastore: raw acquisition → qi2lab datastore.

Mirrors `cli/qi2lab_microscopes/create_datastore.py:1-763` (raw →
datastore incl. hot-pixel correction and theoretical PSF generation).
Microscope-specific readers (NDTIFF etc.) require tifffile/ndstorage which
are not in this environment; this command consumes the generic raw layout
(`metadata.json` + per-tile npy/tif stacks, see sim-convert) and applies
the same corrections.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def create_datastore(
    raw_dir: Path,
    output_dir: Path,
    *,
    hotpixel_correction: bool = True,
    hot_pixel_threshold: float = 375.0,
    psf_model: str = "gaussian",
):
    from ...datastore import qi2labDataStore
    from ...models.psf import make_channel_psfs
    from ...ops.filters import replace_hot_pixels
    from ...utils.dataio import load_stack

    raw_dir = Path(raw_dir)
    meta = json.loads((raw_dir / "metadata.json").read_text())
    ds = qi2labDataStore(Path(output_dir) / "qi2labdatastore")
    ds.channels_in_data = meta.get(
        "channels_in_data", ["fiducial", "readout1", "readout2"]
    )
    ds.num_tiles = int(meta["n_tiles"])
    ds.microscope_type = meta.get("microscope_type", "3D")
    ds.camera_model = meta.get("camera_model", "unknown")
    ds.tile_overlap = float(meta.get("tile_overlap", 0.2))
    ds.e_per_ADU = float(meta.get("e_per_ADU", 1.0))
    ds.na = float(meta.get("na", 1.35))
    ds.ri = float(meta.get("ri", 1.4))
    ds.binning = int(meta.get("binning", 1))
    ds.voxel_size_zyx_um = meta["voxel_size_zyx_um"]
    ds.codebook = raw_dir / "codebook.csv"
    ds.experiment_order = raw_dir / "exp_order.csv"

    noise_map = None
    noise_path = raw_dir / "noise_map.npy"
    if noise_path.exists():
        noise_map = np.load(noise_path)
        ds.noise_map = noise_map

    wavelengths = [meta["fiducial_wavelengths_um"][1]] + sorted(
        {tuple(w)[1] for w in meta["bit_wavelengths_um"]}
    )
    ds.channel_psfs = make_channel_psfs(
        wavelengths,
        na=ds.na,
        ri=ds.ri,
        voxel_size_zyx_um=ds.voxel_size_zyx_um,
        shape_zyx=tuple(meta.get("psf_shape_zyx", (15, 15, 15))),
        model=psf_model,
    )
    state = ds.datastore_state
    state.update({"Calibrations": True})
    ds.datastore_state = state

    def correct(img):
        if hotpixel_correction and noise_map is not None:
            return replace_hot_pixels(noise_map, img, threshold=hot_pixel_threshold)
        return np.asarray(img, np.uint16)

    stage_positions = meta.get("stage_positions_zyx_um")
    for tile_idx in range(int(meta["n_tiles"])):
        tdir = raw_dir / f"tile{tile_idx:04d}"
        ds.initialize_tile(tile_idx)
        stage = (
            stage_positions[tile_idx] if stage_positions else [0.0, 0.0, 0.0]
        )
        for r in range(int(meta["n_rounds"])):
            for ext in (".npy", ".tif", ".tiff"):
                p = tdir / f"fiducial_round{r + 1:03d}{ext}"
                if p.exists():
                    break
            img = correct(load_stack(p))
            ds.save_local_corrected_image(
                img, tile=tile_idx, round=r, psf_idx=0,
                hotpixel_correction=hotpixel_correction,
            )
            ds.save_local_stage_position_zyx_um(stage, tile=tile_idx, round=r)
            ds.save_local_wavelengths_um(
                tuple(meta["fiducial_wavelengths_um"]), tile=tile_idx, round=r
            )
        for b in range(int(meta["n_bits"])):
            for ext in (".npy", ".tif", ".tiff"):
                p = tdir / f"bit{b + 1:03d}{ext}"
                if p.exists():
                    break
            img = correct(load_stack(p))
            wl = tuple(meta["bit_wavelengths_um"][b])
            ds.save_local_corrected_image(
                img, tile=tile_idx, bit=b,
                psf_idx=1 if wl[0] < 0.600 else 2,
                hotpixel_correction=hotpixel_correction,
            )
            ds.save_local_wavelengths_um(wl, tile=tile_idx, bit=b)
    state = ds.datastore_state
    state.update({"Corrected": True})
    ds.datastore_state = state
    return ds


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-datastore")
    p.add_argument("--raw-dir", required=True, type=Path)
    p.add_argument("--output-dir", required=True, type=Path)
    p.add_argument("--hotpixel-correction", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--hot-pixel-threshold", type=float, default=375.0)
    p.add_argument("--psf-model", choices=("gaussian", "born_wolf"), default="gaussian")
    args = p.parse_args(argv)
    create_datastore(
        args.raw_dir,
        args.output_dir,
        hotpixel_correction=args.hotpixel_correction,
        hot_pixel_threshold=args.hot_pixel_threshold,
        psf_model=args.psf_model,
    )


if __name__ == "__main__":
    main()
