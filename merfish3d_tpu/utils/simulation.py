"""Synthetic MERFISH experiment generation.

Hermetic stand-in for the statphysbio simulation datasets (reference
`cli/statphysbio_simulation/convert_simulation_to_experiment.py` /
`convert_to_datastore.py`): generates a ground-truth spot table, renders
per-bit readout volumes through a Gaussian PSF with Poisson noise, and
populates a qi2lab datastore ready for decoding (identity registration).
Used by the E2E regression/benchmark harness (SURVEY.md §4.4) since the
~1 GB reference datasets cannot be downloaded in a zero-egress environment.
"""

from __future__ import annotations

from pathlib import Path
import numpy as np
import pandas as pd

from ..datastore import qi2labDataStore


def make_mhd4_codebook(
    n_genes: int = 24, n_bits: int = 16, n_blanks: int = 4, seed: int = 0
) -> pd.DataFrame:
    """Random 4-on-bit codebook with pairwise Hamming distance >= 4,
    including blank codewords."""
    rng = np.random.default_rng(seed)
    words: list[np.ndarray] = []
    attempts = 0
    while len(words) < n_genes + n_blanks and attempts < 100000:
        attempts += 1
        w = np.zeros(n_bits, np.int64)
        w[rng.choice(n_bits, 4, replace=False)] = 1
        if all(np.sum(np.abs(w - u)) >= 4 for u in words):
            words.append(w)
    if len(words) < n_genes + n_blanks:
        raise ValueError("could not build codebook; reduce n_genes/n_blanks")
    gene_ids = [f"gene{i:03d}" for i in range(n_genes)] + [
        f"blank{i:02d}" for i in range(n_blanks)
    ]
    data = {"gene_id": gene_ids}
    mat = np.stack(words)
    for b in range(n_bits):
        data[f"bit{b + 1:02d}"] = mat[:, b]
    return pd.DataFrame(data)


def _render_bit_volume(
    shape, spots_zyx, amplitudes, sigma_zyx=(1.4, 1.4, 1.4)
) -> np.ndarray:
    """Sum of Gaussians at continuous positions (analytic rendering)."""
    vol = np.zeros(shape, np.float64)
    sz, sy, sx = sigma_zyx
    r = 5
    for (z, y, x), amp in zip(spots_zyx, amplitudes):
        z0, y0, x0 = int(round(z)), int(round(y)), int(round(x))
        zl, zh = max(0, z0 - r), min(shape[0], z0 + r + 1)
        yl, yh = max(0, y0 - r), min(shape[1], y0 + r + 1)
        xl, xh = max(0, x0 - r), min(shape[2], x0 + r + 1)
        zz, yy, xx = np.meshgrid(
            np.arange(zl, zh), np.arange(yl, yh), np.arange(xl, xh), indexing="ij"
        )
        vol[zl:zh, yl:yh, xl:xh] += amp * np.exp(
            -((zz - z) ** 2) / (2 * sz**2)
            - ((yy - y) ** 2) / (2 * sy**2)
            - ((xx - x) ** 2) / (2 * sx**2)
        )
    return vol


def generate_synthetic_experiment(
    datastore_path: Path,
    *,
    n_genes: int = 24,
    n_blanks: int = 4,
    n_bits: int = 16,
    shape: tuple[int, int, int] = (12, 128, 128),
    n_spots: int = 150,
    voxel_size_zyx_um: tuple[float, float, float] = (0.315, 0.098, 0.098),
    spot_amplitude: tuple[float, float] = (800.0, 2000.0),
    background: float = 40.0,
    seed: int = 0,
    n_tiles: int = 1,
    tile_offset_px: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> tuple[qi2labDataStore, pd.DataFrame]:
    """Create a populated datastore (corrected + decon + unit feature
    predictor, identity registration) and the ground-truth spots table."""
    rng = np.random.default_rng(seed)
    codebook = make_mhd4_codebook(n_genes, n_bits, n_blanks, seed=seed)
    matrix = codebook.iloc[:, 1:].to_numpy(dtype=np.float64)

    ds = qi2labDataStore(datastore_path)
    ds.channels_in_data = ["fiducial", "readout1", "readout2"]
    ds.num_tiles = n_tiles
    ds.microscope_type = "3D"
    ds.tile_overlap = 0.2
    ds.e_per_ADU = 1.0
    ds.na = 1.35
    ds.ri = 1.4
    ds.binning = 1
    ds.voxel_size_zyx_um = list(voxel_size_zyx_um)
    # real channel PSFs: DataRegistration(decon_readout=True) must
    # actually deconvolve on this store (it silently skipped decon when
    # no PSFs were present — the e2e bench was not measuring RLGC)
    from ..models.psf import make_channel_psfs

    ds.channel_psfs = make_channel_psfs(
        [0.520, 0.590, 0.670],
        na=ds.na,
        ri=ds.ri,
        voxel_size_zyx_um=voxel_size_zyx_um,
        shape_zyx=(min(11, shape[0] | 1), 11, 11),
    )
    n_rounds = n_bits // 2
    eo = np.column_stack(
        [
            np.arange(1, n_rounds + 1),
            np.arange(1, n_bits + 1, 2),
            np.arange(2, n_bits + 1, 2),
        ]
    )
    ds.experiment_order = eo
    ds.codebook = codebook
    state = ds.datastore_state
    state.update({"Calibrations": True})
    ds.datastore_state = state

    gt_rows = []
    spacing = np.asarray(voxel_size_zyx_um)
    offsets_px = [
        np.asarray(tile_offset_px) * tile_idx for tile_idx in range(n_tiles)
    ]
    # one GLOBAL field of spots and fiducial beads; each tile images the
    # portion inside its bounds, so tile overlaps share real content (the
    # registration/dedup contract)
    extent_px = np.asarray(shape, np.float64) + (
        offsets_px[-1] if n_tiles > 1 else 0.0
    )
    margin = 8
    total_spots = n_spots * n_tiles
    global_spots = np.column_stack(
        [
            rng.uniform(2, extent_px[0] - 2, total_spots),
            rng.uniform(margin, extent_px[1] - margin, total_spots),
            rng.uniform(margin, extent_px[2] - margin, total_spots),
        ]
    )
    global_genes = rng.integers(0, n_genes, total_spots)  # never blanks
    global_amps = rng.uniform(*spot_amplitude, total_spots)
    n_beads = 60 * n_tiles
    global_beads = np.column_stack(
        [
            rng.uniform(1, extent_px[0] - 1, n_beads),
            rng.uniform(4, extent_px[1] - 4, n_beads),
            rng.uniform(4, extent_px[2] - 4, n_beads),
        ]
    )
    bead_amps = rng.uniform(500, 1500, n_beads)

    for s_idx in range(total_spots):
        z, y, x = global_spots[s_idx]
        gt_rows.append(
            {
                "gene_id": codebook["gene_id"].iloc[global_genes[s_idx]],
                "tile_idx": -1,
                "z": z,
                "y": y,
                "x": x,
                "global_z": z * spacing[0],
                "global_y": y * spacing[1],
                "global_x": x * spacing[2],
            }
        )

    for tile_idx in range(n_tiles):
        ds.initialize_tile(tile_idx)
        offset_px = offsets_px[tile_idx]
        origin = offset_px * spacing
        local_spots = global_spots - offset_px
        in_tile = np.all(
            (local_spots > -5) & (local_spots < np.asarray(shape) + 5), axis=1
        )
        spots = local_spots[in_tile]
        genes = global_genes[in_tile]
        amps = global_amps[in_tile]

        local_beads = global_beads - offset_px
        bead_in = np.all(
            (local_beads > -5) & (local_beads < np.asarray(shape) + 5), axis=1
        )
        # fiducial rounds: shared bead field, identity registration
        fid = _render_bit_volume(shape, local_beads[bead_in], bead_amps[bead_in])
        for r in range(n_rounds):
            noisy = rng.poisson(fid + background).astype(np.uint16)
            ds.save_local_corrected_image(noisy, tile=tile_idx, round=r, psf_idx=0)
            ds.save_local_stage_position_zyx_um(origin, tile=tile_idx, round=r)
            ds.save_local_wavelengths_um((0.488, 0.520), tile=tile_idx, round=r)
            ds.save_local_registered_image(noisy, tile=tile_idx, round=r)
            ds.save_local_round_transform_zyx_um(np.eye(4), tile=tile_idx, round=r)

        for b in range(n_bits):
            on = matrix[genes, b] > 0
            vol = _render_bit_volume(shape, spots[on], amps[on])
            noisy = rng.poisson(vol + background).astype(np.uint16)
            ds.save_local_corrected_image(noisy, tile=tile_idx, bit=b, psf_idx=1)
            ds.save_local_wavelengths_um(
                (0.561, 0.590) if b % 2 == 0 else (0.635, 0.670),
                tile=tile_idx,
                bit=b,
            )
            # identity "registration": decon data = corrected (no decon here;
            # RLGC is exercised separately) and a unit probability map
            ds.save_local_registered_image(noisy, tile=tile_idx, bit=b)
            ds.save_local_feature_predictor_image(
                np.ones(shape, np.float32), tile=tile_idx, bit=b
            )
            ds.save_local_feature_predictor_spots(
                pd.DataFrame(columns=["z", "y", "x", "sum_prob_7x5x5"]),
                tile=tile_idx,
                bit=b,
            )
        state = ds.datastore_state
        state.update({"Corrected": True, "LocalRegistered": True})
        ds.datastore_state = state

    gt = pd.DataFrame(gt_rows)
    return ds, gt
