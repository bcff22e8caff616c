"""DataRegistration: per-tile preprocessing + registration orchestrator.

TPU-native reimplementation of the reference orchestrator
(`DataRegistration.py`, 2.4k LoC): per tile — RLGC deconvolution of the
round-1 fiducial (reference frame), staged phase-correlation registration
of every moving round, optional SOFIMA-equivalent residual flow, then
readout-bit deconvolution + spot-probability prediction + spot tables.

Parallelism: the reference spawns one OS process per GPU and partitions
rounds/bits statically (`_generate_registrations:2156-2173`,
`_apply_registration_to_bits:2306-2323`). Here rounds/bits are batched
device-side (``rlgc_batch`` vmaps the decon across volumes) and tiles are
the host-level unit of work; stage outputs are idempotent against the
datastore exactly like the reference (resume-by-scan,
`register_all_tiles:1399-1441`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from ..models.ufish import get_predictor
from ..ops.flow import SofimaRegistrationConfig, estimate_sofima_flow_field_xyz_px
from ..ops.registration import register_pair_to_fixed
from ..ops.rlgc import chunked_rlgc
from ..ops.warp import warp_affine


@dataclass(frozen=True)
class GlobalRegistrationConfig:
    """reference `GlobalRegistrationConfig:71-95`."""

    binning_zyx: tuple[int, int, int] = (3, 6, 6)
    transform_type: str = "translation"
    keep_axis_aligned: bool = True
    quality_threshold: float = 0.2


@dataclass(frozen=True)
class GlobalFusionConfig:
    """reference `GlobalFusionConfig:98-109`."""

    chunk_px: int = 512
    overlap_px: int = 64


class DataRegistration:
    """Tile-wise registration/preprocessing over a qi2lab datastore."""

    def __init__(
        self,
        datastore,
        *,
        decon_fiducial: bool = True,
        decon_readout: bool = True,
        overwrite: bool = False,
        deformable_registration: bool = False,
        save_all_fiducial_registered: bool = True,
        crop_yx_decon: int = 2048,
        ufish_model: str = "simfish",
        ufish_checkpoint=None,
        global_registration: bool = True,
        sofima_config: SofimaRegistrationConfig = SofimaRegistrationConfig(),
        global_registration_config: GlobalRegistrationConfig = GlobalRegistrationConfig(),
        global_fusion_config: GlobalFusionConfig = GlobalFusionConfig(),
        decon_max_iters: int = 40,
        verbose: int = 1,
    ):
        self._datastore = datastore
        self._decon_fiducial = decon_fiducial
        self._decon_readout = decon_readout
        self._overwrite = overwrite
        self._deformable = deformable_registration
        self._save_all_fiducial_registered = save_all_fiducial_registered
        self._crop_yx_decon = crop_yx_decon
        self._sofima_config = sofima_config
        self._global_registration = global_registration
        self._global_reg_config = global_registration_config
        self._fusion_config = global_fusion_config
        self._decon_max_iters = decon_max_iters
        self._verbose = verbose
        self._predictor = get_predictor(ufish_model, ufish_checkpoint)

    # ------------------------------------------------------------- helpers
    @property
    def _spacing(self) -> np.ndarray:
        return np.asarray(self._datastore.voxel_size_zyx_um, dtype=np.float32)

    def _psf_for_channel(self, psf_idx: int) -> Optional[np.ndarray]:
        psfs = self._datastore.channel_psfs
        if not psfs:
            return None
        return np.asarray(psfs[min(psf_idx, len(psfs) - 1)], np.float32)

    def _psf_idx_for_bit(self, tile_idx, bit_id) -> int:
        """<600 nm excitation → psf 1 else 2
        (reference `_apply_bits_on_gpu:833-836`)."""
        wl = self._datastore.load_local_wavelengths_um(tile=tile_idx, bit=bit_id)
        if wl is None:
            return 1
        return 1 if wl[0] < 0.600 else 2

    def _deconvolve(self, image: np.ndarray, psf: Optional[np.ndarray], seed: int) -> np.ndarray:
        if psf is None:
            return np.asarray(image, np.float32)
        return chunked_rlgc(
            np.asarray(image, np.float32),
            psf,
            crop_yx=self._crop_yx_decon,
            seed=seed,
            max_iters=self._decon_max_iters,
        )

    # ---------------------------------------------------------- resume scan
    def _has_valid_registered_image(self, tile_idx, round_idx) -> bool:
        img = self._datastore.load_local_registered_image(
            tile=tile_idx, round=round_idx, return_future=True
        )
        return img is not None

    def _is_tile_complete(self, tile_idx: int) -> bool:
        """reference `_is_tile_complete:1365-1397`."""
        ds = self._datastore
        for r in range(ds.num_rounds):
            if ds.load_local_round_transform_zyx_um(tile_idx, r) is None:
                return False
        for b_idx, bit_id in enumerate(ds.bit_ids):
            if ds.load_local_registered_image(tile=tile_idx, bit=b_idx, return_future=True) is None:
                return False
            if ds.load_local_feature_predictor_image(tile=tile_idx, bit=b_idx, return_future=True) is None:
                return False
        return True

    # ---------------------------------------------------------- public API
    def register_all_tiles(self) -> None:
        """Resume-aware loop over tiles (reference `register_all_tiles:1399-1441`)."""
        ds = self._datastore
        for tile_idx in range(len(ds.tile_ids)):
            if not self._overwrite and self._is_tile_complete(tile_idx):
                if self._verbose:
                    print(f"tile {tile_idx}: complete, skipping")
                continue
            self.register_one_tile(tile_idx)
        if self._global_registration:
            self.global_register()
        state = ds.datastore_state
        state.update({"LocalRegistered": True})
        ds.datastore_state = state

    def register_one_tile(self, tile_idx: int) -> None:
        self._generate_registrations(tile_idx)
        self._apply_registration_to_bits(tile_idx)

    # ------------------------------------------------------ fiducial rounds
    def _generate_registrations(self, tile_idx: int) -> None:
        """Round-1 decon as reference + per-round staged registration
        (+ optional deformable flow)
        (reference `_generate_registrations:2096-2289`)."""
        ds = self._datastore
        fid_psf = self._psf_for_channel(0) if self._decon_fiducial else None

        ref_raw = np.asarray(
            ds.load_local_corrected_image(tile=tile_idx, round=0), np.float32
        )
        reference = self._deconvolve(ref_raw, fid_psf, seed=42 + tile_idx)
        ds.save_local_registered_image(
            np.clip(reference, 0, 65535).astype(np.uint16),
            tile=tile_idx,
            round=0,
            deconvolution=self._decon_fiducial,
        )
        ds.save_local_round_transform_zyx_um(np.eye(4), tile=tile_idx, round=0)

        # batch-deconvolve all moving rounds in one vmapped program
        # (rounds are independent given the round-1 reference)
        moving_raws = None
        n_moving = ds.num_rounds - 1
        if n_moving > 0:
            moving_raws = np.stack(
                [
                    np.asarray(
                        ds.load_local_corrected_image(tile=tile_idx, round=r),
                        np.float32,
                    )
                    for r in range(1, ds.num_rounds)
                ]
            )
            if fid_psf is not None and moving_raws.shape[2] <= self._crop_yx_decon:
                from ..ops.rlgc import rlgc_batch

                moving_decons = rlgc_batch(
                    moving_raws, fid_psf, seed=42 + tile_idx + 1000,
                    max_iters=self._decon_max_iters,
                )
            else:
                moving_decons = np.stack(
                    [
                        self._deconvolve(
                            moving_raws[i], fid_psf,
                            seed=42 + tile_idx + (i + 1) * 1000,
                        )
                        for i in range(n_moving)
                    ]
                )

        for round_idx in range(1, ds.num_rounds):
            moving = moving_decons[round_idx - 1]
            transform = register_pair_to_fixed(
                reference, moving, spacing_zyx_um=self._spacing
            )
            ds.save_local_round_transform_zyx_um(
                transform, tile=tile_idx, round=round_idx
            )
            warped = None
            if self._deformable or self._save_all_fiducial_registered:
                warped = warp_affine(
                    moving,
                    transform_zyx_um=transform,
                    spacing_zyx_um=self._spacing,
                    reference_shape=reference.shape,
                )
            if self._save_all_fiducial_registered and warped is not None:
                ds.save_local_registered_image(
                    np.clip(warped, 0, 65535).astype(np.uint16),
                    tile=tile_idx,
                    round=round_idx,
                    deconvolution=self._decon_fiducial,
                )
            if self._deformable and warped is not None:
                flow, meta = estimate_sofima_flow_field_xyz_px(
                    reference, warped, self._sofima_config
                )
                ds.save_local_sofima_flow_field(
                    flow,
                    tile=tile_idx,
                    round=round_idx,
                    map_stride_zyx_px=meta["map_stride_zyx_px"],
                    map_box_start_xyz_px=meta["map_box_start_xyz_px"],
                    map_box_size_xyz_px=meta["map_box_size_xyz_px"],
                    reference_shape_zyx_px=meta["reference_shape_zyx_px"],
                    moving_shape_zyx_px=meta["moving_shape_zyx_px"],
                    sofima_status=meta["sofima_status"],
                    valid_flow_vectors=meta["valid_flow_vectors"],
                )

    # ----------------------------------------------------------- readout bits
    def _apply_registration_to_bits(
        self, tile_idx: int, bit_batch_size: int = 8
    ) -> None:
        """Per-bit decon + spot-probability prediction + spot table
        (reference `_apply_bits_on_gpu:790-1007`). Bits stay UNWARPED on
        disk; decode applies the composed transforms lazily.

        TPU-first: bits sharing a PSF are deconvolved as one vmapped batch
        (`rlgc_batch`) instead of the reference's per-bit GPU loop, bounded
        by ``bit_batch_size`` volumes in HBM at once."""
        from ..ops.rlgc import rlgc_batch

        ds = self._datastore
        pending = []
        for bit_idx, bit_id in enumerate(ds.bit_ids):
            if not self._overwrite and (
                ds.load_local_registered_image(
                    tile=tile_idx, bit=bit_idx, return_future=True
                )
                is not None
                and ds.load_local_feature_predictor_image(
                    tile=tile_idx, bit=bit_idx, return_future=True
                )
                is not None
            ):
                continue
            pending.append((bit_idx, bit_id))
        if not pending:
            return

        # group bits by PSF index so each group vmaps over one shared PSF
        groups: dict[int, list[tuple[int, str]]] = {}
        for bit_idx, bit_id in pending:
            psf_idx = self._psf_idx_for_bit(tile_idx, bit_id) if self._decon_readout else -1
            groups.setdefault(psf_idx, []).append((bit_idx, bit_id))

        for psf_idx, members in groups.items():
            psf = self._psf_for_channel(psf_idx) if psf_idx >= 0 else None
            for start in range(0, len(members), bit_batch_size):
                chunk = members[start : start + bit_batch_size]
                raws = np.stack(
                    [
                        np.asarray(
                            ds.load_local_corrected_image(tile=tile_idx, bit=b),
                            np.float32,
                        )
                        for b, _ in chunk
                    ]
                )
                if psf is None:
                    decons = raws
                elif len(chunk) > 1 and raws[0].shape[1] <= self._crop_yx_decon:
                    decons = rlgc_batch(
                        raws, psf, seed=7 + tile_idx * 100 + chunk[0][0],
                        max_iters=self._decon_max_iters,
                    )
                else:
                    decons = np.stack(
                        [
                            self._deconvolve(
                                raws[i], psf, seed=7 + tile_idx * 100 + chunk[i][0]
                            )
                            for i in range(len(chunk))
                        ]
                    )
                probs = (
                    self._predictor.predict_batch(decons)
                    if hasattr(self._predictor, "predict_batch")
                    else np.stack([self._predictor.predict(d) for d in decons])
                )
                for i, (bit_idx, _bit_id) in enumerate(chunk):
                    ds.save_local_registered_image(
                        np.clip(decons[i], 0, 65535).astype(np.uint16),
                        tile=tile_idx,
                        bit=bit_idx,
                        deconvolution=self._decon_readout,
                    )
                    ds.save_local_feature_predictor_image(
                        probs[i], tile=tile_idx, bit=bit_idx
                    )
                    spots = _spot_table_from_probability(decons[i], probs[i])
                    ds.save_local_feature_predictor_spots(
                        spots, tile=tile_idx, bit=bit_idx
                    )

    # ------------------------------------------------------------- global
    def global_register(self) -> None:
        from .stitching import global_register

        global_register(
            self._datastore,
            config=self._global_reg_config,
            fusion_config=self._fusion_config,
            verbose=self._verbose,
        )

    def fuse_global_registered(self) -> None:
        from .stitching import fuse_global_registered

        fuse_global_registered(
            self._datastore, config=self._fusion_config, verbose=self._verbose
        )


def _spot_table_from_probability(
    decon: np.ndarray,
    prob: np.ndarray,
    threshold: float = 0.5,
    roi_zyx: tuple[int, int, int] = (7, 5, 5),
    max_spots: int = 20000,
) -> pd.DataFrame:
    """Local-maxima spot localizations with ROI intensity sums
    (reference `_apply_bits_on_gpu:929-989`: U-FISH spot list + 7x5x5 ROI
    sums over the decon image)."""
    import scipy.ndimage

    # maxima on the intensity image (the sigmoid probability saturates into
    # plateaus over bright spots), gated by the probability map
    peaks = (decon == scipy.ndimage.maximum_filter(decon, size=3)) & (
        prob > threshold
    )
    zs, ys, xs = np.nonzero(peaks)
    if len(zs) > max_spots:
        order = np.argsort(prob[zs, ys, xs])[::-1][:max_spots]
        zs, ys, xs = zs[order], ys[order], xs[order]
    rz, ry, rx = (r // 2 for r in roi_zyx)
    sums = np.empty(len(zs), np.float64)
    for i, (z, y, x) in enumerate(zip(zs, ys, xs)):
        sums[i] = decon[
            max(0, z - rz) : z + rz + 1,
            max(0, y - ry) : y + ry + 1,
            max(0, x - rx) : x + rx + 1,
        ].sum()
    return pd.DataFrame(
        {
            "z": zs.astype(np.float64),
            "y": ys.astype(np.float64),
            "x": xs.astype(np.float64),
            "probability": prob[zs, ys, xs].astype(np.float64),
            "roi_sum": sums,
        }
    )
