"""DataRegistration: per-tile preprocessing + registration orchestrator.

TPU-native reimplementation of the reference orchestrator
(`DataRegistration.py`, 2.4k LoC): per tile — RLGC deconvolution of the
round-1 fiducial (reference frame), staged phase-correlation registration
of every moving round, optional SOFIMA-equivalent residual flow, then
readout-bit deconvolution + spot-probability prediction + spot tables.

Parallelism: the reference spawns one OS process per GPU and partitions
rounds/bits statically (`_generate_registrations:2156-2173`,
`_apply_registration_to_bits:2306-2323`). Here rounds/bits are batched
device-side in bounded groups (``rlgc_batch`` scans the decon across
volumes, ``round_batch_size``/``bit_batch_size`` cap HBM), and with >1
chip visible, tiles fan out across devices on per-device host threads
(compute-follows-data via ``jax.default_device``; disjoint datastore
paths make writes race-free, same structural design as the reference's
per-GPU workers). Stage outputs are idempotent against the datastore
exactly like the reference (resume-by-scan, `register_all_tiles:1399-1441`),
with shape-validated completeness checks
(`_validate_core_image_shape:2100-2144`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..models.ufish import get_predictor
from ..ops.flow import SofimaRegistrationConfig, estimate_sofima_flow_field_xyz_px
from ..ops.registration import register_rounds_to_fixed
from ..ops.rlgc import chunked_rlgc
from ..utils import profiling


@jax.jit
def _warped_to_u16(warped_f32):
    """Persisted form of a warped fiducial stack — cast on DEVICE so the
    readback moves half the bytes (the datastore stores uint16 anyway)."""
    return jnp.clip(warped_f32, 0.0, 65535.0).astype(jnp.uint16)


@dataclass(frozen=True)
class GlobalRegistrationConfig:
    """reference `GlobalRegistrationConfig:71-95`."""

    binning_zyx: tuple[int, int, int] = (3, 6, 6)
    transform_type: str = "translation"
    keep_axis_aligned: bool = True
    quality_threshold: float = 0.2
    diagnostics: bool = False  # `[multiview-registration]` channel

    def registration_binning(self) -> dict[str, int]:
        """Binning keyed by spatial dimension name (reference
        `GlobalRegistrationConfig.registration_binning:88-95`)."""
        return {
            "z": int(self.binning_zyx[0]),
            "y": int(self.binning_zyx[1]),
            "x": int(self.binning_zyx[2]),
        }


@dataclass(frozen=True)
class GlobalFusionConfig:
    """reference `GlobalFusionConfig:98-109`. Fusion streams chunk-by-chunk
    directly into the fused zarr; ``tile_cache_tiles`` bounds how many
    loaded tiles are held in host RAM during the pass."""

    chunk_px: int = 512
    overlap_px: int = 64
    tile_cache_tiles: int = 4


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
        crop_yx_decon: "int | None" = None,  # None = static HBM-budget auto
        ufish_model: str = "simfish",
        ufish_checkpoint=None,
        global_registration: bool = True,
        sofima_config: SofimaRegistrationConfig = SofimaRegistrationConfig(),
        global_registration_config: GlobalRegistrationConfig = GlobalRegistrationConfig(),
        global_fusion_config: GlobalFusionConfig = GlobalFusionConfig(),
        decon_max_iters: int = 40,
        round_batch_size: int = 4,
        num_devices: int = 0,
        registration_diagnostics: bool = False,
        verbose: int = 1,
        device_cache=None,
        persist: str = "sync",
    ):
        """``device_cache``: optional :class:`~.handoff.TileDeviceCache`;
        when set, each tile's (decon, probability) readout intermediates
        stay HBM-resident for a same-process decoder while persistence
        proceeds write-behind. ``persist``: ``"sync"`` drains all datastore
        writes before each stage returns (reference behavior — its stages
        communicate only through the datastore, `DataRegistration.py:461`);
        ``"deferred"`` queues the readout-bit image writes (the ~270 MB/tile
        device→host payload) on a background drain thread the caller
        flushes via :meth:`drain_persistence`, keeping the decode critical
        path off the link. ``"minimal"`` (requires ``device_cache``) is
        deferred persistence with the readout payload shrunk to what
        downstream consumers actually need: the u8 probability map crosses
        the link sparse-encoded (`ops/sparse_io.py`; spot maps are mostly
        exact zeros) and the decon u16 volume is NOT re-persisted — the
        same-process decoder consumes it from the device cache, and a
        later resume recomputes it (the registration resume scan treats
        the tile as incomplete). Spot tables stay exact: decon values are
        read back at the dilated probability support, which covers every
        ROI voxel (`tests/test_sparse_io.py`)."""
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
        self._round_batch_size = max(1, int(round_batch_size))
        self._num_devices = int(num_devices)  # 0 = all visible devices
        self._diagnostics = bool(registration_diagnostics)
        self._verbose = verbose
        self._tile_id: Optional[str] = None
        self._predictor = get_predictor(ufish_model, ufish_checkpoint)
        self._device_cache = device_cache
        if persist not in ("sync", "deferred", "minimal"):
            raise ValueError(
                f"persist must be 'sync', 'deferred' or 'minimal', got {persist!r}"
            )
        if persist == "minimal" and device_cache is None:
            raise ValueError(
                "persist='minimal' skips re-persisting decon volumes; a "
                "device_cache is required so a same-process decoder can "
                "still consume them"
            )
        self._persist_mode = persist
        # Deferred/minimal writers are created EAGERLY: a lazy init racing
        # two fan-out threads would leave one thread's submitted jobs on a
        # writer drain_persistence never sees (ADVICE r4).
        self._persister = (
            None
            if persist == "sync"
            else self._make_deferred_writers()
        )
        if device_cache is not None:
            # a same-process decoder drains our deferred writes before any
            # zarr fallback on a cache miss (ADVICE r4 medium)
            device_cache.drain_hook = self.drain_persistence

    # ------------------------------------------------- deferred persistence
    def _persist_writer(self, kind: str):
        """Writer for image persistence: a fresh bounded write-behind
        queue in sync mode, a long-lived deferred queue otherwise (one per
        ``kind`` — ``"fid"`` fiducial images, which ``global_register``
        must see on disk, and ``"bits"`` readout intermediates, which a
        same-process decoder reads from the device cache instead). Jobs
        are per-bit (one u16 decon + u8 prob volume each). Returns
        ``(writer, owned)``; owned writers are drained by the caller."""
        from ..datastore.prefetch import BoundedWriter

        if self._persist_mode == "sync":
            return BoundedWriter(depth=2), True
        return self._persister[kind], False

    def _make_deferred_writers(self) -> dict:
        # depth bounds HBM pinned by queued per-bit jobs (~13 MB each,
        # so 64 ≈ 830 MB) while keeping submit non-blocking across a
        # whole tile's worth of bits
        from ..datastore.prefetch import BoundedWriter

        return {
            "fid": BoundedWriter(depth=16),
            "bits": BoundedWriter(depth=64),
        }

    def drain_persistence(self, kind: Optional[str] = None) -> None:
        """Block until every deferred datastore write has landed (no-op in
        sync mode). Call before handing the datastore to another process
        or before relying on on-disk readout intermediates."""
        if self._persister is not None:
            with profiling.section("reg_persist_drain"):
                for k, w in self._persister.items():
                    if kind is None or k == kind:
                        w.resume()
                        w.drain()

    def pause_persistence(self) -> None:
        """Gate the deferred writers between jobs: the half-duplex link
        serves one stream at a time, so a draining ~150 MB of
        intermediates starves a concurrent decode's small readbacks
        (measured: the decode device section tripled under drain
        contention). Pause before latency-critical device work, resume
        after; in-flight per-bit jobs (~13 MB) finish first."""
        if self._persister is not None:
            for w in self._persister.values():
                w.pause()

    def resume_persistence(self) -> None:
        if self._persister is not None:
            for w in self._persister.values():
                w.resume()

    def _persist_bit(self, decon_u16_dev, prob_u8_dev, tile_idx, bit_idx) -> None:
        """Writer-thread persistence of one readout bit: d2h of the
        device-resident (u16, u8) forms, zarr writes, and the U-FISH-style
        spot table — all off the register/decode critical path. In
        ``minimal`` mode the d2h crosses the link sparse-encoded and the
        decon zarr write is skipped (see the constructor docstring)."""
        ds = self._datastore
        if self._persist_mode == "minimal":
            decon_u16, prob_u8 = self._minimal_readback(
                decon_u16_dev, prob_u8_dev
            )
        else:
            nbytes = int(decon_u16_dev.size * 2 + prob_u8_dev.size)
            with profiling.section("reg_d2h_intermediates", nbytes=nbytes):
                decon_u16 = np.asarray(decon_u16_dev)
                prob_u8 = np.asarray(prob_u8_dev)
        predictor_kind = getattr(self._predictor, "kind", "cnn")
        predictor_name = getattr(self._predictor, "model_name", predictor_kind)
        with profiling.section("reg_zarr_write_bits"):
            if self._persist_mode != "minimal":
                ds.save_local_registered_image(
                    decon_u16,
                    tile=tile_idx,
                    bit=bit_idx,
                    deconvolution=self._decon_readout,
                )
            else:
                # a stale decon from an earlier sync run must not shadow
                # the skipped write (zarr-fallback readers would get it)
                ds.remove_local_registered_image(tile_idx, bit=bit_idx)
            ds.save_local_feature_predictor_image(
                prob_u8,
                tile=tile_idx,
                bit=bit_idx,
                model_name=predictor_name,
                extra_attributes={"predictor": predictor_kind,
                                  "persist": self._persist_mode},
            )
        with profiling.section("reg_spot_tables"):
            spots = _spot_table_from_probability(
                decon_u16.astype(np.float32),
                prob_u8.astype(np.float32) / np.float32(255.0),
                tile_idx=tile_idx,
                bit_idx=bit_idx,
                predictor=predictor_kind,
            )
            ds.save_local_feature_predictor_spots(
                spots, tile=tile_idx, bit=bit_idx
            )

    def _minimal_readback(self, decon_u16_dev, prob_u8_dev):
        """Sparse link transfer for minimal persistence: the u8 probability
        map as its nonzeros, the decon u16 values at the dilated
        probability support (exactly the voxels the spot-table ROI sums
        can touch — `ops/sparse_io.gather_at_dilated_support`). Either
        falls back to the dense transfer when the volume is too dense for
        the encoding to win."""
        from ..ops import sparse_io

        size = int(np.prod(prob_u8_dev.shape))
        counts = np.asarray(sparse_io.count_dilated_support(prob_u8_dev))
        n_prob, n_dil = int(counts[0]), int(counts[1])

        if n_prob > size // 4:  # 5 B/nonzero vs 1 B/voxel break-even ~20%
            with profiling.section("reg_d2h_intermediates", nbytes=size):
                prob_u8 = np.asarray(prob_u8_dev)
        else:
            cap = sparse_io._bucket(n_prob)
            idx, vals = sparse_io.gather_nonzero(prob_u8_dev, cap)
            with profiling.section("reg_d2h_intermediates", nbytes=cap * 5):
                idx, vals = np.asarray(idx), np.asarray(vals)
            prob_u8 = sparse_io.scatter_dense(
                prob_u8_dev.shape, np.uint8, idx, vals, n_prob
            )

        if n_dil > size // 3:  # 6 B/voxel vs 2 B/voxel break-even ~33%
            with profiling.section("reg_d2h_intermediates", nbytes=size * 2):
                decon_u16 = np.asarray(decon_u16_dev)
        else:
            cap = sparse_io._bucket(n_dil)
            idx, vals = sparse_io.gather_at_dilated_support(
                decon_u16_dev, prob_u8_dev, cap
            )
            with profiling.section("reg_d2h_intermediates", nbytes=cap * 6):
                idx, vals = np.asarray(idx), np.asarray(vals)
            decon_u16 = sparse_io.scatter_dense(
                decon_u16_dev.shape, np.uint16, idx, vals, n_dil
            )
        return decon_u16, prob_u8

    # -------------------------------------------------- reference accessors
    # (`DataRegistration.py:1120-1280`: datastore / dataset_path / tile_id /
    # perform_deformable_registration / overwrite_registered)
    @property
    def datastore(self):
        return self._datastore

    @property
    def dataset_path(self):
        return self._datastore.datastore_path

    @property
    def tile_id(self) -> Optional[str]:
        """Currently selected tile id (reference `tile_id:1166-1203`)."""
        return self._tile_id

    @tile_id.setter
    def tile_id(self, value) -> None:
        self._tile_id = self._datastore.tile_ids[self._tile_index(value)]

    def _tile_index(self, value) -> int:
        """Normalize an int index or str tile id to an index."""
        tile_ids = list(self._datastore.tile_ids)
        if isinstance(value, (int, np.integer)):
            if not 0 <= int(value) < len(tile_ids):
                raise ValueError(
                    f"tile index {value} out of range [0, {len(tile_ids)})"
                )
            return int(value)
        if value not in tile_ids:
            raise ValueError(f"unknown tile id {value!r}")
        return tile_ids.index(value)

    @property
    def perform_deformable_registration(self) -> bool:
        return self._deformable

    @perform_deformable_registration.setter
    def perform_deformable_registration(self, value: bool) -> None:
        self._deformable = bool(value)

    @property
    def overwrite_registered(self) -> bool:
        return self._overwrite

    @overwrite_registered.setter
    def overwrite_registered(self, value: bool) -> None:
        self._overwrite = bool(value)

    def apply_registration_to_one_tile(self, tile_id) -> None:
        """Apply the stored local transforms to one tile's readout bits
        without re-estimating fiducial registrations (reference
        `apply_registration_to_one_tile:1456-1464`)."""
        self.tile_id = tile_id
        self._apply_registration_to_bits(self._tile_index(tile_id))

    def _diag(self, stage: str, **fields) -> None:
        """Structured opt-in diagnostics channel (reference
        `_registration_diag:111-129` prints timestamped
        ``[registration-diagnostics]`` lines with shapes/elapsed)."""
        if not self._diagnostics:
            return
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        kv = " ".join(f"{k}={v}" for k, v in fields.items())
        print(f"[registration-diagnostics] {ts} stage={stage} {kv}", flush=True)

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
    def _core_shape(self, tile_idx) -> Optional[tuple[int, ...]]:
        """Expected volume shape for this tile = round-0 corrected shape."""
        return self._datastore.local_image_shape(
            tile_idx, round=0, image="corrected"
        )

    def _is_tile_complete(self, tile_idx: int) -> bool:
        """reference `_is_tile_complete:1365-1397` incl. shape validation
        (`_validate_core_image_shape:2100-2144`)."""
        ds = self._datastore
        core = self._core_shape(tile_idx)
        for r in range(ds.num_rounds):
            if ds.load_local_round_transform_zyx_um(tile_idx, r) is None:
                return False
        for b_idx, _bit_id in enumerate(ds.bit_ids):
            shape = ds.local_image_shape(tile_idx, bit=b_idx, image="registered")
            if shape is None or (core is not None and shape != core):
                return False
            pshape = ds.local_image_shape(
                tile_idx, bit=b_idx, image="feature_predictor"
            )
            if pshape is None or (core is not None and pshape != core):
                return False
        return True

    # ---------------------------------------------------------- public API
    def register_all_tiles(self) -> None:
        """Resume-aware loop over tiles (reference `register_all_tiles:1399-1441`).

        With >1 device visible, incomplete tiles fan out across devices on
        per-device host threads (the TPU equivalent of the reference's one
        worker process per GPU, `_generate_registrations:2156-2173`); each
        thread pins its jitted compute with ``jax.default_device`` and owns
        disjoint datastore paths."""
        ds = self._datastore
        pending = [
            t
            for t in range(len(ds.tile_ids))
            if self._overwrite or not self._is_tile_complete(t)
        ]
        if self._verbose:
            done = len(ds.tile_ids) - len(pending)
            if done:
                print(f"{done} tile(s) complete, skipping")

        import jax

        devices = jax.devices()
        if self._num_devices > 0:
            devices = devices[: self._num_devices]
        if len(devices) > 1 and len(pending) > 1:
            self._register_tiles_fanout(pending, devices)
        else:
            for tile_idx in pending:
                self.register_one_tile(tile_idx)
        if self._global_registration:
            state = ds.datastore_state
            if (
                not self._overwrite
                and not pending
                and state.get("GlobalRegistered")
                and state.get("Fused")
            ):
                # resume: every tile was already complete and the global
                # transforms + fused image are on disk — re-running the
                # stitch+fuse pass would recompute identical outputs
                # (minutes of link time at production geometry). The
                # reference re-enters this path explicitly via
                # `--global-registration-only` when a redo is wanted.
                if self._verbose:
                    print("global registration complete, skipping")
            else:
                self.global_register()
        state = ds.datastore_state
        state.update({"LocalRegistered": True})
        ds.datastore_state = state

    def _register_tiles_fanout(self, tile_indices, devices) -> None:
        """Work-stealing tile queue over per-device host threads.

        The first tile runs on the main thread to warm every jit trace
        cache (concurrent first-tracing of the same function from multiple
        threads is racy); subsequent tiles hit compiled code only."""
        import queue
        import threading

        import jax

        tile_indices = list(tile_indices)
        self.register_one_tile(tile_indices[0])
        tile_indices = tile_indices[1:]
        if not tile_indices:
            return

        q: queue.Queue = queue.Queue()
        for t in tile_indices:
            q.put(t)
        errors: list[tuple[int, BaseException]] = []
        lock = threading.Lock()

        stop = threading.Event()

        def worker(dev):
            while not stop.is_set():
                try:
                    t = q.get_nowait()
                except queue.Empty:
                    return
                t0 = time.perf_counter()
                try:
                    with jax.default_device(dev):
                        self.register_one_tile(t)
                    self._diag(
                        "tile-done", tile=t, device=str(dev),
                        elapsed=f"{time.perf_counter() - t0:.2f}s",
                    )
                except (KeyboardInterrupt, SystemExit) as e:
                    # fatal signals stop the whole fan-out, not just this tile
                    with lock:
                        errors.append((t, e))
                    stop.set()
                    return
                except Exception as e:  # aggregate, don't kill siblings
                    with lock:
                        errors.append((t, e))

        threads = [
            threading.Thread(target=worker, args=(d,), daemon=True)
            for d in devices
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errors:
            tiles = [t for t, _ in errors]
            raise RuntimeError(
                f"registration failed for tiles {tiles}"
            ) from errors[0][1]

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

        t0 = time.perf_counter()
        with profiling.section("reg_zarr_read_rounds"):
            ref_raw = np.asarray(
                ds.load_local_corrected_image(tile=tile_idx, round=0), np.float32
            )
        reference = self._deconvolve(ref_raw, fid_psf, seed=42 + tile_idx)
        reference_dev = None  # lazy device copy for the deformable path
        fid_writer, own_fid = self._persist_writer("fid")
        fid_writer.submit(
            self._save_fid_image,
            np.clip(reference, 0, 65535).astype(np.uint16),
            tile_idx,
            0,
        )
        ds.save_local_round_transform_zyx_um(np.eye(4), tile=tile_idx, round=0)
        self._diag(
            "reference-decon", tile=tile_idx, shape=reference.shape,
            elapsed=f"{time.perf_counter() - t0:.2f}s",
        )

        # Moving rounds stream in bounded batches: at most round_batch_size
        # volumes are resident in host RAM / stacked into HBM at once
        # (reference scale = 9 rounds × ~2 GB f32 — stacking all of them,
        # as round 1 did, blows both; VERDICT r1 weak #3). Rounds are
        # independent given the round-1 reference.
        from ..ops.rlgc import max_vmap_batch, rlgc_batch

        moving_rounds = list(range(1, ds.num_rounds))
        # HBM-bound the scan width: 2·B batch stacks + one live working
        # set must fit (`rlgc.max_vmap_batch` budget)
        sample_shape = self._core_shape(tile_idx)
        batch_cap = self._round_batch_size
        if fid_psf is not None and sample_shape is not None:
            batch_cap = min(
                batch_cap, max_vmap_batch(sample_shape, fid_psf.shape)
            )
        from ..datastore.prefetch import BoundedWriter, TilePrefetcher

        batches = [
            moving_rounds[s : s + max(batch_cap, 1)]
            for s in range(0, len(moving_rounds), max(batch_cap, 1))
        ]

        def load_batch(batch_idx: int) -> np.ndarray:
            # futures overlap the rounds' chunk decodes; the stack stays
            # uint16 — the decon/register programs cast on DEVICE, so the
            # upload moves half the bytes of f32
            with profiling.section("reg_zarr_read_rounds"):
                futures = [
                    ds.load_local_corrected_image(
                        tile=tile_idx, round=r, return_future=True
                    )
                    for r in batches[batch_idx]
                ]
                return np.stack([np.asarray(f.result()) for f in futures])

        # read/compute/write pipeline over round batches: next batch's
        # zarr reads and previous rounds' registered-image writes overlap
        # the device decon+registration (see `_apply_registration_to_bits`)
        prefetcher = TilePrefetcher(load_batch, range(len(batches)), depth=1)
        need_warped = self._deformable or self._save_all_fiducial_registered

        def run_batches(writer) -> None:
            nonlocal reference_dev
            for batch_idx, raws in prefetcher:
                batch_rounds = batches[batch_idx]
                start = batch_idx * max(batch_cap, 1)
                t0 = time.perf_counter()
                # decons stay DEVICE-resident through registration: the
                # u16 upload + on-device cast + device pass-through in
                # `register_rounds_to_fixed` removes a full f32 stack
                # readback + re-upload per batch
                if fid_psf is None:
                    decons = jnp.asarray(raws).astype(jnp.float32)
                elif len(batch_rounds) > 1 and raws.shape[2] <= (self._crop_yx_decon or 1024):
                    decons = rlgc_batch(
                        raws, fid_psf, seed=42 + tile_idx + 1000 + start,
                        max_iters=self._decon_max_iters, out="device",
                    )
                else:
                    decons = jnp.asarray(
                        np.stack(
                            [
                                self._deconvolve(
                                    raws[i], fid_psf,
                                    seed=42 + tile_idx + (batch_rounds[i]) * 1000,
                                )
                                for i in range(len(batch_rounds))
                            ]
                        )
                    )
                del raws
                self._diag(
                    "moving-decon-batch", tile=tile_idx, rounds=batch_rounds,
                    elapsed=f"{time.perf_counter() - t0:.2f}s",
                )

                # the whole batch registers (and warps) as ONE device
                # program: two readbacks per batch instead of ~4 blocking
                # transfers per round (each ~1.2 s of link latency on a
                # tunneled device; profiled r3 at 28 s of a 41 s phase).
                # A ragged last batch pads to the full width by repeating
                # the final round — one compile variant instead of two
                # (each costs minutes through a remote compiler)
                t0 = time.perf_counter()
                n_rounds = len(batch_rounds)
                decons_in = decons
                if len(batches) > 1 and n_rounds < max(batch_cap, 1):
                    reps = max(batch_cap, 1) - n_rounds
                    decons_in = jnp.concatenate(
                        [decons, jnp.repeat(decons[-1:], reps, axis=0)]
                    )
                transforms, warped_stack = register_rounds_to_fixed(
                    reference,
                    decons_in,
                    spacing_zyx_um=self._spacing,
                    return_warped=need_warped,
                )
                transforms = transforms[:n_rounds]
                if warped_stack is not None:
                    warped_stack = warped_stack[:n_rounds]
                self._diag(
                    "rounds-registered-batch", tile=tile_idx,
                    rounds=batch_rounds,
                    elapsed=f"{time.perf_counter() - t0:.2f}s",
                )

                for i, round_idx in enumerate(batch_rounds):
                    transform = transforms[i]
                    ds.save_local_round_transform_zyx_um(
                        transform, tile=tile_idx, round=round_idx
                    )
                    warped = warped_stack[i] if warped_stack is not None else None
                    if self._save_all_fiducial_registered and warped is not None:
                        # persisted form is uint16 — cast on DEVICE and
                        # read back on the writer thread (half the bytes,
                        # off the critical path)
                        writer.submit(
                            self._save_fid_image,
                            _warped_to_u16(warped),
                            tile_idx,
                            round_idx,
                        )
                    self._diag(
                        "round-registered", tile=tile_idx, round=round_idx,
                        shift_um=np.round(transform[:3, 3], 3).tolist(),
                    )
                    if self._deformable and warped is not None:
                        t0 = time.perf_counter()
                        # both volumes stay device-resident: jnp.asarray
                        # passes device arrays through, and re-uploading
                        # two f32 volumes measures 4.8 s/pair through a
                        # tunneled link (bench_sofima r3 probe)
                        if reference_dev is None:
                            reference_dev = jnp.asarray(
                                reference, jnp.float32
                            )
                        flow, meta = estimate_sofima_flow_field_xyz_px(
                            reference_dev, warped, self._sofima_config,
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
                        self._diag(
                            "sofima-flow", tile=tile_idx, round=round_idx,
                            valid_vectors=meta["valid_flow_vectors"],
                            elapsed=f"{time.perf_counter() - t0:.2f}s",
                        )
                del decons

        if own_fid:
            with fid_writer:
                run_batches(fid_writer)
        else:
            run_batches(fid_writer)

    def _save_fid_image(self, image_u16, tile_idx: int, round_idx: int) -> None:
        """Writer-thread fiducial save: d2h of the uint16 volume (device
        arrays pass through np.asarray; host arrays are free) + zarr
        write, both attributed to their own profiling boundaries."""
        with profiling.section(
            "reg_d2h_fiducial",
            nbytes=int(getattr(image_u16, "nbytes", 0))
            if not isinstance(image_u16, np.ndarray)
            else 0,
        ):
            image_u16 = np.asarray(image_u16)
        with profiling.section("reg_zarr_write_fiducial"):
            self._datastore.save_local_registered_image(
                image_u16,
                tile=tile_idx,
                round=round_idx,
                deconvolution=self._decon_fiducial,
            )

    # ----------------------------------------------------------- readout bits
    def _apply_registration_to_bits(
        self, tile_idx: int, bit_batch_size: int = 8
    ) -> None:
        """Per-bit decon + spot-probability prediction + spot table
        (reference `_apply_bits_on_gpu:790-1007`). Bits stay UNWARPED on
        disk; decode applies the composed transforms lazily.

        TPU-first: bits sharing a PSF are deconvolved as one scanned batch
        (`rlgc_batch`) instead of the reference's per-bit GPU loop, bounded
        by ``bit_batch_size`` volumes in HBM at once (further clamped by
        the padded-voxel vmap budget, like the round batches)."""
        from ..ops.rlgc import max_vmap_batch, rlgc_batch

        ds = self._datastore
        core = self._core_shape(tile_idx)

        def bit_valid(bit_idx) -> bool:  # skip-if-valid incl. shape check
            shape = ds.local_image_shape(tile_idx, bit=bit_idx, image="registered")
            pshape = ds.local_image_shape(
                tile_idx, bit=bit_idx, image="feature_predictor"
            )
            if shape is None or pshape is None:
                return False
            return core is None or (shape == core and pshape == core)

        pending = []
        for bit_idx, bit_id in enumerate(ds.bit_ids):
            if not self._overwrite and bit_valid(bit_idx):
                continue
            pending.append((bit_idx, bit_id))
        if not pending:
            return

        # group bits by PSF index so each group scans over one shared PSF
        groups: dict[int, list[tuple[int, str]]] = {}
        for bit_idx, bit_id in pending:
            psf_idx = self._psf_idx_for_bit(tile_idx, bit_id) if self._decon_readout else -1
            groups.setdefault(psf_idx, []).append((bit_idx, bit_id))

        # flatten into device-sized chunks so the loader can run one chunk
        # ahead of the device while the writer drains one chunk behind —
        # a 3-stage read/compute/write pipeline per tile (the reference
        # hides this IO inside its per-GPU worker processes)
        chunks: list[tuple[Optional[np.ndarray], list[tuple[int, str]]]] = []
        for psf_idx, members in groups.items():
            psf = self._psf_for_channel(psf_idx) if psf_idx >= 0 else None
            group_batch = bit_batch_size
            if psf is not None and core is not None:
                group_batch = min(
                    group_batch, max_vmap_batch(core, psf.shape)
                )
            for start in range(0, len(members), max(group_batch, 1)):
                chunks.append((psf, members[start : start + max(group_batch, 1)]))

        from ..datastore.prefetch import BoundedWriter, TilePrefetcher

        def load_chunk(chunk_idx: int) -> np.ndarray:
            # futures overlap all bits' chunk decodes in TensorStore's
            # native pool; the stack stays uint16 — the decon path casts
            # on DEVICE, so the upload moves half the bytes of f32
            with profiling.section("reg_zarr_read_bits"):
                futures = [
                    ds.load_local_corrected_image(
                        tile=tile_idx, bit=b, return_future=True
                    )
                    for b, _ in chunks[chunk_idx][1]
                ]
                return np.stack([np.asarray(f.result()) for f in futures])

        def run_chunks(writer) -> None:
            from .handoff import _to_cache_forms

            for chunk_idx, raws in TilePrefetcher(
                load_chunk, range(len(chunks)), depth=1
            ):
                psf, chunk = chunks[chunk_idx]
                # device-resident decon → predict chain: the decon output
                # feeds the CNN without a device→host→device bounce, and
                # decon(uint16, the exact values the datastore persists) +
                # probability(float16) come back in ONE bitcast-packed
                # transfer — a full readout chunk is hundreds of MB and
                # the tunneled link moves ~10-17 MB/s half-duplex, so the
                # f32 decon+prob readbacks plus the prob re-upload
                # dominated the warm register phase (~40 s of 52 s
                # profiled r3)
                t_dev = time.perf_counter()
                if psf is None:
                    # upload u16, cast on device
                    decons_dev = jnp.asarray(raws).astype(jnp.float32)
                elif len(chunk) > 1 and raws[0].shape[1] <= (self._crop_yx_decon or 1024):
                    decons_dev = rlgc_batch(
                        raws, psf, seed=7 + tile_idx * 100 + chunk[0][0],
                        max_iters=self._decon_max_iters, out="device",
                    )
                else:
                    decons_dev = jnp.asarray(
                        np.stack(
                            [
                                self._deconvolve(
                                    raws[i], psf,
                                    seed=7 + tile_idx * 100 + chunk[i][0],
                                )
                                for i in range(len(chunk))
                            ]
                        )
                    )
                decons_dev.block_until_ready()
                profiling.add("reg_device_decon", time.perf_counter() - t_dev)
                t_dev = time.perf_counter()
                if hasattr(self._predictor, "predict_batch_device"):
                    probs_dev = self._predictor.predict_batch_device(decons_dev)
                else:
                    probs_dev = jnp.asarray(
                        np.stack(
                            [
                                self._predictor.predict(np.asarray(d))
                                for d in decons_dev
                            ]
                        )
                    )
                bit_indices = [b for b, _ in chunk]
                if self._device_cache is not None:
                    # HBM-resident handoff: the SAME u16/u8 values the
                    # datastore persists stay on device for the decoder
                    du, pu = self._device_cache.put_chunk(
                        tile_idx, bit_indices, decons_dev, probs_dev
                    )
                else:
                    du, pu = _to_cache_forms(decons_dev, probs_dev)
                pu.block_until_ready()
                profiling.add("reg_device_decon_predict", time.perf_counter() - t_dev)
                del decons_dev, probs_dev

                # one persist job PER BIT (u16 decon + u8 prob, ~13 MB):
                # fine-grained jobs interleave with reads/compute and give
                # pause_persistence() sub-second preemption granularity
                for i, (bit_idx, _bit_id) in enumerate(chunk):
                    writer.submit(self._persist_bit, du[i], pu[i], tile_idx, bit_idx)
                del du, pu

        writer, own = self._persist_writer("bits")
        if own:
            with writer:
                run_chunks(writer)
        else:
            run_chunks(writer)

    # ------------------------------------------------------------- global
    def global_register(self) -> None:
        from .stitching import global_register

        # stitching reads fiducial round-0 images from disk; the readout
        # bits queue keeps draining in the background meanwhile
        self.drain_persistence(kind="fid")
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


def _roi_sums(
    image: np.ndarray, zs, ys, xs, roi_zyx: tuple[int, int, int]
) -> np.ndarray:
    """Sum of intensities in a fixed clipped ROI per spot (reference
    ``sum_pixels_in_roi``, `_apply_bits_on_gpu:932-967`)."""
    rz, ry, rx = roi_zyx
    sums = np.empty(len(zs), np.float64)
    for i, (z, y, x) in enumerate(zip(zs, ys, xs)):
        zmin = max(0, int(z) - rz // 2)
        ymin = max(0, int(y) - ry // 2)
        xmin = max(0, int(x) - rx // 2)
        sums[i] = image[
            zmin : min(image.shape[0], zmin + rz),
            ymin : min(image.shape[1], ymin + ry),
            xmin : min(image.shape[2], xmin + rx),
        ].sum()
    return sums


def _spot_table_from_probability(
    decon: np.ndarray,
    prob: np.ndarray,
    threshold: float = 0.5,
    roi_zyx: tuple[int, int, int] = (7, 5, 5),
    max_spots: int = 20000,
    tile_idx: int = 0,
    bit_idx: int = 0,
    predictor: str = "cnn",
) -> pd.DataFrame:
    """U-FISH-style spot localizations with ROI intensity sums (reference
    `_apply_bits_on_gpu:929-989`).

    Spot calling follows U-FISH's own algorithm: threshold the probability
    map, label connected components, and take each component's
    probability-weighted centroid (subvoxel). Each localization carries
    7x5x5 ROI sums over both the probability map (``sum_prob_pixels``) and
    the deconvolved image (``sum_decon_pixels``) plus the tile/bit indices
    and ``tile_*_px`` aliases — the reference's stored column contract.
    """
    import scipy.ndimage

    labels, n = scipy.ndimage.label(prob > threshold)
    if n > max_spots:
        # keep the strongest components by peak probability
        peaks = scipy.ndimage.maximum(prob, labels, index=np.arange(1, n + 1))
        keep = np.argsort(peaks)[::-1][:max_spots] + 1
        mask = np.isin(labels, keep)
        labels, n = scipy.ndimage.label(mask)
    if n == 0:
        centroids = np.zeros((0, 3))
    else:
        # probability-weighted centroids via bincount over the foreground
        # voxels only (scipy center_of_mass re-sweeps the dense volume
        # per statistic — measured 6.3 s/tile of pure host time)
        lin = np.flatnonzero(labels.ravel() > 0)
        lab = labels.ravel()[lin]
        w = prob.ravel()[lin].astype(np.float64)
        ny_, nx_ = prob.shape[1], prob.shape[2]
        z_f = lin // (ny_ * nx_)
        rem = lin % (ny_ * nx_)
        y_f, x_f = rem // nx_, rem % nx_
        wsum = np.maximum(np.bincount(lab, weights=w, minlength=n + 1)[1:], 1e-30)
        centroids = np.stack(
            [
                np.bincount(lab, weights=w * c, minlength=n + 1)[1:] / wsum
                for c in (z_f, y_f, x_f)
            ],
            axis=1,
        )
    zs, ys, xs = centroids.T if len(centroids) else (np.array([]),) * 3
    zi = np.clip(np.round(zs).astype(int), 0, prob.shape[0] - 1) if len(zs) else zs
    yi = np.clip(np.round(ys).astype(int), 0, prob.shape[1] - 1) if len(ys) else ys
    xi = np.clip(np.round(xs).astype(int), 0, prob.shape[2] - 1) if len(xs) else xs
    return pd.DataFrame(
        {
            "z": np.asarray(zs, np.float64),
            "y": np.asarray(ys, np.float64),
            "x": np.asarray(xs, np.float64),
            "probability": (
                prob[zi, yi, xi].astype(np.float64) if len(zs) else np.array([])
            ),
            "sum_prob_pixels": _roi_sums(prob, zi, yi, xi, roi_zyx),
            "sum_decon_pixels": _roi_sums(decon, zi, yi, xi, roi_zyx),
            "tile_idx": np.full(len(zs), int(tile_idx), np.int64),
            "bit_idx": np.full(len(zs), int(bit_idx) + 1, np.int64),
            "tile_z_px": np.asarray(zs, np.float64),
            "tile_y_px": np.asarray(ys, np.float64),
            "tile_x_px": np.asarray(xs, np.float64),
            # which predictor produced the probability map (dog = the
            # fallback ran because no CNN checkpoint resolved)
            "predictor": np.full(len(zs), predictor, object),
        }
    )


def no_op(*args, **kwargs) -> None:
    """Swallow output — print monkeypatch target (reference
    `DataRegistration.no_op:2337-2349`)."""


# re-export for reference import parity (`DataRegistration.time_stamp`)
from ..utils.dataio import time_stamp  # noqa: E402,F401
