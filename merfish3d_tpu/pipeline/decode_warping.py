"""Decode-time warp composition.

Composes round affine ∘ chromatic⁻¹ (+ optional SOFIMA flow) to warp native
readout bit images into the round-1 reference frame at decode time with a
single resample (reference `utils/decode_warping.py:15-237`).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..ops.warp import warp_affine, warp_affine_plus_flow


def load_bit_round_transform_zyx_um(datastore, *, tile, bit_id):
    """Round id + physical transform for one bit; reference-round bits get
    (None, identity) (reference `decode_warping.py:15-53`)."""
    round_index = datastore.load_local_round_linker(tile=tile, bit=bit_id) - 1
    if round_index <= 0:
        return None, np.eye(4, dtype=np.float32)
    round_id = datastore.round_ids[round_index]
    transform = datastore.load_local_round_transform_zyx_um(tile=tile, round=round_id)
    if transform is None:
        raise RuntimeError(
            f"Missing local round transform for tile={tile} round={round_id}."
        )
    return round_id, np.asarray(transform, dtype=np.float32)


def compose_decode_warp_transform_zyx_um(
    *, round_transform_zyx_um, chromatic_transform_zyx_um
) -> np.ndarray:
    """inv(chromatic) @ round_transform (reference `decode_warping.py:56-83`)."""
    return np.linalg.inv(
        np.asarray(chromatic_transform_zyx_um, dtype=np.float32)
    ) @ np.asarray(round_transform_zyx_um, dtype=np.float32)


def warp_image_with_sofima_metadata(
    image,
    *,
    transform_zyx_um,
    spacing_zyx_um,
    sofima_flow_field_xyz_px,
    flow_attrs,
    reference_shape=None,
):
    """Composed affine+flow warp from stored flow metadata
    (reference `decode_warping.py:172-227`)."""
    if reference_shape is None:
        reference_shape = flow_attrs["reference_shape_zyx_px"]
    return warp_affine_plus_flow(
        image,
        sofima_flow_field_xyz_px,
        transform_zyx_um=transform_zyx_um,
        spacing_zyx_um=spacing_zyx_um,
        reference_shape=tuple(int(v) for v in reference_shape),
        map_stride_zyx_px=flow_attrs["map_stride_zyx_px"],
        map_box_start_xyz_px=flow_attrs["map_box_start_xyz_px"],
    ).astype(np.float32, copy=False)


def warp_bit_images_to_reference(
    images,  # (B, z, y, x) native bit images, one per bit_id
    *,
    datastore: Any,
    tile,
    bit_ids,
    emission_wavelengths_um,
    out: str = "host",
) -> np.ndarray:
    """Warp ALL readout bits of a tile into the round-1 frame in a few
    batched device dispatches (identity bits pass through; affine-only
    bits batch by warp class; flow-bearing bits batch into one composed
    warp). Numerics identical to per-bit `warp_bit_image_to_reference` —
    the batching replaces the reference's per-bit warp loop
    (`PixelDecoder._load_bit_data:1476-1595`) whose per-dispatch
    host↔device round trips dominate warm per-tile wall-clock.

    ``out="device"`` returns the warped stack as a device array (single
    dispatch per warp class, caller guarantees HBM fit): the decoder
    feeds it straight into the fused lowpass+decode, skipping a full
    f32 stack readback + re-upload per tile."""
    from ..ops.warp import warp_affine_batch, warp_affine_plus_flow_batch

    if out == "host":
        images = np.ascontiguousarray(images, dtype=np.float32)
    n = images.shape[0]
    spacing = datastore.voxel_size_zyx_um
    transforms = np.empty((n, 4, 4), np.float32)
    flows: dict[int, tuple] = {}
    flow_cache: dict[Any, Any] = {}
    for i, (bit_id, em) in enumerate(zip(bit_ids, emission_wavelengths_um)):
        round_id, round_transform = load_bit_round_transform_zyx_um(
            datastore, tile=tile, bit_id=bit_id
        )
        chromatic = datastore.load_chromatic_affine_transform_zyx_um(
            wavelength_um=em
        )
        transforms[i] = compose_decode_warp_transform_zyx_um(
            round_transform_zyx_um=round_transform,
            chromatic_transform_zyx_um=chromatic,
        )
        if round_id is not None:
            if round_id not in flow_cache:
                flow_cache[round_id] = datastore.load_local_sofima_flow_field(
                    tile=tile, round=round_id
                )
            if flow_cache[round_id] is not None:
                flows[i] = flow_cache[round_id]

    eye = np.eye(4, dtype=np.float32)
    ident = [
        i
        for i in range(n)
        if i not in flows and np.allclose(transforms[i], eye)
    ]
    affine_only = [i for i in range(n) if i not in flows and i not in ident]
    flow_idx = sorted(flows)
    if flow_idx:
        flow_stack = np.stack([np.asarray(flows[i][0], np.float32) for i in flow_idx])
        strides = np.stack(
            [
                np.asarray(flows[i][1]["map_stride_zyx_px"], np.float32)
                for i in flow_idx
            ]
        )
        box_starts = np.stack(
            [
                np.asarray(flows[i][1]["map_box_start_xyz_px"], np.float32)
                for i in flow_idx
            ]
        )

    if out == "device":
        import jax.numpy as jnp

        from ..ops.warp import (
            warp_affine_batch_device,
            warp_affine_plus_flow_batch_device,
        )

        res = jnp.asarray(images, jnp.float32)
        if affine_only:
            sel = np.asarray(affine_only)
            res = res.at[jnp.asarray(sel)].set(
                warp_affine_batch_device(
                    jnp.take(res, jnp.asarray(sel), axis=0),
                    transforms[sel],
                    spacing,
                )
            )
        if flow_idx:
            sel = np.asarray(flow_idx)
            res = res.at[jnp.asarray(sel)].set(
                warp_affine_plus_flow_batch_device(
                    jnp.take(res, jnp.asarray(sel), axis=0),
                    flow_stack,
                    transforms[sel],
                    spacing,
                    strides,
                    box_starts,
                )
            )
        return res

    out_arr = np.empty_like(images)
    for i in ident:
        out_arr[i] = images[i]
    if affine_only:
        sel = np.asarray(affine_only)
        out_arr[sel] = warp_affine_batch(images[sel], transforms[sel], spacing)
    if flow_idx:
        sel = np.asarray(flow_idx)
        out_arr[sel] = warp_affine_plus_flow_batch(
            images[sel], flow_stack, transforms[sel], spacing, strides, box_starts
        )
    return out_arr


def warp_bit_image_to_reference(
    image: np.ndarray,
    *,
    datastore: Any,
    tile,
    bit_id: str,
    emission_wavelength_um: float,
) -> np.ndarray:
    """Warp one native bit image into the round-1 local reference frame,
    short-circuiting when the composed transform is identity and no flow is
    stored (reference `decode_warping.py:86-169`)."""
    round_id, round_transform = load_bit_round_transform_zyx_um(
        datastore, tile=tile, bit_id=bit_id
    )
    chromatic = datastore.load_chromatic_affine_transform_zyx_um(
        wavelength_um=emission_wavelength_um
    )
    transform = compose_decode_warp_transform_zyx_um(
        round_transform_zyx_um=round_transform,
        chromatic_transform_zyx_um=chromatic,
    )
    spacing = datastore.voxel_size_zyx_um

    flow = None
    if round_id is not None:
        flow = datastore.load_local_sofima_flow_field(tile=tile, round=round_id)

    if flow is None and np.allclose(transform, np.eye(4, dtype=np.float32)):
        return np.asarray(image, dtype=np.float32)

    if flow is not None:
        flow_field, flow_attrs = flow
        return warp_image_with_sofima_metadata(
            image,
            transform_zyx_um=transform,
            spacing_zyx_um=spacing,
            sofima_flow_field_xyz_px=flow_field,
            flow_attrs=flow_attrs,
            reference_shape=image.shape,
        )

    return warp_affine(
        image,
        transform_zyx_um=transform,
        spacing_zyx_um=spacing,
        reference_shape=image.shape,
    ).astype(np.float32, copy=False)
