"""Sparse device→host transfer encoding for mostly-zero volumes.

The per-tile intermediate readbacks (u8 spot-probability maps, and in
``persist="minimal"`` mode the decon values needed for spot-table ROI
sums) are overwhelmingly exact zeros away from spots: the predictors
squash background to ~1e-9 which quantizes to u8 0 (`models/ufish.py`,
`handoff._to_cache_forms`). On the measured deployment link (~10–17 MB/s
half-duplex device→host) the dense u8 probability readback alone is
~4 s/tile at (16, 512, 512) × 16 bits; encoding (index u32, value)
pairs for just the nonzeros moves 1–10 % of the bytes.

Protocol (host side drives it):

1. ``count_nonzero(vol)`` — one i32 readback.
2. pick ``capacity = _bucket(count)`` — power-of-two buckets bound the
   number of compiled gather variants; the padding transferred is < 2×
   the true payload.
3. ``gather_nonzero(vol, capacity)`` — ``(idx u32, val)`` readback.
4. :func:`scatter_dense` rebuilds the dense array on host.

When the volume is too dense for the encoding to win (count > size/4),
callers should fall back to the dense transfer; :func:`read_sparse_u8`
wraps the whole decision.

Reference contrast: the reference pipeline never needs this — its
GPU↔host boundary is PCIe and its stage boundary is the zarr store
(`DataRegistration.py:461`). Here the link IS the e2e budget, so the
wire format is a first-class design surface.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def count_nonzero(vol) -> jnp.ndarray:
    """Number of nonzero elements, as a scalar i32 (one tiny readback)."""
    return jnp.sum(vol != 0, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("capacity",))
def gather_nonzero(vol, capacity: int):
    """Indices (u32, flat C-order) and values of the first ``capacity``
    nonzeros. Padding slots hold index ``vol.size`` (out of range) and
    value 0, so the host can reconstruct with the true count alone."""
    flat = vol.reshape(-1)
    (idx,) = jnp.nonzero(flat != 0, size=capacity, fill_value=flat.shape[0])
    in_range = idx < flat.shape[0]
    vals = jnp.where(
        in_range, flat[jnp.minimum(idx, flat.shape[0] - 1)],
        jnp.zeros((), flat.dtype),
    )
    return idx.astype(jnp.uint32), vals


@partial(jax.jit, static_argnames=("capacity", "window"))
def gather_at_dilated_support(target, support_u8, capacity: int,
                              window: tuple[int, int, int] = (9, 7, 7)):
    """Values of ``target`` at the ``window``-box dilation of
    ``support_u8``'s nonzero set, as (idx u32, val) padded to ``capacity``.

    Used by minimal-persistence spot tables: every voxel a (7, 5, 5) ROI
    around a spot centroid can touch lies inside the (9, 7, 7) dilation of
    the probability foreground, so ROI sums over the reconstructed sparse
    decon match the dense ones (pinned in `tests/test_sparse_io.py`)."""
    mask = (support_u8 != 0).astype(jnp.int32)
    dilated = lax.reduce_window(
        mask, 0, lax.max, window, (1, 1, 1), "SAME"
    )
    flat_mask = dilated.reshape(-1)
    flat_target = target.reshape(-1)
    (idx,) = jnp.nonzero(flat_mask != 0, size=capacity,
                         fill_value=flat_mask.shape[0])
    in_range = idx < flat_mask.shape[0]
    vals = jnp.where(
        in_range, flat_target[jnp.minimum(idx, flat_mask.shape[0] - 1)],
        jnp.zeros((), flat_target.dtype),
    )
    return idx.astype(jnp.uint32), vals


@partial(jax.jit, static_argnames=("window",))
def count_dilated_support(support_u8,
                          window: tuple[int, int, int] = (9, 7, 7)):
    """(nonzero count, dilated-support count) in one i32[2] readback."""
    mask = (support_u8 != 0).astype(jnp.int32)
    dilated = lax.reduce_window(mask, 0, lax.max, window, (1, 1, 1), "SAME")
    return jnp.stack(
        [jnp.sum(mask, dtype=jnp.int32), jnp.sum(dilated, dtype=jnp.int32)]
    )


def _bucket(count: int, floor: int = 1024) -> int:
    """Smallest power-of-two capacity ≥ count (≥ floor): bounds compile
    variants to ~log2(size) while keeping padding < 2× payload."""
    cap = int(floor)
    while cap < count:
        cap <<= 1
    return cap


def scatter_dense(shape, dtype, idx: np.ndarray, vals: np.ndarray,
                  count: int) -> np.ndarray:
    """Rebuild the dense host array from a gather readback."""
    dense = np.zeros(int(np.prod(shape)), dtype=dtype)
    n = int(count)
    if n:
        dense[np.asarray(idx[:n], np.int64)] = np.asarray(vals[:n])
    return dense.reshape(shape)


def read_sparse_u8(vol_dev, *, dense_fraction_limit: float = 0.25,
                   profile_section=None) -> np.ndarray:
    """Read a device u8 volume back to host, sparse-encoded when it wins.

    Falls back to the dense transfer when the nonzero fraction exceeds
    ``dense_fraction_limit`` (5 B/nonzero ≥ 1 B/voxel break-even is at
    20 %). ``profile_section``: optional ``profiling.section`` context
    factory accepting ``nbytes`` for link accounting."""
    size = int(np.prod(vol_dev.shape))
    n = int(count_nonzero(vol_dev))
    if n > size * dense_fraction_limit:
        return np.asarray(vol_dev)
    cap = _bucket(n)
    idx, vals = gather_nonzero(vol_dev, cap)
    nbytes = cap * (4 + np.dtype(vol_dev.dtype).itemsize)
    if profile_section is not None:
        with profile_section(nbytes=nbytes):
            idx = np.asarray(idx)
            vals = np.asarray(vals)
    else:
        idx = np.asarray(idx)
        vals = np.asarray(vals)
    return scatter_dense(vol_dev.shape, vol_dev.dtype, idx, vals, n)
