"""Sparse device→host transfer encoding (`ops/sparse_io.py`): exact
round-trips, dilation coverage of spot-table ROIs, dense fallback."""

import numpy as np
import pytest

import jax.numpy as jnp

from merfish3d_tpu.ops import sparse_io


def _sparse_volume(rng, shape=(8, 64, 64), frac=0.01, dtype=np.uint8):
    vol = np.zeros(shape, dtype)
    n = max(1, int(np.prod(shape) * frac))
    flat = rng.choice(np.prod(shape), size=n, replace=False)
    vol.ravel()[flat] = rng.integers(1, 255, size=n)
    return vol


def test_roundtrip_exact_u8():
    rng = np.random.default_rng(0)
    vol = _sparse_volume(rng)
    out = sparse_io.read_sparse_u8(jnp.asarray(vol))
    np.testing.assert_array_equal(out, vol)


def test_roundtrip_dense_fallback():
    rng = np.random.default_rng(1)
    vol = rng.integers(0, 255, (4, 16, 16)).astype(np.uint8)  # ~99% nonzero
    out = sparse_io.read_sparse_u8(jnp.asarray(vol))
    np.testing.assert_array_equal(out, vol)


def test_roundtrip_all_zero():
    vol = np.zeros((4, 16, 16), np.uint8)
    out = sparse_io.read_sparse_u8(jnp.asarray(vol))
    np.testing.assert_array_equal(out, vol)


def test_bucket_bounds():
    assert sparse_io._bucket(0) == 1024
    assert sparse_io._bucket(1024) == 1024
    assert sparse_io._bucket(1025) == 2048
    assert sparse_io._bucket(3_000_000) == 1 << 22


def test_gather_nonzero_overflow_truncates():
    vol = np.zeros((4, 4, 4), np.uint8)
    vol.ravel()[:10] = 7
    idx, vals = sparse_io.gather_nonzero(jnp.asarray(vol), 4)
    assert idx.shape == (4,) and (np.asarray(vals) == 7).all()


def test_dilated_support_covers_roi_sums():
    """ROI sums over the sparse-reconstructed decon equal dense ROI sums:
    the (9, 7, 7) dilation of the probability foreground contains every
    voxel a clipped (7, 5, 5) ROI around a foreground centroid touches."""
    from merfish3d_tpu.pipeline.registration import (
        _roi_sums, _spot_table_from_probability,
    )

    rng = np.random.default_rng(2)
    shape = (10, 48, 48)
    decon = rng.integers(0, 4000, shape).astype(np.uint16)
    prob = np.zeros(shape, np.uint8)
    # a few blobs, including one at the volume edge (clipped ROI case)
    for z, y, x in [(5, 20, 20), (2, 5, 5), (9, 47, 47), (5, 22, 21)]:
        prob[max(0, z - 1):z + 2, max(0, y - 1):y + 2, max(0, x - 1):x + 2] = 200

    counts = np.asarray(sparse_io.count_dilated_support(jnp.asarray(prob)))
    cap = sparse_io._bucket(int(counts[1]))
    idx, vals = sparse_io.gather_at_dilated_support(
        jnp.asarray(decon), jnp.asarray(prob), cap
    )
    sparse_decon = sparse_io.scatter_dense(
        shape, np.uint16, np.asarray(idx), np.asarray(vals), int(counts[1])
    )

    dense_df = _spot_table_from_probability(
        decon.astype(np.float32), prob.astype(np.float32) / 255.0
    )
    sparse_df = _spot_table_from_probability(
        sparse_decon.astype(np.float32), prob.astype(np.float32) / 255.0
    )
    assert len(dense_df) > 0
    np.testing.assert_allclose(
        sparse_df["sum_decon_pixels"], dense_df["sum_decon_pixels"]
    )
    np.testing.assert_allclose(sparse_df["z"], dense_df["z"])


def test_scatter_dense_empty():
    out = sparse_io.scatter_dense((2, 3), np.uint16, np.zeros(4, np.uint32),
                                  np.zeros(4, np.uint16), 0)
    assert out.shape == (2, 3) and not out.any()
