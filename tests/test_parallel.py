"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
decode step must compile, execute, and agree with the single-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from merfish3d_tpu.ops.decode import normalize_codebook
from merfish3d_tpu.parallel.mesh import (
    decode_pipeline_step,
    make_mesh,
    make_sharded_decode_step,
)


def _setup(n_tiles=4, n_bits=16, n_words=24, shape=(8, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    cb = np.zeros((n_words, n_bits), np.float32)
    for i in range(n_words):
        cb[i, rng.choice(n_bits, 4, replace=False)] = 1.0
    tiles = (rng.random((n_tiles, n_bits, *shape)) * 100).astype(np.float32)
    return (
        jnp.asarray(tiles),
        jnp.asarray(normalize_codebook(cb).T),
        jnp.zeros(n_bits, jnp.float32),
        jnp.full(n_bits, 50.0, jnp.float32),
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_tile_shards=4, n_z_shards=2)
    assert mesh.shape == {"tile": 4, "z": 2}


def test_sharded_decode_matches_single_device():
    tiles, cbt, bg, norm = _setup()
    kwargs = dict(magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176)
    ref = decode_pipeline_step(tiles, cbt, bg, norm, **kwargs)

    mesh = make_mesh(n_tile_shards=4, n_z_shards=2)
    step = make_sharded_decode_step(mesh, **kwargs)
    out = step(tiles, cbt, bg, norm)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-3
        )


def test_sharded_decode_tile_only_mesh():
    tiles, cbt, bg, norm = _setup(n_tiles=8)
    mesh = make_mesh(n_tile_shards=8, n_z_shards=1)
    step = make_sharded_decode_step(
        mesh, magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176
    )
    decoded, dist, mag, stats = step(tiles, cbt, bg, norm)
    assert decoded.shape == (8, 8, 32, 32)
    assert stats.shape == (16,)
    assert np.all(np.isfinite(np.asarray(stats)))
