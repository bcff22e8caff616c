"""Decode kernel, connected components, and regionprops tests."""

import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from merfish3d_tpu.ops import cc as cc_ops
from merfish3d_tpu.ops import decode as dec
from merfish3d_tpu.ops.filters import (
    downsample_image_anisotropic,
    gaussian_lowpass,
    replace_hot_pixels,
)


def _mhd4_codebook(n_genes=20, n_bits=16, seed=0):
    """Random 4-on-bit codewords with pairwise Hamming distance >= 4."""
    rng = np.random.default_rng(seed)
    words = []
    while len(words) < n_genes:
        w = np.zeros(n_bits, np.float32)
        w[rng.choice(n_bits, 4, replace=False)] = 1
        if all(np.sum(np.abs(w - u)) >= 4 for u in words):
            words.append(w)
    return np.stack(words)


def test_caller_thresholds_reference_values():
    # B=4: pixel sqrt(2-2*2/sqrt(8)), transcript sqrt(2-2*4/sqrt(24))
    pix, tr = dec.caller_thresholds(4)
    np.testing.assert_allclose(pix, np.sqrt(2 - 4 / np.sqrt(8)), rtol=1e-6)
    np.testing.assert_allclose(tr, np.sqrt(2 - 8 / np.sqrt(24)), rtol=1e-6)


def test_decode_exact_codewords():
    cb = _mhd4_codebook()
    n_bits = cb.shape[1]
    pix_thr, _ = dec.caller_thresholds(4)
    # build a volume where specific voxels carry exact codewords
    nz, ny, nx = 4, 16, 16
    vol = np.zeros((n_bits, nz, ny, nx), np.float32)
    truth = {}
    rng = np.random.default_rng(1)
    for i in range(10):
        g = rng.integers(0, len(cb))
        z, y, x = rng.integers(0, nz), rng.integers(2, ny - 2), rng.integers(2, nx - 2)
        vol[:, z, y, x] = cb[g] * 3.0  # magnitude 6 after scaling? -> see norms
        truth[(z, y, x)] = g
    background = np.zeros(n_bits, np.float32)
    normalization = np.ones(n_bits, np.float32)
    decoded, mag, dist, scaled = dec.decode_volume(
        vol, cb, background, normalization,
        magnitude_threshold=(1.5, 10.0), distance_threshold=pix_thr,
    )
    for (z, y, x), g in truth.items():
        assert decoded[z, y, x] == g, (z, y, x)
        assert dist[z, y, x] < 1e-3
    # zero voxels unassigned
    assert decoded[0, 0, 0] == -1


def test_decode_magnitude_gate():
    cb = _mhd4_codebook()
    n_bits = cb.shape[1]
    pix_thr, _ = dec.caller_thresholds(4)
    vol = np.zeros((n_bits, 1, 4, 4), np.float32)
    vol[:, 0, 1, 1] = cb[0] * 0.1  # magnitude 0.2 < 1.5 → rejected
    vol[:, 0, 2, 2] = cb[0] * 20.0  # magnitude 40 > 10 → rejected (clip makes mag 2)
    decoded, mag, dist, _ = dec.decode_volume(
        vol, cb, np.zeros(n_bits), np.ones(n_bits),
        magnitude_threshold=(1.5, 10.0), distance_threshold=pix_thr,
    )
    assert decoded[0, 1, 1] == -1
    # clip [0,1] caps per-bit at 1 → magnitude = 2 for a 4-on-bit word → assigned
    assert decoded[0, 2, 2] == 0


def test_decode_scaling_normalization():
    """(t - bg)/norm math: a voxel with per-bit intensities bg + norm*w
    decodes to w's codeword."""
    cb = _mhd4_codebook()
    n_bits = cb.shape[1]
    pix_thr, _ = dec.caller_thresholds(4)
    bg = np.linspace(10, 50, n_bits).astype(np.float32)
    norm = np.linspace(100, 400, n_bits).astype(np.float32)
    vol = np.zeros((n_bits, 1, 4, 4), np.float32)
    vol[:, 0, 1, 2] = bg + norm * cb[3]
    decoded, *_ = dec.decode_volume(
        vol, cb, bg, norm, magnitude_threshold=(1.5, 10.0),
        distance_threshold=pix_thr,
    )
    assert decoded[0, 1, 2] == 3


def test_label_connected_3d():
    decoded = np.full((3, 8, 8), -1, np.int16)
    decoded[0:2, 1:3, 1:3] = 5  # one 3D component of codeword 5
    decoded[2, 6, 6] = 5  # separate component, same codeword
    decoded[0, 5:7, 1:3] = 7  # different codeword adjacent
    labels = np.asarray(cc_ops.label_connected(jnp.asarray(decoded)))
    assert labels[decoded == -1].max() == -1
    l1 = labels[0, 1, 1]
    assert np.all(labels[0:2, 1:3, 1:3] == l1)
    assert labels[2, 6, 6] != l1
    l7 = labels[0, 5, 1]
    assert np.all(labels[0, 5:7, 1:3] == l7)
    assert l7 != l1


def test_label_connected_matches_scipy_per_codeword():
    rng = np.random.default_rng(0)
    decoded = np.full((6, 24, 24), -1, np.int16)
    # random blobs of a few codewords
    for g in range(4):
        m = rng.random((6, 24, 24)) > 0.85
        decoded[m] = g
    labels = np.asarray(cc_ops.label_connected(jnp.asarray(decoded)))
    structure = np.ones((3, 3, 3), bool)
    total_expected = 0
    for g in range(4):
        mask = decoded == g
        lab, n = scipy.ndimage.label(mask, structure=structure)
        total_expected += n
        # within each scipy component, our labels must be constant
        for comp in range(1, n + 1):
            vals = np.unique(labels[lab == comp])
            assert len(vals) == 1
    assert len(np.unique(labels[labels >= 0])) == total_expected


def test_component_stats():
    decoded = np.full((3, 8, 8), -1, np.int16)
    decoded[1, 2:4, 2:4] = 2  # 4-voxel plane component of codeword 2
    labels = cc_ops.label_connected(jnp.asarray(decoded))
    distance = np.full(decoded.shape, 0.5, np.float32)
    distance[1, 2, 2] = 0.1
    magnitude = np.full(decoded.shape, 2.0, np.float32)
    scaled = np.zeros((4, *decoded.shape), np.float32)
    scaled[1][decoded == 2] = 0.8
    stats = cc_ops.component_stats(
        jnp.asarray(decoded), labels, jnp.asarray(distance),
        jnp.asarray(magnitude), jnp.asarray(scaled), capacity=16,
    )
    valid = np.asarray(stats["valid"])
    assert valid.sum() == 1
    i = np.argmax(valid)
    assert np.asarray(stats["area"])[i] == 4
    np.testing.assert_allclose(np.asarray(stats["centroid_zyx"])[i], [1.0, 2.5, 2.5])
    assert np.asarray(stats["codeword"])[i] == 2
    np.testing.assert_allclose(np.asarray(stats["distance_min"])[i], 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["magnitude_mean"])[i], 2.0)
    np.testing.assert_allclose(np.asarray(stats["bit_means"])[1, i], 0.8, rtol=1e-5)
    eig = cc_ops.inertia_tensor_eigvals(
        np.asarray(stats["moments"])[i : i + 1], np.asarray(stats["area"])[i : i + 1]
    )
    assert eig.shape == (1, 3)
    assert np.all(eig[0][:-1] >= eig[0][1:])  # descending


def test_gaussian_lowpass_matches_scipy():
    rng = np.random.default_rng(2)
    vol = rng.random((6, 24, 24)).astype(np.float32)
    out = np.asarray(gaussian_lowpass(jnp.asarray(vol), sigma=(3.0, 1.0, 1.0)))
    exp = scipy.ndimage.gaussian_filter(vol, (3.0, 1.0, 1.0), mode="reflect")
    np.testing.assert_allclose(out, exp, rtol=1e-3, atol=1e-4)


def test_gaussian_lowpass_2d_mode():
    rng = np.random.default_rng(2)
    vol = rng.random((4, 16, 16)).astype(np.float32)
    out = np.asarray(gaussian_lowpass(jnp.asarray(vol), sigma=(0.0, 1.0, 1.0)))
    exp = np.stack(
        [scipy.ndimage.gaussian_filter(p, 1.0, mode="reflect") for p in vol]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-3, atol=1e-4)


def test_replace_hot_pixels():
    noise = np.zeros((8, 8), np.float32)
    noise[3, 3] = 1000.0
    imgs = np.full((2, 8, 8), 100, np.uint16)
    imgs[:, 3, 3] = 60000
    out = replace_hot_pixels(noise, imgs)
    assert out[0, 3, 3] == 100
    assert out[0, 2, 2] == 100


def test_downsample_anisotropic():
    img = np.arange(4 * 6 * 6, dtype=np.float32).reshape(4, 6, 6)
    out = downsample_image_anisotropic(img, (2, 3, 3))
    assert out.shape == (2, 2, 2)
    np.testing.assert_allclose(out[0, 0, 0], img[:2, :3, :3].mean())


def test_pallas_decode_matches_xla_interpret():
    """The fused Pallas decode kernel must match the XLA path (interpret
    mode on CPU); only exact similarity ties may differ in argmax order."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    cb = _mhd4_codebook()
    traces = (rng.random((16, 300)) * 2).astype(np.float32)  # (bits, N)
    bg = (rng.random(16) * 0.1).astype(np.float32)
    norm = (rng.random(16) + 0.5).astype(np.float32)
    cbt = jnp.asarray(dec.normalize_codebook(cb).T)
    bx, dx, mx, sx = dec._decode_chunk_xla(
        jnp.asarray(traces), cbt, jnp.asarray(bg), jnp.asarray(norm)
    )
    with pltpu.force_tpu_interpret_mode():
        bp, dp, mp, sp = dec._decode_chunk_pallas(
            jnp.asarray(traces), cbt, jnp.asarray(bg), jnp.asarray(norm), tile_n=128
        )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sp), atol=1e-6)
    diff = np.asarray(bx) != np.asarray(bp)
    # any argmax difference must be an exact (float-eps) similarity tie
    unit = np.asarray(
        dec._scale_clip_normalize(
            jnp.asarray(traces), jnp.asarray(bg), jnp.asarray(norm)
        )[0]
    )
    sims = np.asarray(cbt).T @ unit  # (words, N)
    for i in np.where(diff)[0]:
        top2 = np.sort(sims[:, i])[::-1][:2]
        assert top2[0] - top2[1] < 1e-6


def test_fused_lowpass_decode_matches_reference_path():
    """The 3-pass fused Pallas pipeline must reproduce
    gaussian_lowpass + decode_planes (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from merfish3d_tpu.ops.filters import gaussian_lowpass
    from merfish3d_tpu.ops.fused_decode import fused_lowpass_decode

    rng = np.random.default_rng(0)
    cb = _mhd4_codebook()
    cbt = jnp.asarray(dec.normalize_codebook(cb).T)
    vol = jnp.asarray((rng.random((16, 6, 32, 160)) * 100).astype(np.float32))
    bg = jnp.asarray(rng.random(16).astype(np.float32))
    nm = jnp.asarray(((rng.random(16) + 0.5) * 40).astype(np.float32))
    kw = dict(magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176)
    lp = gaussian_lowpass(vol, sigma=(3.0, 1.0, 1.0))
    d0, m0, di0, s0 = dec.decode_planes(lp, cbt, bg, nm, use_pallas=False, **kw)
    with pltpu.force_tpu_interpret_mode():
        d1, m1, di1, s1 = fused_lowpass_decode(
            vol, cbt, bg, nm, sigma=(3.0, 1.0, 1.0), **kw
        )
    assert (np.asarray(d0) == np.asarray(d1)).mean() == 1.0
    # float tolerances: the fused kernel stores bf16 (Mosaic has no f16
    # stores) before the f16 cast, so stored values carry one bf16
    # rounding (rel ~2^-9); thresholds/argmax run in f32 pre-store
    np.testing.assert_allclose(
        np.asarray(m0, np.float32), np.asarray(m1, np.float32),
        rtol=4e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(di0, np.float32), np.asarray(di1, np.float32),
        rtol=4e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s0, np.float32), np.asarray(s1, np.float32),
        rtol=4e-3, atol=2e-3,
    )


def test_fused_lowpass_decode_ragged_ny():
    """Non-block-multiple Y (ragged path: host symmetric pad) must match
    the reference path too — exercises the pad-≥-halo bump."""
    from jax.experimental.pallas import tpu as pltpu

    from merfish3d_tpu.ops.filters import gaussian_lowpass
    from merfish3d_tpu.ops.fused_decode import fused_lowpass_decode

    rng = np.random.default_rng(3)
    cb = _mhd4_codebook()
    cbt = jnp.asarray(dec.normalize_codebook(cb).T)
    # ny=40: 40 % 16 != 0 and round_up(40,16)=48 leaves pad 8 >= ry=4
    vol = jnp.asarray((rng.random((16, 5, 40, 128)) * 100).astype(np.float32))
    bg = jnp.asarray(rng.random(16).astype(np.float32))
    nm = jnp.asarray(((rng.random(16) + 0.5) * 40).astype(np.float32))
    kw = dict(magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176)
    lp = gaussian_lowpass(vol, sigma=(3.0, 1.0, 1.0))
    d0, m0, di0, s0 = dec.decode_planes(lp, cbt, bg, nm, use_pallas=False, **kw)
    with pltpu.force_tpu_interpret_mode():
        d1, m1, di1, s1 = fused_lowpass_decode(
            vol, cbt, bg, nm, sigma=(3.0, 1.0, 1.0), **kw
        )
    assert (np.asarray(d0) == np.asarray(d1)).mean() == 1.0
    np.testing.assert_allclose(
        np.asarray(m0, np.float32), np.asarray(m1, np.float32),
        rtol=4e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(di0, np.float32), np.asarray(di1, np.float32),
        rtol=4e-3, atol=2e-3,
    )


def test_fused_decode_volume_slab_streaming():
    """y-slab streaming must agree with the whole-volume fused pipeline."""
    from jax.experimental.pallas import tpu as pltpu

    from merfish3d_tpu.ops.fused_decode import fused_decode_volume

    rng = np.random.default_rng(1)
    cb = _mhd4_codebook()
    vol = (rng.random((16, 4, 48, 128)) * 100).astype(np.float32)
    bg = rng.random(16).astype(np.float32)
    nm = ((rng.random(16) + 0.5) * 40).astype(np.float32)
    kw = dict(
        magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176,
        sigma=(0.0, 1.0, 1.0),
    )
    with pltpu.force_tpu_interpret_mode():
        whole = fused_decode_volume(vol, cb, bg, nm, **kw)
        slabbed = fused_decode_volume(
            vol, cb, bg, nm, y_slab=16, hbm_budget_bytes=0, **kw
        )
    np.testing.assert_array_equal(whole[0], slabbed[0])
    np.testing.assert_allclose(
        np.asarray(whole[1], np.float32), np.asarray(slabbed[1], np.float32),
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(whole[3], np.float32), np.asarray(slabbed[3], np.float32),
        atol=2e-3,
    )


def test_fused_decode_volume_scaled_gather():
    """`scaled_as="gather"` must return exactly the dense scaled values at
    every decoded voxel, in both the whole-volume and streamed paths."""
    from jax.experimental.pallas import tpu as pltpu

    from merfish3d_tpu.ops.fused_decode import fused_decode_volume

    rng = np.random.default_rng(4)
    cb = _mhd4_codebook()
    # paint real codeword spots so the foreground is non-empty in every slab
    vol = (rng.random((16, 4, 48, 128)) * 2).astype(np.float32)
    for k, (z, y, x) in enumerate([(1, 8, 20), (2, 24, 70), (1, 40, 110)]):
        on = np.flatnonzero(cb[k % len(cb)])
        vol[on, z, y : y + 2, x : x + 3] = 90.0
    bg = np.zeros(16, np.float32)
    nm = np.full(16, 40.0, np.float32)
    kw = dict(
        magnitude_threshold=(0.9, 10.0), distance_threshold=0.5176,
        sigma=(0.0, 1.0, 1.0),
    )
    with pltpu.force_tpu_interpret_mode():
        dense = fused_decode_volume(vol, cb, bg, nm, **kw)
        whole = fused_decode_volume(vol, cb, bg, nm, scaled_as="gather", **kw)
        slabbed = fused_decode_volume(
            vol, cb, bg, nm, y_slab=16, hbm_budget_bytes=0,
            scaled_as="gather", **kw
        )
    np.testing.assert_array_equal(dense[0], whole[0])
    np.testing.assert_array_equal(dense[0], slabbed[0])
    lin = np.flatnonzero(dense[0].ravel() >= 0)
    assert lin.size > 0
    bits = vol.shape[0]
    expected = np.stack(
        [np.asarray(dense[3][b], np.float32).ravel()[lin] for b in range(bits)]
    )
    for sparse, label in ((whole[3], "whole"), (slabbed[3], "slab")):
        assert callable(sparse) and sparse.nbits == bits
        np.testing.assert_allclose(sparse(lin), expected, atol=2e-3, err_msg=label)
        # subset gather (post-mask label foreground) also exact
        sub = lin[::3]
        np.testing.assert_allclose(
            sparse(sub), expected[:, ::3], atol=2e-3, err_msg=label
        )


def test_component_stats_overflow_does_not_corrupt_survivors():
    """With more unique labels than capacity, dropped labels must NOT be
    absorbed into surviving components' slots (review r3: searchsorted
    mapped them to neighbors' indices, silently corrupting stats)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.cc import component_stats

    decoded = np.full((1, 8, 40), -1, np.int16)
    labels = np.full((1, 8, 40), -1, np.int32)
    for i in range(40):
        decoded[0, 2:5, i] = i % 7
        labels[0, 2:5, i] = i  # 40 single-column components, area 3 each
    stats = component_stats(
        jnp.asarray(decoded),
        jnp.asarray(labels),
        jnp.ones((1, 8, 40), jnp.float32),
        jnp.ones((1, 8, 40), jnp.float32),
        jnp.ones((2, 1, 8, 40), jnp.float32),
        capacity=16,
    )
    valid = np.asarray(stats["valid"])
    area = np.asarray(stats["area"])
    assert set(np.unique(area[valid])) == {3.0}
