"""Native host-ops (C++/ctypes) tests: correctness + fallback agreement."""

import numpy as np
import pytest

from merfish3d_tpu import native


def test_native_library_builds():
    assert native.available(), "g++ toolchain should build the host-ops lib"


def test_union_find():
    pairs = np.array([[0, 1], [1, 2], [4, 5]])
    roots = native.union_find(pairs, 7)
    assert roots[0] == roots[1] == roots[2]
    assert roots[4] == roots[5]
    assert roots[3] not in (roots[0], roots[4])
    assert roots[6] == 6
    # canonical min-index roots
    assert roots[0] == 0 and roots[4] == 4


def test_points_in_polygon():
    poly = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], float)
    pts = np.array([[5, 5], [15, 5], [-1, 2], [9.99, 9.99]], float)
    inside = native.points_in_polygon(pts, poly)
    assert inside.tolist() == [True, False, False, True]
    # agreement with matplotlib on random data
    rng = np.random.default_rng(0)
    poly2 = np.array(
        [[np.sin(t) * 5 + 5, np.cos(t) * 5 + 5] for t in np.linspace(0, 2 * np.pi, 12)]
    )
    pts2 = rng.uniform(-1, 11, (500, 2))
    from matplotlib.path import Path as MplPath

    expected = MplPath(poly2).contains_points(pts2)
    got = native.points_in_polygon(pts2, poly2)
    assert (got == expected).mean() > 0.99  # boundary ties may differ


def test_greedy_match():
    # two sources compete for one target; closer wins, other falls back
    src = np.array([0, 0, 1])
    dst = np.array([0, 1, 0])
    dist = np.array([0.5, 0.9, 0.2])
    accepted = native.greedy_match(src, dst, dist, 2, 2)
    chosen = {(src[i], dst[i]) for i in accepted}
    assert (1, 0) in chosen  # closest pair first
    assert (0, 1) in chosen  # remaining source takes remaining target
    assert len(accepted) == 2


def test_label_components_matches_device_kernel():
    """Native union-find labeling must agree with the Pallas/jnp device
    kernel (same root-linear-index contract)."""
    import jax.numpy as jnp

    from merfish3d_tpu.ops.cc import label_connected

    rng = np.random.default_rng(0)
    decoded = np.full((6, 20, 20), -1, np.int16)
    for g in range(4):
        m = rng.random(decoded.shape) > 0.85
        decoded[m] = g
    host = native.label_components(decoded)
    device = np.asarray(label_connected(jnp.asarray(decoded)))
    np.testing.assert_array_equal(host, device.astype(np.int64))
    # 2D mode
    host2 = native.label_components(decoded, use_2d=True)
    device2 = np.asarray(label_connected(jnp.asarray(decoded), use_2d=True))
    np.testing.assert_array_equal(host2, device2.astype(np.int64))


def test_component_stats_host_matches_device():
    import jax.numpy as jnp

    from merfish3d_tpu.ops.cc import component_stats, component_stats_host

    rng = np.random.default_rng(1)
    decoded = np.full((4, 16, 16), -1, np.int16)
    decoded[1, 2:5, 2:5] = 3
    decoded[2, 10:12, 10:13] = 7
    labels = native.label_components(decoded)
    distance = rng.random(decoded.shape).astype(np.float32)
    magnitude = rng.random(decoded.shape).astype(np.float32) * 3
    scaled = rng.random((4, *decoded.shape)).astype(np.float32)
    host = component_stats_host(
        decoded, labels, distance, magnitude, scaled,
        collect_weighted_centroids=True,
    )
    dev = component_stats(
        jnp.asarray(decoded.astype(np.int32)), jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(distance), jnp.asarray(magnitude), jnp.asarray(scaled),
        capacity=16,
    )
    dvalid = np.asarray(dev["valid"])
    assert host["valid"].sum() == dvalid.sum() == 2
    for key in ("area", "distance_min", "magnitude_mean", "codeword"):
        np.testing.assert_allclose(
            host[key], np.asarray(dev[key])[dvalid], rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(
        host["centroid_zyx"], np.asarray(dev["centroid_zyx"])[dvalid],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        host["bit_means"], np.asarray(dev["bit_means"])[:, dvalid],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        host["moments"], np.asarray(dev["moments"])[dvalid], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        host["bit_w_coord_sums"],
        np.asarray(dev["bit_w_coord_sums"])[:, dvalid],
        rtol=1e-4, atol=1e-4,
    )


def _random_decoded(shape=(6, 24, 24), n_genes=5, seed=0):
    rng = np.random.default_rng(seed)
    decoded = np.full(shape, -1, np.int32)
    for g in range(n_genes):
        m = rng.random(shape) > 0.88
        decoded[m] = g
    return decoded


def test_label_components_sparse_matches_dense():
    """Sparse (lin, roots) must induce the same partition as the dense
    labels (ids are implementation-defined; equality structure is not)."""
    decoded = _random_decoded()
    dense = native.label_components(decoded)
    flat = dense.ravel()
    lin_ref = np.flatnonzero(flat >= 0)
    lin, roots = native.label_components_sparse(decoded)
    np.testing.assert_array_equal(lin, lin_ref)
    # same partition: mapping root ids <-> dense root ids is a bijection
    ref_roots = flat[lin_ref]
    pairs = set(zip(roots.tolist(), ref_roots.tolist()))
    assert len(pairs) == len(set(roots.tolist())) == len(set(ref_roots.tolist()))
    # 2D mode too
    lin2, roots2 = native.label_components_sparse(decoded, use_2d=True)
    flat2 = native.label_components(decoded, use_2d=True).ravel()
    np.testing.assert_array_equal(lin2, np.flatnonzero(flat2 >= 0))
    ref2 = flat2[lin2]
    pairs2 = set(zip(roots2.tolist(), ref2.tolist()))
    assert len(pairs2) == len(set(roots2.tolist())) == len(set(ref2.tolist()))


def test_component_stats_host_sparse_labels_match_dense():
    from merfish3d_tpu.ops.cc import component_stats_host

    decoded = _random_decoded()
    rng = np.random.default_rng(8)
    dist = rng.random(decoded.shape).astype(np.float32)
    mag = rng.random(decoded.shape).astype(np.float32)
    scaled = rng.random((4,) + decoded.shape).astype(np.float32)
    dense = component_stats_host(
        decoded, native.label_components(decoded), dist, mag, scaled
    )
    sparse = component_stats_host(
        decoded, native.label_components_sparse(decoded), dist, mag, scaled
    )
    for k in ("area", "centroid_zyx", "codeword", "distance_min",
              "magnitude_mean", "bit_means", "moments"):
        np.testing.assert_allclose(
            np.asarray(dense[k]), np.asarray(sparse[k]), rtol=1e-6,
            err_msg=k,
        )
