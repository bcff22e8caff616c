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
