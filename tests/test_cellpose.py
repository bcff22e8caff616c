"""Native flow-field segmentation (`models/cellpose.py`).

The reference delegates segmentation to Cellpose-SAM
(`cli/qi2lab_microscopes/segment_fiducial.py:24-270`); this suite pins
the native flow-field path: the follower splits touching cells from
analytic flows (the property thresholding cannot provide), a short
synthetic training run yields a model whose end-to-end `flow_segment`
recovers held-out cells, and the trained route drives the pipeline's
`segment_fiducial(method="flow")` contract.
"""

import numpy as np
import pytest

from merfish3d_tpu.models.cellpose import (
    CPNet,
    flow_segment,
    flows_to_masks,
    follow_flows,
    init_cpnet,
    masks_to_flows,
    render_cell_batch,
    train_cpnet,
)


def _touching_disks(size=64):
    """Two touching disks sharing a straight boundary (GT mask)."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    c1, c2, r = (32.0, 22.0), (32.0, 42.0), 11.0
    d1 = (yy - c1[0]) ** 2 + (xx - c1[1]) ** 2
    d2 = (yy - c2[0]) ** 2 + (xx - c2[1]) ** 2
    mask = np.zeros((size, size), np.int32)
    mask[(d1 <= r**2) & (d1 <= d2)] = 1
    mask[(d2 < r**2) & (d2 < d1)] = 2
    return mask


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


def test_follow_flows_splits_touching_cells():
    """Analytic center flows advect each disk's pixels to its own sink;
    the reconstruction recovers both cells with the GT boundary."""
    gt = _touching_disks()
    flows = masks_to_flows(gt)
    import jax.numpy as jnp

    final = np.asarray(
        follow_flows(jnp.asarray(flows), jnp.asarray(gt > 0), n_iter=100)
    )
    labels = flows_to_masks(final, gt > 0, min_area=20)
    assert labels.max() == 2, "touching disks must split into two cells"
    # each recovered cell matches one GT cell (labels may swap)
    ious = np.zeros((2, 2))
    for i in (1, 2):
        for j in (1, 2):
            ious[i - 1, j - 1] = _iou(gt == i, labels == j)
    best = max(ious[0, 0] + ious[1, 1], ious[0, 1] + ious[1, 0]) / 2
    assert best > 0.9, f"split boundary wrong (mean IoU {best:.3f})"
    # a single connected-component labeling of the same foreground merges
    # them — the property the flow field adds
    import scipy.ndimage

    _, n_cc = scipy.ndimage.label(gt > 0)
    assert n_cc == 1


def test_flows_to_masks_drops_noise_sinks():
    gt = _touching_disks()
    flows = masks_to_flows(gt)
    import jax.numpy as jnp

    fg = gt > 0
    # inject 3 isolated stray foreground pixels with zero flow: they land
    # on themselves and must be dropped by the sink-mass gate
    fg_noisy = fg.copy()
    fg_noisy[2, 2] = fg_noisy[2, 60] = fg_noisy[60, 2] = True
    final = np.asarray(
        follow_flows(jnp.asarray(flows), jnp.asarray(fg_noisy), n_iter=100)
    )
    labels = flows_to_masks(final, fg_noisy, min_area=20, min_sink_mass=9)
    assert labels.max() == 2
    assert labels[2, 2] == labels[2, 60] == labels[60, 2] == 0


def test_cpnet_shapes_and_determinism():
    import jax.numpy as jnp

    net = CPNet(base_features=8, mults=(1, 2))
    variables = init_cpnet(net, size=32)
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    out = net.apply(variables, x)
    assert out.shape == (1, 32, 32, 3)
    out2 = net.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_train_and_segment_recovers_cells():
    """A short synthetic training run produces a model that segments a
    HELD-OUT render: cell count within 1 of GT and mean matched IoU
    above 0.5 (the flow follower does the precision work; the net only
    needs approximately centerward flows)."""
    net = CPNet(base_features=16, mults=(1, 2, 4))
    variables = train_cpnet(steps=300, seed=0, net=net, batch=4, size=64)
    rng = np.random.default_rng(123)
    images, masks = render_cell_batch(rng, batch=1, size=64, max_cells=3)
    labels = flow_segment(images[0], variables, net=net, min_area=25)
    n_gt = masks[0].max()
    assert abs(int(labels.max()) - int(n_gt)) <= 1, (
        f"expected ~{n_gt} cells, got {labels.max()}"
    )
    # every GT cell should overlap a recovered cell decently
    matched = []
    for cell in range(1, n_gt + 1):
        best = max(
            (_iou(masks[0] == cell, labels == j) for j in range(1, labels.max() + 1)),
            default=0.0,
        )
        matched.append(best)
    assert np.mean(matched) > 0.5, f"matched IoUs {matched}"
