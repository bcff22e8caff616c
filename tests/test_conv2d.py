"""Lane-packed Pallas conv (`ops/conv2d.py`) vs lax.conv, and the
U-FISH fast path (`models/ufish._FastUNet`) vs the Flax apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from merfish3d_tpu.ops.conv2d import conv2d_lanepack, supported


def _ref_conv(x, w, b, act):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(w, jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b, jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y


@pytest.mark.parametrize(
    "shape,kshape,act",
    [
        ((2, 32, 64, 32), (3, 3, 32, 32), "relu"),   # g=4, the c32 layer
        ((1, 16, 32, 64), (3, 3, 64, 64), "none"),   # g=2
        ((1, 16, 16, 128), (3, 3, 128, 64), "relu"), # g=1, Co<Ci
        ((1, 16, 32, 64), (2, 2, 64, 32), "none"),   # even kernel (decoder)
        ((1, 16, 32, 32), (3, 3, 32, 64), "relu"),   # Co>Ci
        ((1, 16, 32, 64), (1, 1, 64, 128), "sigmoid"),
    ],
)
def test_lanepack_matches_lax_conv(shape, kshape, act):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    w = (rng.standard_normal(kshape) * 0.2).astype(np.float32)
    b = rng.standard_normal(kshape[-1]).astype(np.float32)
    assert supported(shape, kshape)
    with pltpu.force_tpu_interpret_mode():
        y = conv2d_lanepack(jnp.asarray(x), w, b, act=act)
    ref = np.asarray(_ref_conv(jnp.asarray(x), w, b, act))
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               atol=2e-5 * scale)


def test_lanepack_supported_policy():
    assert not supported((1, 16, 32, 1), (3, 3, 1, 32))    # Cin=1
    assert not supported((1, 16, 30, 32), (3, 3, 32, 32))  # W*C % 128
    assert not supported((1, 16, 32, 32), (3, 3, 32, 1))   # out lanes < 8
    assert supported((1, 16, 32, 32), (3, 3, 32, 32))


@pytest.mark.parametrize("up_mode", ["resize", "convtranspose"])
def test_fast_unet_matches_flax_apply(up_mode, monkeypatch):
    """_FastUNet (BN folded, lane-packed convs) must reproduce
    UFishNet.apply on the same variables in f32."""
    from merfish3d_tpu.models.ufish import UFishNet, _FastUNet

    net = UFishNet(up_mode=up_mode)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 1), jnp.float32))
    fast = _FastUNet(variables, net)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 64, 1)).astype(np.float32))
    ref = np.asarray(net.apply(variables, x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fast(x), np.float32)
    np.testing.assert_allclose(out, ref[..., :], atol=5e-5)
