"""Minimal ONNX initializer reader round-trip tests."""

import numpy as np
import pytest

from merfish3d_tpu.models.onnx_reader import (
    conv_to_flax,
    encode_test_model,
    load_onnx_initializers,
)


def test_initializer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv1.weight": rng.normal(size=(32, 1, 3, 3)).astype(np.float32),
        "conv1.bias": rng.normal(size=(32,)).astype(np.float32),
        "bn1.running_mean": rng.normal(size=(32,)).astype(np.float32),
    }
    path = tmp_path / "model.onnx"
    path.write_bytes(encode_test_model(tensors))
    loaded = load_onnx_initializers(path)
    assert set(loaded) == set(tensors)
    for name in tensors:
        np.testing.assert_array_equal(loaded[name], tensors[name])


def test_conv_to_flax_transpose():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    k = conv_to_flax(w)
    assert k.shape == (5, 7, 3, 2)
    np.testing.assert_array_equal(k[1, 2, 1, 0], w[0, 1, 1, 2])


def test_ufish_onnx_structural_roundtrip(tmp_path):
    """UFishNet variables → torch-convention ONNX initializers → structural
    converter → identical predictions (name-agnostic weight loading)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from merfish3d_tpu.models.onnx_reader import encode_test_model
    from merfish3d_tpu.models.ufish import UFishNet, UFishPredictor
    from merfish3d_tpu.models.ufish_onnx import (
        export_flax_to_onnx_initializers,
        load_ufish_onnx_params,
        structural_onnx_to_flax,
    )

    net = UFishNet(base_features=4)
    variables = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)))
    variables = jax.tree.map(np.asarray, jax.device_get(variables))

    for conv_bias in (True, False):
        tensors = export_flax_to_onnx_initializers(
            variables, base_features=4, conv_bias=conv_bias
        )
        path = tmp_path / f"ufish_bias{conv_bias}.onnx"
        path.write_bytes(encode_test_model(tensors))
        restored = load_ufish_onnx_params(path, base_features=4)

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 16, 1)), jnp.float32
        )
        ref = net.apply(variables, x)
        got = net.apply(restored, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # structural mismatch is reported, not silently mis-mapped
    bad = list(export_flax_to_onnx_initializers(variables, base_features=4).values())
    with pytest.raises(ValueError, match="does not match UFishNet"):  # family or layout
        structural_onnx_to_flax(bad[1:], base_features=4)  # first weight gone

    predictor = UFishPredictor(params=restored, base_features=4, pad_to=16)
    prob = predictor.predict(np.random.default_rng(1).normal(size=(2, 20, 24)))
    assert prob.shape == (2, 20, 24)
    assert prob.min() >= 0.0 and prob.max() <= 1.0
