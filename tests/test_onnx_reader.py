"""Minimal ONNX initializer reader round-trip tests."""

import numpy as np

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
