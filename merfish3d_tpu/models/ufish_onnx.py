"""Structural ONNX → Flax weight conversion for :class:`UFishNet`.

The published U-FISH checkpoints ship as ONNX files (reference
`DataRegistration._load_ufish_model:138-175` loads them with onnxruntime).
Exporter tensor *names* vary between torch versions, so this converter is
name-agnostic: torch exports initializers in module-registration order,
which for a sequential U-Net equals forward order, and that order plus the
tensor *shapes* identifies every parameter unambiguously.

The expected module sequence for ``UFishNet(base_features, depths)``
(forward order, matching Flax's auto-naming in `ufish.py`):

- one ``ConvBlock`` per down level + bottleneck: Conv(3×3) → BatchNorm →
  Conv(3×3) → BatchNorm
- per up level: Conv(2×2) after the nearest-neighbour upsample, then a
  ``ConvBlock``
- final Conv(1×1) projection

ONNX side, per Conv: 4D weight (O, I, kH, kW) + optional 1D bias (O,);
per BatchNorm: four 1D tensors (gamma, beta, running_mean, running_var).
Convs feeding a BatchNorm are typically exported with ``bias=False`` —
both variants are accepted (a missing bias maps to zeros, matching the
affine identity).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Union

import numpy as np

from .onnx_reader import conv_to_flax, load_onnx_initializers


def module_sequence(
    base_features: int = 32, depths: Sequence[int] = (1, 2, 4)
) -> list[tuple[str, str, int]]:
    """Forward-order (flax_path, kind, features) for UFishNet — kept in
    lockstep with `UFishNet.__call__` (`ufish.py`)."""
    f = [base_features * d for d in depths]
    seq: list[tuple[str, str, int]] = []
    n_blocks = 0
    n_convs = 0

    def block(feats: int) -> None:
        nonlocal n_blocks
        prefix = f"ConvBlock_{n_blocks}"
        n_blocks += 1
        seq.append((f"{prefix}/Conv_0", "conv", feats))
        seq.append((f"{prefix}/BatchNorm_0", "bn", feats))
        seq.append((f"{prefix}/Conv_1", "conv", feats))
        seq.append((f"{prefix}/BatchNorm_1", "bn", feats))

    for feats in f[:-1]:
        block(feats)
    block(f[-1])
    for feats in reversed(f[:-1]):
        seq.append((f"Conv_{n_convs}", "conv", feats))
        n_convs += 1
        block(feats)
    seq.append((f"Conv_{n_convs}", "conv", 1))
    return seq


def _set_path(tree: dict, path: str, leaf: dict) -> None:
    node = tree
    parts = path.split("/")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = leaf


def structural_onnx_to_flax(
    tensors: "dict[str, np.ndarray] | list[np.ndarray]",
    base_features: int = 32,
    depths: Sequence[int] = (1, 2, 4),
) -> dict:
    """Map ONNX initializers (in file order) onto UFishNet variables.

    Returns the Flax variables dict ``{"params": ..., "batch_stats": ...}``.
    Raises ``ValueError`` with a full inventory when the tensor stream does
    not structurally match the architecture.
    """
    if isinstance(tensors, dict):
        ordered = [np.asarray(v) for v in tensors.values()]
    else:
        ordered = [np.asarray(v) for v in tensors]
    # drop empty/scalar bookkeeping tensors some exporters emit
    ordered = [t for t in ordered if t.ndim >= 1 and t.size > 0]

    seq = module_sequence(base_features, depths)
    params: dict = {}
    batch_stats: dict = {}
    pos = 0

    def fail(msg: str) -> ValueError:
        inventory = ", ".join(str(t.shape) for t in ordered)
        return ValueError(
            f"ONNX stream does not match UFishNet(base={base_features}, "
            f"depths={tuple(depths)}): {msg}. Initializer shapes: [{inventory}]"
        )

    i = 0
    while i < len(seq):
        path, kind, feats = seq[i]
        if kind == "conv":
            if pos >= len(ordered) or ordered[pos].ndim != 4:
                raise fail(f"expected 4D conv weight for {path} at stream "
                           f"position {pos}")
            w = ordered[pos]
            pos += 1
            if w.shape[0] != feats:
                raise fail(f"{path}: expected {feats} output features, ONNX "
                           f"weight has {w.shape[0]}")
            # count the run of 1D size-feats tensors that follows
            run = 0
            while (pos + run < len(ordered) and ordered[pos + run].ndim == 1
                   and ordered[pos + run].shape[0] == feats):
                run += 1
            next_is_bn = i + 1 < len(seq) and seq[i + 1][1] == "bn"
            if next_is_bn:
                if run == 4:
                    bias = np.zeros(feats, np.float32)  # conv bias=False
                elif run >= 5:
                    bias = ordered[pos]
                    pos += 1
                else:
                    raise fail(f"{path}: expected BatchNorm tensors after the "
                               f"conv weight, found a run of {run} 1D tensors")
            else:
                if run >= 1:
                    bias = ordered[pos]
                    pos += 1
                else:
                    bias = np.zeros(feats, np.float32)
            _set_path(params, path, {
                "kernel": conv_to_flax(w).astype(np.float32),
                "bias": np.asarray(bias, np.float32),
            })
        else:  # bn
            if pos + 4 > len(ordered) or any(
                ordered[pos + k].ndim != 1 or ordered[pos + k].shape[0] != feats
                for k in range(4)
            ):
                raise fail(f"expected 4 1D({feats}) BatchNorm tensors for "
                           f"{path} at stream position {pos}")
            gamma, beta, mean, var = ordered[pos : pos + 4]
            pos += 4
            _set_path(params, path, {
                "scale": np.asarray(gamma, np.float32),
                "bias": np.asarray(beta, np.float32),
            })
            _set_path(batch_stats, path, {
                "mean": np.asarray(mean, np.float32),
                "var": np.asarray(var, np.float32),
            })
        i += 1

    if pos != len(ordered):
        raise fail(f"{len(ordered) - pos} trailing initializers left over")
    return {"params": params, "batch_stats": batch_stats}


def load_ufish_onnx_params(
    path: Union[str, Path],
    base_features: int = 32,
    depths: Sequence[int] = (1, 2, 4),
) -> dict:
    """Load a U-FISH ONNX checkpoint into UFishNet variables."""
    return structural_onnx_to_flax(
        load_onnx_initializers(path), base_features=base_features, depths=depths
    )


def export_flax_to_onnx_initializers(variables: dict,
                                     base_features: int = 32,
                                     depths: Sequence[int] = (1, 2, 4),
                                     conv_bias: bool = True) -> dict:
    """Inverse mapping (torch export conventions): UFishNet variables →
    ordered ONNX initializer dict. Used by the round-trip test and for
    re-exporting converted checkpoints."""
    out: dict[str, np.ndarray] = {}

    def get(tree: dict, path: str) -> dict:
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    for idx, (path, kind, _feats) in enumerate(
        module_sequence(base_features, depths)
    ):
        if kind == "conv":
            leaf = get(variables["params"], path)
            out[f"w{idx}"] = np.transpose(
                np.asarray(leaf["kernel"]), (3, 2, 0, 1)
            )
            if conv_bias:
                out[f"b{idx}"] = np.asarray(leaf["bias"])
        else:
            p = get(variables["params"], path)
            s = get(variables["batch_stats"], path)
            out[f"g{idx}"] = np.asarray(p["scale"])
            out[f"be{idx}"] = np.asarray(p["bias"])
            out[f"m{idx}"] = np.asarray(s["mean"])
            out[f"v{idx}"] = np.asarray(s["var"])
    return out
