"""torch checkpoint → flax params converters.

Mirrors the reference's resume-time key surgery — stripping ``module.``
prefixes and renaming ``bbox_embed``→``lines_embed``
(reference: src/main_glassrgbd.py:129-157) — and maps torchvision ResNet
state dicts onto `gwdepth_tpu.models.resnet.ResNetBackbone` so DETR-R50
warm starts (reference: main_glassrgbd.py:107-127) stay available on TPU.

Tensor layout rules:
  conv weight   (O, I, kh, kw) -> kernel (kh, kw, I, O)
  linear weight (O, I)         -> kernel (I, O)
  everything else passes through.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def normalize_torch_keys(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DDP prefixes and apply the reference's legacy renames
    (main_glassrgbd.py:132-144)."""
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        k = k.replace("bbox_embed", "lines_embed")
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def resnet_torch_to_flax(state: Mapping[str, np.ndarray],
                         prefix: str = "") -> dict:
    """Convert a torchvision-style ResNet state dict (optionally under
    `prefix`, e.g. ``backbone.0.body.``) to ResNetBackbone params."""
    state = normalize_torch_keys(state)
    params: dict = {}
    bn_parts = ("weight", "bias", "running_mean", "running_var")

    for key, val in state.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        if parts[0] == "conv1" and parts[1] == "weight":
            _set(params, "conv1/kernel", _conv(val))
        elif parts[0] == "bn1" and parts[1] in bn_parts:
            _set(params, f"bn1/{parts[1]}", val)
        elif parts[0].startswith("layer"):
            layer, block = parts[0], f"block{parts[1]}"
            sub = parts[2]
            if sub.startswith("conv"):
                _set(params, f"{layer}/{block}/{sub}/kernel", _conv(val))
            elif sub.startswith("bn"):
                _set(params, f"{layer}/{block}/{sub}/{parts[3]}", val)
            elif sub == "downsample":
                if parts[3] == "0":
                    _set(params, f"{layer}/{block}/downsample_conv/kernel",
                         _conv(val))
                else:
                    _set(params, f"{layer}/{block}/downsample_bn/{parts[4]}",
                         val)
        elif parts[0] == "fc":
            continue  # classification head unused (feature pyramid only)
    return params
