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


# ---------------------------------------------------------------------------
# DETR-R50 warm start (reference: src/main_glassrgbd.py:107-127 loads the
# official DETR checkpoint, drops class_embed/bbox_embed/query_embed, and
# loads the rest non-strict)
# ---------------------------------------------------------------------------

_DETR_DROP = ("class_embed", "bbox_embed", "lines_embed", "query_embed")


def detr_torch_to_flax(state: Mapping[str, np.ndarray],
                       include_heads: bool = False) -> dict:
    """Convert a torch DETR state dict (the ``model`` entry of the official
    checkpoint) to this framework's param tree fragments:

      backbone.0.body.*           -> backbone/*
      transformer.encoder.layers.N.* -> transformer/encoder_layerN/*
      transformer.decoder.layers.N.* -> transformer/decoder_layerN/*
      transformer.decoder.norm.*  -> transformer/decoder_norm/*
      input_proj.*                -> input_proj/*
      query_embed.weight          -> query_embed          (if include_heads)

    Heads are dropped by default, matching the reference's warm-start filter
    (main_glassrgbd.py:112-121)."""
    state = normalize_torch_keys(state)
    params: dict = {}
    backbone_sd = {k[len("backbone.0.body."):]: v for k, v in state.items()
                   if k.startswith("backbone.0.body.")}
    if backbone_sd:
        params["backbone"] = resnet_torch_to_flax(backbone_sd)

    def put_linear(dst: str, key: str, val: np.ndarray):
        _set(params, f"{dst}/{'kernel' if key == 'weight' else 'bias'}",
             val.T if key == "weight" else val)

    for key, val in state.items():
        parts = key.split(".")
        if not include_heads and parts[0] in _DETR_DROP:
            continue
        if key == "query_embed.weight" and include_heads:
            params["query_embed"] = val
        elif key.startswith("input_proj."):
            # torch Conv2d 1x1 (O, I, 1, 1) -> (1, 1, I, O)
            if parts[1] == "weight":
                _set(params, "input_proj/kernel", _conv(val))
            else:
                _set(params, "input_proj/bias", val)
        elif key.startswith("transformer."):
            side = parts[1]                      # encoder | decoder
            if side == "decoder" and parts[2] == "norm":
                _set(params, f"transformer/decoder_norm/"
                     f"{'scale' if parts[3] == 'weight' else 'bias'}", val)
                continue
            if parts[2] != "layers":
                continue
            layer = f"transformer/{side}_layer{parts[3]}"
            rest = parts[4:]
            mod = rest[0]
            if mod in ("self_attn", "multihead_attn"):
                if rest[1] == "in_proj_weight":
                    _set(params, f"{layer}/{mod}/in_proj_weight", val)
                elif rest[1] == "in_proj_bias":
                    _set(params, f"{layer}/{mod}/in_proj_bias", val)
                elif rest[1] == "out_proj":
                    put_linear(f"{layer}/{mod}/out_proj", rest[2], val)
            elif mod in ("linear1", "linear2"):
                put_linear(f"{layer}/{mod}", rest[1], val)
            elif mod.startswith("norm"):
                _set(params, f"{layer}/{mod}/"
                     f"{'scale' if rest[1] == 'weight' else 'bias'}", val)
    return params


def merge_params(base: dict, overlay: dict) -> dict:
    """Non-strict load: recursively replace leaves of `base` present in
    `overlay` (shape-checked), keep the rest — the functional analogue of
    torch load_state_dict(strict=False) (main_glassrgbd.py:148-157)."""
    out = dict(base)
    for k, v in overlay.items():
        if k not in base:
            continue
        if isinstance(v, dict) and isinstance(base[k], dict):
            out[k] = merge_params(base[k], v)
        else:
            bv = base[k]
            if hasattr(bv, "shape") and tuple(bv.shape) != tuple(v.shape):
                continue
            out[k] = np.asarray(v, dtype=np.asarray(bv).dtype)
    return out
