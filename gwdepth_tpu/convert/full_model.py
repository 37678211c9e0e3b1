"""Full GlassRGBD checkpoint converter: reference torch state dict -> flax.

Maps every ACTIVE parameter of the reference's stage-1 model
(reference module tree: src/models/glassrgbd.py:44-72 top level,
src/models/multiscale_transformerr.py:1025-1136 dense encoder,
src/models/points/points_sample.py:45-125 pyramids,
src/models/dense_upsample.py:114-147 decoder) onto this framework's param
paths, so a user can bring a trained reference checkpoint across.

Layout rules as in torch_weights.py: conv (O,I,kh,kw)->(kh,kw,I,O),
linear (O,I)->(I,O), norms/bias verbatim. The in_proj fused MHA weight
stays in torch layout (our MultiheadAttention consumes it directly).

Key structural mappings (ours <- reference):
  transformer/encoder_layerN/*      <- transformer.encoder.layers.N.*
  dense_encoder/dense_transformer/blockN <- dense_encoder.dense_transformer.blocks.N
  attn/ref/{ref_qk,diff_mu,diff_logsigma} <- attn.{ref_qk,diff_mu,diff_logsigma}
  attn/ref/ref_attn_diffusion/conv_*      <- attn.ref_attn_diffusion.{weight,bias}
  points pyramids: first0/first1/layerK_J/branchK/last0/last1
      <- firstconv.{0,2}/layerK.J.{conv1.0,conv2}/branchK.1/lastconv.{0,2}
  decoder: upconvK_*/convK_* <- upconvK_*.conv / convK_*.0
The reference builds a pyramid `layer4` its forward never calls
(points_sample.py:58) — those keys are ignored.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from gwdepth_tpu.convert.torch_weights import (
    normalize_torch_keys, resnet_torch_to_flax, _conv, _set)


def _put_linear(params: dict, dst: str, key: str, val: np.ndarray):
    _set(params, f"{dst}/{'kernel' if key == 'weight' else 'bias'}",
         val.T if key == "weight" else val)


def _put_norm(params: dict, dst: str, key: str, val: np.ndarray):
    _set(params, f"{dst}/{'scale' if key == 'weight' else 'bias'}", val)


def _put_conv(params: dict, dst: str, key: str, val: np.ndarray):
    _set(params, f"{dst}/{'kernel' if key == 'weight' else 'bias'}",
         _conv(val) if key == "weight" else val)


def _map_mha(params, dst, rest, val):
    if rest[0] in ("in_proj_weight", "in_proj_bias"):
        _set(params, f"{dst}/{rest[0]}", val)
    elif rest[0] == "out_proj":
        _put_linear(params, f"{dst}/out_proj", rest[1], val)


def _map_convln(params, dst, rest, val):
    """reference ConvLn: conv / layer_norm (points_sample.py:12-25)."""
    if rest[0] == "conv":
        _put_conv(params, f"{dst}/conv", rest[1], val)
    elif rest[0] == "layer_norm":
        _put_norm(params, f"{dst}/ln", rest[1], val)


def _map_pyramid(params, dst, rest, val):
    """(points_sample.py:45-92): Sequential indices -> named modules."""
    mod = rest[0]
    if mod == "firstconv":
        idx = {"0": "first0", "2": "first1"}.get(rest[1])
        if idx:
            _map_convln(params, f"{dst}/{idx}", rest[2:], val)
    elif mod in ("layer1", "layer2", "layer3"):
        blk = f"{mod}_{rest[1]}"
        sub = rest[2]
        if sub == "conv1":              # Sequential(ConvLn, GELU)
            _map_convln(params, f"{dst}/{blk}/conv1", rest[4:], val)
        elif sub == "conv2":
            _map_convln(params, f"{dst}/{blk}/conv2", rest[3:], val)
    elif mod.startswith("branch"):
        # Sequential(AvgPool, ConvLn, GELU) -> index 1 is the ConvLn
        if rest[1] == "1":
            _map_convln(params, f"{dst}/{mod}", rest[2:], val)
    elif mod == "lastconv":
        if rest[1] == "0":
            _map_convln(params, f"{dst}/last0", rest[2:], val)
        elif rest[1] == "2":
            _put_conv(params, f"{dst}/last1", rest[3] if len(rest) > 3
                      else rest[2], val)
    # layer4: built but never called in the reference -> ignored


def _map_swin_attn(params, dst, rest, val, has_tokens: bool):
    """WindowAttention / WindowClassAttention params
    (multiscale_transformerr.py:216-262, 389-452)."""
    name = rest[0]
    if name == "qkv":
        _put_linear(params, f"{dst}/qkv", rest[1], val)
    elif name == "proj":
        _put_linear(params, f"{dst}/proj", rest[1], val)
    elif name == "relative_position_bias_table":
        _set(params, f"{dst}/rel_pos_bias/relative_position_bias_table", val)
    elif name in ("diff_mu", "diff_logsigma"):
        _set(params, f"{dst}/ref/{name}", val)
    elif name == "ref_qk":
        _put_linear(params, f"{dst}/ref/ref_qk", rest[1], val)
    elif name == "ref_attn_diffusion":
        if rest[1] == "weight":
            _set(params, f"{dst}/ref/ref_attn_diffusion/conv_kernel",
                 _conv(val))
        else:
            _set(params, f"{dst}/ref/ref_attn_diffusion/conv_bias", val)
    elif has_tokens and name in ("cls_dth_q", "cls_seg_q", "global_k",
                                 "global_v", "proj_dth"):
        _put_linear(params, f"{dst}/{name}", rest[1], val)
    # border_mu/border_logsigma, proj_seg, proj_*_drop: unused in reference
    # forward -> ignored


def _map_token_fuse(params, dst, rest, val):
    """PointGuidedTokenFuse (geometry_utils.py:535-652), reachable when a
    block is built with token_fuse=True (multiscale_transformerr.py:633)."""
    name = rest[0]
    if name in ("xseg_proj", "xdth_proj", "kv_refer_depth", "q_seg",
                "mlpctx"):
        _put_linear(params, f"{dst}/{name}/{rest[1]}", rest[2], val)
    elif name in ("norm_seg", "norm_fuse") or name.startswith("convctx_norm"):
        _put_norm(params, f"{dst}/{name}", rest[1], val)
    elif name in ("fuse_proj", "fused_depth_proj", "mutil_depth_fuse"):
        _put_linear(params, f"{dst}/{name}", rest[1], val)
    elif name.startswith("convctx_pre"):
        # Sequential(ConvA, ConvA) -> convctx_preK_{0,1}/conv
        _put_conv(params, f"{dst}/{name}_{rest[1]}/conv", rest[3], val)
    elif name.startswith("convctx_after"):
        _put_conv(params, f"{dst}/{name}/conv", rest[2], val)


def _map_swin_block(params, dst, rest, val):
    """(multiscale_transformerr.py:601-644)."""
    name = rest[0]
    if name == "attn":
        _map_swin_attn(params, f"{dst}/attn", rest[1:], val, True)
    elif name in ("norm1", "norm2", "norm_depth1", "norm_depth2",
                  "norm_seg1", "norm_seg2"):
        _put_norm(params, f"{dst}/{name}", rest[1], val)
    elif name in ("mlp", "mlp_depth", "mlp_seg"):
        _put_linear(params, f"{dst}/{name}/{rest[1]}", rest[2], val)
    elif name == "token_relation":
        _map_token_fuse(params, f"{dst}/token_relation", rest[1:], val)


def _map_basic_layer(params, dst, rest, val):
    if rest[0] == "blocks":
        _map_swin_block(params, f"{dst}/block{rest[1]}", rest[2:], val)


def _map_seq_head(params, dst, rest, val):
    """depth_predXX = Sequential(Linear, Linear, Sigmoid)
    (multiscale_transformerr.py:1044-1045) -> DepthHead fc1/fc2."""
    idx = {"0": "fc1", "1": "fc2"}.get(rest[0])
    if idx:
        _put_linear(params, f"{dst}/{idx}", rest[1], val)


def _map_conva(params, dst, rest, val):
    if rest[0] == "conv":
        _put_conv(params, f"{dst}/conv", rest[1], val)


def _map_mlpnorm(params, dst, rest, val):
    if rest[0] in ("fc1", "fc2"):
        _put_linear(params, f"{dst}/{rest[0]}", rest[1], val)
    elif rest[0] == "norm":
        _put_norm(params, f"{dst}/norm", rest[1], val)


def _map_point_pred(params, dst, rest, val):
    if rest[0] in ("pre_proj", "refer_proj"):
        _put_linear(params, f"{dst}/{rest[0]}", rest[1], val)
    elif rest[0] == "pyramid":
        _map_pyramid(params, f"{dst}/pyramid", rest[1:], val)


def _map_dense_encoder(params, rest, val):
    dst = "dense_encoder"
    name = rest[0]
    if name in ("depth_token", "seg_token"):
        # reference shape (1, 1, tC) -> ours (1, 1, tC)
        _set(params, f"{dst}/{name}", val.reshape(1, 1, -1))
    elif name in ("point_depth_token", "init_token"):
        # with_line_depth params (multiscale_transformerr.py:1028-1029),
        # shapes identical: (1, nP, tC) / (1, cis, cis, tC)
        _set(params, f"{dst}/{name}", val)
    elif name.startswith("gpg"):
        # Global2PointGraph Mlps (geometry_utils.py:476-485);
        # dpeth_token_proj is constructed but never used in the reference
        # forward (:490-533) -> ignored, like the pyramid layer4
        if rest[1] in ("node_relation", "node_attention", "token_node_fuse"):
            _put_linear(params, f"{dst}/{name}/{rest[1]}/{rest[2]}",
                        rest[3], val)
    elif name == "dense_transformer":
        _map_basic_layer(params, f"{dst}/dense_transformer", rest[1:], val)
    elif name.startswith("class_transformer"):
        _map_basic_layer(params, f"{dst}/{name}", rest[1:], val)
    elif name.startswith("depth_pred"):
        _map_seq_head(params, f"{dst}/{name}", rest[1:], val)
    elif name.startswith("proj_class"):
        _put_linear(params, f"{dst}/{name}", rest[1], val)
    elif name.startswith("proj_backbn"):
        _map_conva(params, f"{dst}/{name}", rest[1:], val)
    elif name.startswith("old_depth_token_proj") or \
            name.startswith("old_seg_token_proj"):
        _map_mlpnorm(params, f"{dst}/{name}", rest[1:], val)
    elif name.startswith("point_based_pred"):
        _map_point_pred(params, f"{dst}/{name}", rest[1:], val)
    # pos encoders have no params; certainSample has none


def _map_decoder(params, rest, val):
    """(dense_upsample.py:114-147)."""
    dst = "depth_decoder"
    name = rest[0]
    if name in ("depth_token_fuse", "seg_token_fuse"):
        _put_linear(params, f"{dst}/{name}/{rest[1]}", rest[2], val)
    elif name.startswith("upconv"):
        if rest[1] == "conv":
            _put_conv(params, f"{dst}/{name}/conv", rest[2], val)
    elif name in ("norm_depth", "norm_seg"):
        _put_norm(params, f"{dst}/{name}", rest[1], val)
    elif name.startswith("conv1") or name.startswith("conv2"):
        # Sequential(Conv2d, ELU) -> index 0
        if rest[1] == "0":
            _put_conv(params, f"{dst}/{name}", rest[2], val)
    elif name in ("get_depth", "get_seg"):
        if rest[1] == "0" or rest[1] == "weight":
            key = rest[2] if rest[1] == "0" else rest[1]
            _put_conv(params, f"{dst}/{name}", key, val)


def glassrgbd_torch_to_flax(state: Mapping[str, np.ndarray]) -> dict:
    """Convert a reference GlassRGBD checkpoint ('model' entry) to a param
    overlay for gwdepth_tpu.models.GlassRGBD; merge with
    torch_weights.merge_params."""
    state = normalize_torch_keys(state)
    params: dict = {}
    backbone_sd = {k[len("backbone.0.body."):]: v for k, v in state.items()
                   if k.startswith("backbone.0.body.")}
    if backbone_sd:
        params["backbone"] = resnet_torch_to_flax(backbone_sd)

    for key, val in state.items():
        parts = key.split(".")
        head = parts[0]
        if head == "backbone":
            continue
        if head == "query_embed":
            params["query_embed"] = val
        elif head in ("input_proj", "dense_input_proj"):
            _put_conv(params, head, parts[1], val)
        elif head == "class_embed":
            _put_linear(params, "class_embed", parts[1], val)
        elif head == "lines_embed":
            # MLP layers.N -> layerN (reference glassrgbd.py:30-42)
            _put_linear(params, f"lines_embed/layer{parts[2]}", parts[3], val)
        elif head == "transformer":
            side = parts[1]
            if side == "decoder" and parts[2] == "norm":
                _put_norm(params, "transformer/decoder_norm", parts[3], val)
            elif parts[2] == "layers":
                dst = f"transformer/{side}_layer{parts[3]}"
                mod = parts[4]
                if mod in ("self_attn", "multihead_attn"):
                    _map_mha(params, f"{dst}/{mod}", parts[5:], val)
                elif mod in ("linear1", "linear2"):
                    _put_linear(params, f"{dst}/{mod}", parts[5], val)
                elif mod.startswith("norm"):
                    _put_norm(params, f"{dst}/{mod}", parts[5], val)
        elif head == "dense_encoder":
            _map_dense_encoder(params, parts[1:], val)
        elif head == "depth_decoder":
            _map_decoder(params, parts[1:], val)
    return params


def coverage(overlay: dict, target: dict, prefix: str = ""
             ) -> Tuple[int, int, list]:
    """How many leaves of `target` the overlay fills (shape-matched).
    Returns (covered, total, missing_paths)."""
    covered = total = 0
    missing = []
    for k, v in target.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            c, t, m = coverage(overlay.get(k, {}), v, path)
            covered += c
            total += t
            missing += m
        else:
            total += 1
            o = overlay.get(k)
            if o is not None and tuple(np.shape(o)) == tuple(np.shape(v)):
                covered += 1
            else:
                missing.append(path)
    return covered, total, missing
