"""Full-model converter test: build a reference-style state dict (keys named
after the reference module tree, values taken from OUR initialized params
via an independent reverse mapping), convert it, and require 100% coverage
of the flax param tree with exact value roundtrip. Catches transpose bugs,
naming drift, and unmapped modules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.models import GlassRGBD
from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax, coverage
from gwdepth_tpu.convert.torch_weights import merge_params


def _ref_key(path):
    """OUR param path -> reference torch key (independent reverse map,
    written from the reference module tree)."""
    p = list(path)

    def lin(stem, leaf):
        return f"{stem}.{'weight' if leaf == 'kernel' else 'bias'}"

    def norm(stem, leaf):
        return f"{stem}.{'weight' if leaf == 'scale' else 'bias'}"

    def convln(stem, sub):  # sub = [conv|ln, leaf]
        if sub[0] == "conv":
            return f"{stem}.conv.weight"
        return norm(f"{stem}.layer_norm", sub[1])

    def pyramid(stem, sub):
        m = sub[0]
        table = {"first0": "firstconv.0", "first1": "firstconv.2",
                 "layer1_0": "layer1.0", "layer2_0": "layer2.0",
                 "layer2_1": "layer2.1", "layer3_0": "layer3.0",
                 "layer3_1": "layer3.1", "branch1": "branch1.1",
                 "branch2": "branch2.1", "branch3": "branch3.1",
                 "branch4": "branch4.1", "last0": "lastconv.0"}
        if m == "last1":
            return f"{stem}.lastconv.2.weight"
        ref = f"{stem}.{table[m]}"
        if m.startswith("layer"):
            blk = {"conv1": "conv1.0", "conv2": "conv2"}[sub[1]]
            return convln(f"{ref}.{blk}", sub[2:])
        return convln(ref, sub[1:])

    def swin_attn(stem, sub):
        m = sub[0]
        if m == "rel_pos_bias":
            return f"{stem}.relative_position_bias_table"
        if m == "ref":
            if sub[1] in ("diff_mu", "diff_logsigma"):
                return f"{stem}.{sub[1]}"
            if sub[1] == "ref_qk":
                return lin(f"{stem}.ref_qk", sub[2])
            if sub[1] == "ref_attn_diffusion":
                leaf = "weight" if sub[2] == "conv_kernel" else "bias"
                return f"{stem}.ref_attn_diffusion.{leaf}"
        return lin(f"{stem}.{m}", sub[1])

    def block(stem, sub):
        m = sub[0]
        if m == "attn":
            return swin_attn(f"{stem}.attn", sub[1:])
        if m.startswith("norm"):
            return norm(f"{stem}.{m}", sub[1])
        if m.startswith("mlp"):
            return lin(f"{stem}.{m}.{sub[1]}", sub[2])
        raise KeyError(m)

    head = p[0]
    if head == "backbone":
        layer = p[1]
        if layer == "conv1":
            return "backbone.0.body.conv1.weight"
        if layer == "bn1":
            return f"backbone.0.body.bn1.{p[2]}"
        blk = p[2].replace("block", "")
        mod = p[3]
        if mod == "downsample_conv":
            return f"backbone.0.body.{layer}.{blk}.downsample.0.weight"
        if mod == "downsample_bn":
            return f"backbone.0.body.{layer}.{blk}.downsample.1.{p[4]}"
        if mod.startswith("conv"):
            return f"backbone.0.body.{layer}.{blk}.{mod}.weight"
        return f"backbone.0.body.{layer}.{blk}.{mod}.{p[4]}"
    if head == "query_embed":
        return "query_embed.weight"
    if head in ("input_proj", "dense_input_proj"):
        return f"{head}.{'weight' if p[1] == 'kernel' else 'bias'}"
    if head == "class_embed":
        return lin("class_embed", p[1])
    if head == "lines_embed":
        n = p[1].replace("layer", "")
        return lin(f"lines_embed.layers.{n}", p[2])
    if head == "transformer":
        if p[1] == "decoder_norm":
            return norm("transformer.decoder.norm", p[2])
        side, n = p[1].rsplit("_layer", 1)
        stem = f"transformer.{side}.layers.{n}.{p[2]}"
        if p[2] in ("self_attn", "multihead_attn"):
            if p[3].startswith("in_proj"):
                return f"{stem}.{p[3]}"
            return lin(f"{stem}.out_proj", p[4])
        if p[2].startswith("norm"):
            return norm(stem, p[3])
        return lin(stem, p[3])
    if head == "dense_encoder":
        m = p[1]
        stem = f"dense_encoder.{m}"
        if m in ("depth_token", "seg_token"):
            return f"dense_encoder.{m}"
        if m == "dense_transformer" or m.startswith("class_transformer"):
            n = p[2].replace("block", "")
            return block(f"{stem}.blocks.{n}", p[3:])
        if m.startswith("depth_pred"):
            idx = {"fc1": "0", "fc2": "1"}[p[2]]
            return lin(f"{stem}.{idx}", p[3])
        if m.startswith("proj_class"):
            return lin(stem, p[2])
        if m.startswith("proj_backbn"):
            return f"{stem}.conv.{'weight' if p[3] == 'kernel' else 'bias'}"
        if m.startswith("old_"):
            if p[2] == "norm":
                return norm(f"{stem}.norm", p[3])
            return lin(f"{stem}.{p[2]}", p[3])
        if m.startswith("point_based_pred"):
            if p[2] in ("pre_proj", "refer_proj"):
                return lin(f"{stem}.{p[2]}", p[3])
            return pyramid(f"{stem}.pyramid", p[3:])
        raise KeyError(m)
    if head == "depth_decoder":
        m = p[1]
        stem = f"depth_decoder.{m}"
        if m.endswith("token_fuse"):
            return lin(f"{stem}.{p[2]}", p[3])
        if m.startswith("upconv"):
            return f"{stem}.conv.weight"
        if m.startswith("norm"):
            return norm(stem, p[2])
        if m.startswith("conv1") or m.startswith("conv2"):
            return f"{stem}.0.weight"
        if m in ("get_depth", "get_seg"):
            return f"{stem}.0.weight"
        raise KeyError(m)
    raise KeyError(head)


def _to_torch_layout(path, val):
    """OUR value -> reference torch layout (inverse of the converter)."""
    leaf = path[-1]
    v = np.asarray(val)
    if leaf == "kernel" and v.ndim == 4:
        return v.transpose(3, 2, 0, 1)        # HWIO -> OIHW
    if leaf == "conv_kernel":
        return v.transpose(3, 2, 0, 1)
    if leaf == "kernel" and v.ndim == 2:
        return v.T
    return v


def test_full_model_converter_roundtrip():
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    params = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(3),
                   jnp.zeros((1, *cfg.train_hw, 3)))["params"])

    # build the reference-style state dict from our params
    state = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, val in flat:
        path = tuple(k.key for k in kp)
        state[_ref_key(path)] = _to_torch_layout(path, val)
    # sprinkle reference-only keys that must be ignored
    state["dense_encoder.class_transformer1.blocks.0.attn.border_mu"] = \
        np.zeros((1, 1, 4))
    state["dense_encoder.point_based_pred1.pyramid.layer4.0.conv1.0.conv.weight"] = \
        np.zeros((3, 3, 3, 3))

    overlay = glassrgbd_torch_to_flax(state)
    cov, total, missing = coverage(overlay, params)
    assert cov == total, f"uncovered {len(missing)}/{total}: {missing[:12]}"

    merged = merge_params(params, overlay)
    for kp, val in flat:
        got = merged
        for k in kp:
            got = got[k.key]
        np.testing.assert_allclose(np.asarray(got), val, atol=0,
                                   err_msg=str(kp))
