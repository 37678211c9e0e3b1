"""Reference-code parity for the geometry fusion library.

The real /root/reference/src/models/geometry_utils.py (and the
PointTokenAttention in multiscale_transformerr.py) is the oracle —
these replace the hand-written torch oracles of
tests/test_geometry_parity.py as ground truth for every module the
reference code can actually construct and run:

  * TokenFuse                  geometry_utils.py:183-244
  * PointTokenAttention        multiscale_transformerr.py:334-374
  * Global2PointGraph          geometry_utils.py:473-533
  * NonLocalPlannarGuidance    geometry_utils.py:246-328
    (+ PyramidConv :100-181 and ConvGRU :330-345 inside it)

Two modules are bitrotted in the reference itself and asserted as such
(behavior documented in gwdepth_tpu/models/geometry.py's docstring):
  * ReflectionReduce builds `upconv(...)` without importing it -> NameError
    (geometry_utils.py:355)
  * OffsetGeneration's forward is shape-inconsistent (points_sample.py:
    216-229 `.flatten(3)` is a no-op and the hull loop indexes a layout
    that cannot exist), so no reference output exists to match.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import get_ref, make_ref_args, state_dict_numpy, nchw

from gwdepth_tpu.config import tiny_test_config


@pytest.fixture(scope="module")
def ref():
    return get_ref()


# --------------------------------------------------------------------------
# torch-state-dict -> flax param-tree helpers (layout rules as in
# convert/torch_weights.py)
# --------------------------------------------------------------------------

def lin(sd, k):
    return {"kernel": jnp.asarray(sd[k + ".weight"].T),
            "bias": jnp.asarray(sd[k + ".bias"])}


def mlp(sd, k):
    return {"fc1": lin(sd, k + ".fc1"), "fc2": lin(sd, k + ".fc2")}


def norm(sd, k):
    return {"scale": jnp.asarray(sd[k + ".weight"]),
            "bias": jnp.asarray(sd[k + ".bias"])}


def conv(sd, k, bias=True):
    out = {"kernel": jnp.asarray(sd[k + ".weight"].transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = jnp.asarray(sd[k + ".bias"])
    return out


def check_complete(params, overlay, path=""):
    """Every leaf of the init tree must be provided by the overlay —
    no silently-random parameters in a parity test."""
    for k, v in params.items():
        p = f"{path}/{k}"
        assert k in overlay, f"missing overlay for {p}"
        if isinstance(v, dict):
            check_complete(v, overlay[k], p)
        else:
            assert np.shape(overlay[k]) == np.shape(v), \
                f"shape mismatch at {p}: {np.shape(overlay[k])} vs {np.shape(v)}"


def _close(a, b, atol=2e-4, rtol=1e-3, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=atol, rtol=rtol, err_msg=msg)


# --------------------------------------------------------------------------
# TokenFuse
# --------------------------------------------------------------------------

def test_token_fuse_module_vs_reference(ref):
    cfg = tiny_test_config(class_token_dim=8)
    args = make_ref_args(cfg)
    tC, B, H, W, L, P = cfg.class_token_dim, 2, 6, 9, 3, 3
    torch.manual_seed(11)
    rt = ref.geometry_utils.TokenFuse(args=args).eval()

    rng = np.random.default_rng(11)
    seg = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    dep = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    pos = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    coords = (rng.random((B, L, P, 2), dtype=np.float32) * 2 - 1)
    with torch.no_grad():
        out_t = rt(nchw(seg), nchw(dep), torch.from_numpy(coords), nchw(pos))

    from gwdepth_tpu.models.geometry import TokenFuse
    m = TokenFuse(tC)
    jargs = (jnp.asarray(seg), jnp.asarray(dep), jnp.asarray(coords),
             jnp.asarray(pos))
    params = m.init(jax.random.PRNGKey(0), *jargs)["params"]
    sd = state_dict_numpy(rt)
    overlay = {"seg_proj": mlp(sd, "seg_proj"),
               "depth_proj": mlp(sd, "depth_proj"),
               "norm_geometry": norm(sd, "norm_geometry"),
               "kv_refer_depth": mlp(sd, "kv_refer_depth"),
               "q_seg_geometry": mlp(sd, "q_seg_geometry"),
               "norm_fuse": norm(sd, "norm_fuse"),
               "fused_depth_proj": lin(sd, "fused_depth_proj")}
    check_complete(params, overlay)
    out_j = m.apply({"params": overlay}, *jargs)
    _close(out_j.transpose(0, 3, 1, 2), out_t.numpy(), msg="fused tokens")


# --------------------------------------------------------------------------
# PointTokenAttention
# --------------------------------------------------------------------------

def test_point_token_attention_vs_reference(ref):
    cfg = tiny_test_config(class_token_dim=8)
    args = make_ref_args(cfg)
    dim, tC, heads, B, H, W, nP = 16, cfg.class_token_dim, 2, 2, 5, 7, 6
    torch.manual_seed(13)
    rt = ref.multiscale_transformerr.PointTokenAttention(
        dim, heads, qkv_bias=True, args=args).eval()

    rng = np.random.default_rng(13)
    x = rng.standard_normal((B, H, W, dim), dtype=np.float32)
    tok = rng.standard_normal((B, nP, tC), dtype=np.float32)
    with torch.no_grad():
        out_t = rt(torch.from_numpy(x), torch.from_numpy(tok))

    from gwdepth_tpu.models.geometry import PointTokenAttention
    m = PointTokenAttention(dim, heads, tC)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    jnp.asarray(tok))["params"]
    sd = state_dict_numpy(rt)
    overlay = {k: lin(sd, k) for k in
               ("global_proj", "global_token_proj", "cls_pnt_q",
                "global_k", "global_v", "proj_token")}
    check_complete(params, overlay)
    out_j = m.apply({"params": overlay}, jnp.asarray(x), jnp.asarray(tok))
    _close(out_j, out_t.numpy(), msg="point tokens")


# --------------------------------------------------------------------------
# Global2PointGraph
# --------------------------------------------------------------------------

def test_global2point_graph_vs_reference(ref):
    cfg = tiny_test_config(class_token_dim=8)
    args = make_ref_args(cfg, class_init_size=8)
    dim, B, nP, ratio = cfg.class_token_dim, 2, 5, 2
    H, W = 10, 12
    torch.manual_seed(17)
    rt = ref.geometry_utils.Global2PointGraph(ratio, nP, args).eval()

    rng = np.random.default_rng(17)
    tok = rng.standard_normal((B, nP, dim), dtype=np.float32)
    for is_init in (True, False):
        # token_node_fuse consumes sH+sW == 2*new_size: with is_init the
        # grid must already be at new_size (= init_size*ratio = 16); the
        # expand path starts from init_size (= 8)
        side = 8 * ratio if is_init else 8
        init = rng.standard_normal((B, side, side, dim), dtype=np.float32)
        with torch.no_grad():
            out_t = rt(torch.from_numpy(init), torch.from_numpy(tok),
                       H, W, is_init=is_init)

        from gwdepth_tpu.models.geometry import Global2PointGraph
        m = Global2PointGraph(dim, nP, init_size=8, upsample_ratio=ratio)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(init),
                        jnp.asarray(tok), H, W, is_init)["params"]
        sd = state_dict_numpy(rt)
        overlay = {"node_relation": mlp(sd, "node_relation"),
                   "node_attention": mlp(sd, "node_attention"),
                   "token_node_fuse": mlp(sd, "token_node_fuse")}
        check_complete(params, overlay)
        out_j = m.apply({"params": overlay}, jnp.asarray(init),
                        jnp.asarray(tok), H, W, is_init)
        _close(out_j, out_t.numpy(), msg=f"graph tokens is_init={is_init}")


# --------------------------------------------------------------------------
# NonLocalPlannarGuidance (+ PyramidConv + ConvGRU)
# --------------------------------------------------------------------------

def test_nonlocal_planar_guidance_vs_reference(ref):
    cfg = tiny_test_config(class_token_dim=8)
    args = make_ref_args(cfg)
    tC, Cb, B, H, W, L, P = cfg.class_token_dim, 12, 2, 10, 12, 2, 3
    torch.manual_seed(19)
    rt = ref.geometry_utils.NonLocalPlannarGuidance(
        backbone_dim=Cb, num_points=L * P, num_levels=2, args=args).eval()

    rng = np.random.default_rng(19)
    bx = rng.standard_normal((B, H, W, Cb), dtype=np.float32)
    seg = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    dep = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    pos = rng.standard_normal((B, H, W, tC), dtype=np.float32)
    coords = (rng.random((B, L, P, 2), dtype=np.float32) * 2 - 1)
    # coarse 5x6 depth: smaller than PyramidConv's min pool size (8), so
    # the pad-to-poolable path runs on both sides (geometry_utils.py:142-151)
    dpred = rng.random((B, 5, 6, 1), dtype=np.float32)
    with torch.no_grad():
        out_t, _ = rt(nchw(bx), nchw(seg), nchw(dep),
                      torch.from_numpy(coords), nchw(pos),
                      depth_pred=nchw(dpred))

    from gwdepth_tpu.models.geometry import NonLocalPlannarGuidance
    m = NonLocalPlannarGuidance(Cb, tC, L * P, num_levels=2)
    jargs = (jnp.asarray(bx), jnp.asarray(seg), jnp.asarray(dep),
             jnp.asarray(coords), jnp.asarray(pos), jnp.asarray(dpred))
    params = m.init(jax.random.PRNGKey(0), *jargs)["params"]
    sd = state_dict_numpy(rt)

    pyr = {}
    for i in range(3):
        pyr[f"conv_pre{i}_0"] = conv(sd, f"pre_depth_upsample.conv_pre.{i}.0",
                                     bias=False)
        pyr[f"conv_pre{i}_1"] = conv(sd, f"pre_depth_upsample.conv_pre.{i}.2",
                                     bias=False)
        pyr[f"conv_scales{i}_0"] = conv(
            sd, f"pre_depth_upsample.conv_scales.{i}.0", bias=False)
        pyr[f"conv_scales{i}_1"] = conv(
            sd, f"pre_depth_upsample.conv_scales.{i}.2", bias=False)
        pyr[f"norm_scales{i}"] = norm(sd,
                                      f"pre_depth_upsample.norm_scales.{i}")
    pyr["conv3"] = conv(sd, "pre_depth_upsample.conv3.0", bias=False)
    overlay = {"depth_fuse_fc1": lin(sd, "depth_fuse.0"),
               "depth_fuse_fc2": lin(sd, "depth_fuse.2"),
               "class_kv": lin(sd, "class_kv.0"),
               "pre_depth_upsample": pyr,
               "gru": {"convz": conv(sd, "gru.convz"),
                       "convr": conv(sd, "gru.convr"),
                       "convq": conv(sd, "gru.convq")},
               "new_depth": lin(sd, "new_depth")}
    check_complete(params, overlay)
    out_j, _ = m.apply({"params": overlay}, *jargs)
    _close(out_j.transpose(0, 3, 1, 2), out_t.numpy(), msg="refined depth")


# --------------------------------------------------------------------------
# documented reference bitrot
# --------------------------------------------------------------------------

def test_reflection_reduce_reference_is_bitrotten(ref):
    """geometry_utils.py:355 references `upconv` without importing it; the
    reference class cannot even be constructed.  Our ReflectionReduce is
    the as-written re-derivation (ratio=0 treated as no-resize) — smoke-run
    it so the library path stays alive."""
    with pytest.raises(NameError):
        ref.geometry_utils.ReflectionReduce()

    from gwdepth_tpu.models.geometry import ReflectionReduce
    m = ReflectionReduce()
    x = jnp.zeros((1, 32, 48, 3))
    sizes = [(2, 3), (4, 6), (8, 12)]
    params = m.init(jax.random.PRNGKey(0), x, sizes)["params"]
    outs = m.apply({"params": params}, x, sizes)
    assert [o.shape for o in outs] == [(1, 2, 3, 256), (1, 4, 6, 128),
                                       (1, 8, 12, 64)]


def test_with_line_depth_reference_is_bitrotten(ref):
    """`--with_line_depth` cannot run in the reference: NO BasicLayer is
    constructed with with_point_token=True (multiscale_transformerr.py:1040
    passes False explicitly; the class transformers leave the default
    False), so no block owns `pointTokenAttn` — yet SwinTransformerBlock
    dereferences it whenever a point token is threaded through (:749), and
    ReferTransformer always threads it when the flag is on (:1182-1186).
    Our dense encoder wires the gate with the minimal repair documented in
    models/dense_encoder.py."""
    cfg = tiny_test_config(with_line_depth=True)
    args = make_ref_args(cfg)
    torch.manual_seed(21)
    rt = ref.multiscale_transformerr.ReferTransformer(
        args, [256, 512, 1024, cfg.dense_trans_dim]).eval()
    blocks = [b for layer in (rt.dense_transformer, rt.class_transformer1,
                              rt.class_transformer2, rt.class_transformer3)
              for b in layer.blocks]
    assert blocks and not any(hasattr(b, "pointTokenAttn") for b in blocks)

    blk = rt.dense_transformer.blocks[0]          # shift 0, WindowAttention
    blk.H = blk.W = 7
    D, tC = cfg.dense_trans_dim, cfg.class_token_dim
    x = torch.randn(1, 49, D)
    ref_coors = torch.rand(1, cfg.num_ref, 2, 2) * 2 - 1
    point_token = torch.randn(1, cfg.num_ref * 2, tC)
    with torch.no_grad(), pytest.raises(AttributeError,
                                        match="pointTokenAttn"):
        blk(x, None, ref_coors=ref_coors, point_token=point_token)


def test_with_line_depth_converter_coverage(ref):
    """Every with_line_depth tensor the reference forward would consume
    (point_depth_token, init_token, gpg1/2/3 node Mlps — geometry_utils.py
    :476-533) maps onto the rebuilt gate at matching shapes.  The
    reference hardcodes the init grid at 32 (multiscale_transformerr.py
    :1029), which equals the default class_init_size; any other value makes
    the reference inconsistent with its own gpg1 (token_node_fuse sized
    2*class_init_size), so the comparison pins class_init_size=32.
    gpg*.dpeth_token_proj is constructed but never used by the reference
    forward — skipped like the pyramid layer4."""
    cfg = tiny_test_config(with_line_depth=True, class_init_size=32)
    args = make_ref_args(cfg)
    torch.manual_seed(23)
    rt = ref.multiscale_transformerr.ReferTransformer(
        args, [256, 512, 1024, cfg.dense_trans_dim])
    state = {f"dense_encoder.{k}": v
             for k, v in state_dict_numpy(rt).items()}
    from gwdepth_tpu.convert.full_model import (glassrgbd_torch_to_flax,
                                                coverage)
    overlay = glassrgbd_torch_to_flax(state)["dense_encoder"]

    from gwdepth_tpu.models.glassrgbd import GlassRGBD
    model = GlassRGBD(cfg)
    imgs = jnp.zeros((1, *cfg.train_hw, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), imgs)["params"]["dense_encoder"]
    for sub in ("gpg1", "gpg2", "gpg3"):
        c, t, missing = coverage(overlay[sub], params[sub])
        assert t > 0 and c == t, (sub, missing)
    for name in ("point_depth_token", "init_token"):
        assert np.shape(overlay[name]) == np.shape(params[name]), name


def test_plain_swin_dense_block_reference_is_bitrotten(ref):
    """The shipped stage-1 TRAIN recipe (--with_center --with_dense, no
    --with_line: script/train/a0_train_stage1_res50_glassrgbd.sh:24) makes
    the 1/32 dense layer use OriginWindowAttention — which the reference
    cannot even CONSTRUCT: SwinTransformerBlock passes
    `group_attention=...` unconditionally (multiscale_transformerr.py:614)
    but swin_transformer.WindowAttention accepts no such kwarg
    (swin_transformer.py:108) -> TypeError. (Were construction patched,
    the forward would still die: the Origin branch never binds `win_attn`,
    :727 vs :733.) The published model must predate this refactor; our
    PlainWindowAttention fallback path runs it (tests/test_dense.py +
    test_reference_parity_eval.py module-level parity)."""
    cfg = tiny_test_config(with_line=False)
    args = make_ref_args(cfg)
    MT = ref.multiscale_transformerr
    with pytest.raises(TypeError, match="group_attention"):
        MT.BasicLayer(dim=cfg.dense_trans_dim, depth=1,
                      num_heads=cfg.dense_trans_heads,
                      window_attn=MT.OriginWindowAttention,
                      window_size=7, mlp_ratio=2, args=args)


def test_global2point_graph_chain_vs_reference(ref):
    """The 3-scale gpg CHAIN with the reference's own reshape glue:
    depth_token (B, H*W, tC) -> (B, H, W, tC) grid between scales
    (multiscale_transformerr.py:1201, :1236, :1273). Catches row-major
    reshape/layout divergence that single-module parity cannot."""
    cfg = tiny_test_config(class_token_dim=8, class_init_size=4)
    args = make_ref_args(cfg)
    dim, nP = cfg.class_token_dim, cfg.num_ref * 2
    cis = cfg.class_init_size
    B = 2
    h1, w1, h2, w2, h3, w3 = 4, 6, 8, 12, 16, 24
    torch.manual_seed(31)
    gpg1 = ref.geometry_utils.Global2PointGraph(1, nP, args).eval()
    gpg2 = ref.geometry_utils.Global2PointGraph(2, nP, args).eval()
    gpg3 = ref.geometry_utils.Global2PointGraph(4, nP, args).eval()

    rng = np.random.default_rng(31)
    init = rng.standard_normal((B, cis, cis, dim), dtype=np.float32)
    pt = rng.standard_normal((B, nP, dim), dtype=np.float32)
    with torch.no_grad():
        t1 = gpg1(torch.from_numpy(init), torch.from_numpy(pt),
                  h1, w1, is_init=True)                       # (B, h1*w1, C)
        t2 = gpg2(t1.reshape(B, h1, w1, -1), torch.from_numpy(pt), h2, w2)
        t3 = gpg3(t2.reshape(B, h2, w2, -1), torch.from_numpy(pt), h3, w3)

    from gwdepth_tpu.models.geometry import Global2PointGraph
    outs_t = [np.asarray(t.reshape(B, h, w, dim)) for t, (h, w) in
              zip((t1, t2, t3), ((h1, w1), (h2, w2), (h3, w3)))]

    tok = jnp.asarray(init)
    out_j = []
    for i, (ratio, rt, hw) in enumerate(
            zip((1, 2, 4), (gpg1, gpg2, gpg3),
                ((h1, w1), (h2, w2), (h3, w3)))):
        m = Global2PointGraph(dim, nP, init_size=cis, upsample_ratio=ratio)
        sd = state_dict_numpy(rt)
        overlay = {k: mlp(sd, k) for k in
                   ("node_relation", "node_attention", "token_node_fuse")}
        params = m.init(jax.random.PRNGKey(i), tok, jnp.asarray(pt),
                        *hw, i == 0)["params"]
        check_complete(params, overlay)
        tok = m.apply({"params": overlay}, tok, jnp.asarray(pt),
                      *hw, i == 0).reshape(B, *hw, dim)
        out_j.append(np.asarray(tok))

    for i, (a, b) in enumerate(zip(out_j, outs_t)):
        _close(a, b, msg=f"gpg chain stage {i+1}")


def test_sample_along_and_mid_seg_vs_reference(ref):
    """Line-point densifiers vs the real points_sample.py:368-424
    (library functions, runnable standalone; previously covered only by
    behavioral invariants in test_geometry_parity.py)."""
    rng = np.random.default_rng(37)
    B, L, n = 2, 5, 10
    lines = (rng.random((B, L, 2, 2), dtype=np.float32) * 2 - 1)
    H, W = 480, 640

    out_t = ref.points_sample.sample_along_seg(
        torch.from_numpy(lines.copy()), H, W, sample_num_seg=n)
    from gwdepth_tpu.models.points import sample_along_seg, sample_mid_seg
    out_j = sample_along_seg(jnp.asarray(lines), H, W, sample_num_seg=n)
    _close(out_j, out_t.numpy(), atol=1e-5, msg="sample_along_seg")

    mid_t = ref.points_sample.sample_mid_seg(torch.from_numpy(lines.copy()),
                                             H, W)
    mid_j = sample_mid_seg(jnp.asarray(lines))
    _close(mid_j, mid_t.numpy(), atol=1e-6, msg="sample_mid_seg")
