"""Coarse-to-fine dense depth/seg encoder ("ReferTransformer").

Re-derivation of the reference's 4-scale dense encoder
(reference: src/models/multiscale_transformerr.py:1025-1326):

  1/32: line-referenced Swin layer (dim 512, depth 4) -> depth_pred32
  1/16: upsample + fuse backbone C3, init per-pixel depth/seg class tokens,
        class Swin layer (dim 256, depth 2) -> depth_pred16
        -> certain-sample 30 uncertainty points
  1/8 : upsample + fuse C2, token reprojection, class layer (dim 128, d 2)
        -> point-based pred -> certain-sample 80 points
  1/4 : upsample + fuse C1, class layer (dim 64, depth 1) -> point-based pred

All depth predictions here are normalized to (0, 1); the decoder scales the
final one by max_depth (reference: dense_upsample.py:170) while training
losses consume the normalized intermediates directly
(reference: engine_glassrgbd.py:70-80).

Reference-line selection takes the top `num_ref` queries by the RAW class-0
logit (no softmax, multiscale_transformerr.py:1165-1167), endpoints only
unless with_dense_center (:1178-1179). Layout NHWC; shapes static.

`with_line_depth` (graph-based depth tokens, reference
multiscale_transformerr.py:1028-1033, 1049, 1182-1184, 1201-1203, 1236,
1273): learned per-line-endpoint tokens `point_depth_token` plus a coarse
`init_token` grid are fused by Global2PointGraph (gpg1/2/3) into the
per-pixel depth-token stream at each scale, replacing the broadcast
`depth_token` parameter. The reference's own forward CANNOT run with this
flag: (a) every BasicLayer is constructed with `with_point_token=False`
(:1040 explicitly, defaults elsewhere), so no block owns `pointTokenAttn`,
yet block.forward dereferences it whenever a point token is passed (:749)
-> AttributeError; (b) in the gpg branch `seg_token` is never re-projected
to the next scale (:1236-1247 vs :1240-1246 else-branch), so the 1/16-sized
seg stream hits the 1/8 window partition -> shape error. This rebuild
applies the MINIMAL repair: point tokens pass through blocks unchanged
(the updater module the reference never constructs is not invented), and
seg tokens are nearest-upsampled parameter-free between scales (the
reference builds no seg projection in this branch). Both decisions are
asserted against the real reference in
tests/test_reference_parity_geometry.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.models.swin import SwinLayer, Mlp, TRUNC02, XAVIER
from gwdepth_tpu.models.points import PointBasedPred, certain_sample
from gwdepth_tpu.ops.interpolate import resize_nearest_nhwc
from gwdepth_tpu.ops.posemb import sine_posemb_from_mask_nhwc


class ConvA(nn.Module):
    """3x3 conv + GELU (reference: multiscale_transformerr.py:104-118)."""
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=XAVIER, name="conv")(x)
        return nn.gelu(x, approximate=False)


class MlpNorm(nn.Module):
    """fc1 -> fc2 -> LayerNorm (act_layer=None variant,
    reference: multiscale_transformerr.py:75-102, built at :1077-1078)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=TRUNC02, name="fc1")(x)
        x = nn.Dense(self.out, kernel_init=TRUNC02, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class DepthHead(nn.Module):
    """Linear -> Linear -> sigmoid (no inner activation — reference keeps
    the two stacked Linears, multiscale_transformerr.py:1044-1045)."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=TRUNC02, name="fc1")(x)
        x = nn.Dense(1, kernel_init=TRUNC02, name="fc2")(x)
        return nn.sigmoid(x)


def _up_nhwc(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize an NHWC map (torch F.interpolate 'nearest' semantics)."""
    return resize_nearest_nhwc(x, hw)


def select_reference_points(pred_lines: jnp.ndarray, pred_logits: jnp.ndarray,
                            num_ref: int, points_per_line: int) -> jnp.ndarray:
    """Top-`num_ref` lines by raw class-0 logit -> (B, num_ref, P, 2) coords
    in [-1, 1] (reference: multiscale_transformerr.py:1165-1179)."""
    _, ids = jax.lax.top_k(pred_logits[:, :, 0], num_ref)        # (B, R)
    chosen = jnp.take_along_axis(pred_lines, ids[..., None], axis=1)
    B = chosen.shape[0]
    chosen = chosen.reshape(B, num_ref, -1, 2) * 2.0 - 1.0
    return chosen[:, :, :points_per_line]


class DenseEncoder(nn.Module):
    """4-scale coarse-to-fine encoder. See module docstring."""
    config: GWDepthConfig

    @nn.compact
    def __call__(self,
                 top_feat: jnp.ndarray,
                 pyramid: Sequence[jnp.ndarray],
                 masks: Sequence[jnp.ndarray],
                 pred_lines: Optional[jnp.ndarray],
                 pred_logits: Optional[jnp.ndarray]):
        """Args:
          top_feat: (B, H32, W32, D) projected C4 (D = dense_trans_dim).
          pyramid: backbone [C1, C2, C3, C4] NHWC.
          masks: per-level (B, h, w) bool validity masks.
          pred_lines: (B, Q, line_dim) normalized line coords or None.
          pred_logits: (B, Q, 2) raw logits or None.
        Returns:
          feats [1/32, 1/16, 1/8, 1/4] NHWC, depth_token, seg_token (1/4),
          depth_preds [d16, d8, d4] each (B, h, w) normalized.
        """
        cfg = self.config
        D = cfg.dense_trans_dim
        tC = cfg.class_token_dim
        heads = cfg.dense_trans_heads
        ws = cfg.window_size
        B, H32, W32, _ = top_feat.shape

        if cfg.with_line and pred_logits is not None:
            ref = select_reference_points(pred_lines, pred_logits,
                                          cfg.num_ref, cfg.ref_points_per_line)
            attn_kind32 = "ref"
        else:
            ref = None
            attn_kind32 = "plain"

        def posmap(mask, feats):
            # un-normalized sine over the validity mask, channels == feats
            return sine_posemb_from_mask_nhwc(
                mask, feats // 2).astype(top_feat.dtype)

        # ---- 1/32 ----
        pos32 = posmap(masks[3], D)
        x, _, _ = SwinLayer(D, cfg.dense_trans_layers[0], heads, ws,
                            cfg.mlp_ratio, attn_kind32, remat=cfg.remat,
                            use_pallas=cfg.use_pallas,
                            name="dense_transformer")(
            top_feat, ref_coords=ref, ref_pos=pos32)
        d32 = DepthHead(tC, name="depth_pred32")(x)[..., 0]       # (B,H32,W32)
        feat32 = x

        # ---- 1/16 ----
        h1, w1 = pyramid[2].shape[1:3]
        x = _up_nhwc(feat32, (h1, w1))
        x = nn.Dense(D // 2, kernel_init=TRUNC02, name="proj_class1")(x)
        x = x + ConvA(D // 2, name="proj_backbn1")(pyramid[2])
        pos1 = posmap(masks[2], D // 2)

        seg_tok_init = self.param("seg_token", TRUNC02, (1, 1, tC))
        seg_token = jnp.broadcast_to(seg_tok_init[:, None],
                                     (B, h1, w1, tC)).astype(x.dtype)
        if cfg.with_line_depth:
            # graph-based depth tokens (see module docstring; reference
            # multiscale_transformerr.py:1028-1033, 1201-1203). The
            # reference hardcodes the init grid at 32 (== the default
            # class_init_size); here it follows class_init_size.
            from gwdepth_tpu.models.geometry import Global2PointGraph
            cis = cfg.class_init_size
            nP = cfg.num_ref * 2
            point_token = jnp.broadcast_to(
                self.param("point_depth_token", TRUNC02, (1, nP, tC)),
                (B, nP, tC)).astype(x.dtype)
            init_token = jnp.broadcast_to(
                self.param("init_token", TRUNC02, (1, cis, cis, tC)),
                (B, cis, cis, tC)).astype(x.dtype)
            depth_token = Global2PointGraph(
                tC, nP, cis, 1, name="gpg1")(
                init_token, point_token, h1, w1,
                is_init=True).reshape(B, h1, w1, tC)
        else:
            depth_tok_init = self.param("depth_token", TRUNC02, (1, 1, tC))
            depth_token = jnp.broadcast_to(depth_tok_init[:, None],
                                           (B, h1, w1, tC)).astype(x.dtype)

        # per-layer PointGuidedTokenFuse gate: we honor the
        # `class_tokenfuse_layers` flag the reference declares but never
        # consumes (src/args.py:154; geometry_utils.py:535-652)
        tokfuse = tuple(cfg.class_tokenfuse_layers)
        tokpos1 = posmap(masks[2], tC) if tokfuse[0] else None
        x, depth_token, seg_token = SwinLayer(
            D // 2, cfg.class_trans_layers[0], heads, ws, cfg.mlp_ratio,
            "class", tC, tuple(cfg.group_attention_layers[0]), remat=cfg.remat,
            use_pallas=cfg.use_pallas, token_fuse=tokfuse[0],
            name="class_transformer1")(
            x, ref_coords=ref, ref_pos=pos1,
            depth_token=depth_token, seg_token=seg_token, token_pos=tokpos1)
        d16 = DepthHead(tC, name="depth_pred16")(
            jnp.concatenate([x, depth_token], axis=-1))[..., 0]
        feat16 = x

        coords = None
        if cfg.depth_sample_layers[0]:
            coords = certain_sample(d32, d16, cfg.depth_interval,
                                    cfg.interval_sample_num[0],
                                    cfg.min_depth_eval / cfg.max_depth_eval)

        # ---- 1/8 ----
        h2, w2 = pyramid[1].shape[1:3]
        x = _up_nhwc(feat16, (h2, w2))
        x = nn.Dense(D // 4, kernel_init=TRUNC02, name="proj_class2")(x)
        x = x + ConvA(D // 4, name="proj_backbn2")(pyramid[1])
        pos2 = posmap(masks[1], D // 4)
        if cfg.with_line_depth:
            depth_token = Global2PointGraph(
                tC, cfg.num_ref * 2, cfg.class_init_size, 2, name="gpg2")(
                depth_token, point_token, h2, w2).reshape(B, h2, w2, tC)
            # minimal repair: the reference builds no seg projection in
            # this branch (module docstring)
            seg_token = _up_nhwc(seg_token, (h2, w2))
        else:
            depth_token = MlpNorm(tC * 2, tC, name="old_depth_token_proj8")(
                _up_nhwc(depth_token, (h2, w2)))
            seg_token = MlpNorm(tC * 2, tC, name="old_seg_token_proj8")(
                _up_nhwc(seg_token, (h2, w2)))

        tokpos2 = posmap(masks[1], tC) if tokfuse[1] else None
        x, depth_token, seg_token = SwinLayer(
            D // 4, cfg.class_trans_layers[1], heads, ws, cfg.mlp_ratio,
            "class", tC, tuple(cfg.group_attention_layers[1]), remat=cfg.remat,
            use_pallas=cfg.use_pallas, token_fuse=tokfuse[1],
            name="class_transformer2")(
            x, ref_coords=coords, ref_pos=pos2,
            depth_token=depth_token, seg_token=seg_token, token_pos=tokpos2)

        if cfg.depth_sample_layers[0]:
            d8 = PointBasedPred(D // 4, tC, (16, 8, 4, 2),
                                cfg.interval_sample_num[0],
                                use_pallas=cfg.use_pallas,
                                name="point_based_pred1")(
                x, depth_token, d16, coords, pos2)
        else:
            d8 = DepthHead(tC, name="depth_pred8")(
                jnp.concatenate([x, depth_token], axis=-1))[..., 0]
        feat8 = x

        if cfg.depth_sample_layers[1]:
            coords = certain_sample(d16, d8, cfg.depth_interval,
                                    cfg.interval_sample_num[1],
                                    cfg.min_depth_eval / cfg.max_depth_eval)

        # ---- 1/4 ----
        h3, w3 = pyramid[0].shape[1:3]
        x = _up_nhwc(feat8, (h3, w3))
        x = nn.Dense(D // 8, kernel_init=TRUNC02, name="proj_class3")(x)
        x = x + ConvA(D // 8, name="proj_backbn3")(pyramid[0])
        pos3 = posmap(masks[0], D // 8)
        if cfg.with_line_depth:
            depth_token = Global2PointGraph(
                tC, cfg.num_ref * 2, cfg.class_init_size, 4, name="gpg3")(
                depth_token, point_token, h3, w3).reshape(B, h3, w3, tC)
            seg_token = _up_nhwc(seg_token, (h3, w3))
        else:
            depth_token = MlpNorm(tC * 2, tC, name="old_depth_token_proj4")(
                _up_nhwc(depth_token, (h3, w3)))
            seg_token = MlpNorm(tC * 2, tC, name="old_seg_token_proj4")(
                _up_nhwc(seg_token, (h3, w3)))

        tokpos3 = posmap(masks[0], tC) if tokfuse[2] else None
        x, depth_token, seg_token = SwinLayer(
            D // 8, cfg.class_trans_layers[2], heads, ws, cfg.mlp_ratio,
            "class", tC, tuple(cfg.group_attention_layers[2]), remat=cfg.remat,
            use_pallas=cfg.use_pallas, token_fuse=tokfuse[2],
            name="class_transformer3")(
            x, ref_coords=coords, ref_pos=pos3,
            depth_token=depth_token, seg_token=seg_token, token_pos=tokpos3)

        if cfg.depth_sample_layers[2]:
            d4 = PointBasedPred(D // 8, tC, (16, 8, 4, 2),
                                cfg.interval_sample_num[1],
                                use_pallas=cfg.use_pallas,
                                name="point_based_pred2")(
                x, depth_token, d8, coords, pos3)
        else:
            d4 = DepthHead(tC, name="depth_pred4")(
                jnp.concatenate([x, depth_token], axis=-1))[..., 0]

        feats = [feat32, feat16, feat8, x]
        return feats, depth_token, seg_token, [d16, d8, d4]
