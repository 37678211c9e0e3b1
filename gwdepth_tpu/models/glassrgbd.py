"""GW-Depth top model: joint line detection + dense depth + glass seg.

Re-derivation of the reference's `GlassRGBD`
(reference: src/models/glassrgbd.py:44-131): ResNet backbone -> 4-level
pyramid; line branch = 1x1 proj of C4 + DETR transformer with 100 queries
and class/line heads (sigmoid coords, 4+2 dims with centers); dense branch
= 1x1 proj of C4 to 2*hidden channels + coarse-to-fine dense encoder +
full-resolution decoder.

Input contract (static-shape, TPU): a padded image canvas (B, H, W, 3) with
a (B, H, W) bool validity mask — the functional equivalent of the
reference's NestedTensor (src/util/misc.py:282-367).

Output dict matches the reference field-for-field:
  pred_logits (B, Q, 2), pred_lines (B, Q, 4|6),
  aux_outputs [per decoder layer], pred_depth [d16, d8, d4, dfull]
  (normalized for the first three, meters for dfull), pred_seg (B, H, W, 2).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.models.resnet import ResNetBackbone, pyramid_masks
from gwdepth_tpu.models.detr import DETRTransformer, MLP
from gwdepth_tpu.models.dense_encoder import DenseEncoder
from gwdepth_tpu.models.decoder import DensePrediction
from gwdepth_tpu.ops.posemb import sine_posemb_from_mask_nhwc


class GlassRGBD(nn.Module):
    config: GWDepthConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 valid_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """images: (B, H, W, 3) normalized; valid_mask: (B, H, W) bool."""
        cfg = self.config
        B, H, W, _ = images.shape
        if valid_mask is None:
            valid_mask = jnp.ones((B, H, W), dtype=jnp.bool_)

        feats = ResNetBackbone(cfg.backbone, dtype=cfg.compute_dtype,
                               name="backbone")(images)
        masks = pyramid_masks(valid_mask, feats)
        src = feats[cfg.layer1_num]                      # C4, 1/32, NHWC
        src_mask = masks[cfg.layer1_num]

        out: Dict[str, jnp.ndarray] = {}
        if cfg.with_line:
            if cfg.position_embedding in ("v3", "learned"):
                # learned row/col tables (position_encoding.py:50-77,
                # selected at :79-87)
                from gwdepth_tpu.ops.posemb import LearnedPosEmb2D
                hs_, ws_ = src.shape[1:3]
                pos = LearnedPosEmb2D(cfg.hidden_dim // 2,
                                      name="position_embedding")(
                    B, hs_, ws_).astype(src.dtype)
            else:
                # normalized sine pos-embed, DETR-style (backbone.py:97-110)
                pos = sine_posemb_from_mask_nhwc(
                    src_mask, cfg.hidden_dim // 2,
                    normalize=True).astype(src.dtype)
            proj = nn.Conv(cfg.hidden_dim, (1, 1), kernel_init=nn.initializers
                           .variance_scaling(1 / 3, "fan_in", "uniform"),
                           name="input_proj")(src)
            N = proj.shape[1] * proj.shape[2]
            query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0),
                (cfg.num_queries, cfg.hidden_dim))
            hs, _ = DETRTransformer(
                cfg.hidden_dim, cfg.nheads, cfg.enc_layers, cfg.dec_layers,
                cfg.dim_feedforward, cfg.dropout, cfg.compute_dtype,
                name="transformer")(
                proj.reshape(B, N, cfg.hidden_dim),
                pos.reshape(B, N, cfg.hidden_dim),
                src_mask.reshape(B, N), query_embed,
                deterministic=deterministic)
            logits = nn.Dense(cfg.num_classes + 1, name="class_embed")(hs)
            coords = nn.sigmoid(
                MLP(cfg.hidden_dim, cfg.line_dim, 3, name="lines_embed")(hs))
            out["pred_logits"] = logits[-1]
            out["pred_lines"] = coords[-1]
            if cfg.aux_loss:
                out["aux_outputs"] = [
                    {"pred_logits": logits[i], "pred_lines": coords[i]}
                    for i in range(cfg.dec_layers - 1)]
        else:
            out["pred_logits"] = None
            out["pred_lines"] = None

        if cfg.with_dense:
            dense_in = nn.Conv(cfg.dense_trans_dim, (1, 1),
                               kernel_init=nn.initializers.variance_scaling(
                                   1 / 3, "fan_in", "uniform"),
                               name="dense_input_proj")(src)
            feats_d, depth_token, seg_token, depth_preds = DenseEncoder(
                cfg, name="dense_encoder")(
                dense_in, feats, masks, out["pred_lines"], out["pred_logits"])
            depth_full, seg = DensePrediction(
                cfg.max_depth, cfg.class_token_dim,
                blockconv=cfg.decoder_blockconv, name="depth_decoder")(
                feats_d[-1], depth_preds[-1], depth_token, seg_token, (H, W))
            out["pred_depth"] = depth_preds + [depth_full]
            out["pred_seg"] = seg
        return out
