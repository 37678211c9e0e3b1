"""Full-resolution depth/seg decoder.

Re-derivation of the reference's `DensePrediction`
(reference: src/models/dense_upsample.py:114-185): token-fused MLP at 1/4,
two upconv stages (nearest x2 resize + 3x3 conv + ELU), a LayerNorm after
the first depth/seg upconv, then 3x3 head convs — sigmoid x max_depth for
depth, 2-channel logits for segmentation. Layout NHWC.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from gwdepth_tpu.models.swin import XAVIER, Mlp
from gwdepth_tpu.ops.interpolate import resize_nearest_nhwc


class UpConv(nn.Module):
    """Nearest-resize + 3x3 conv (no bias) + ELU
    (reference: dense_upsample.py:74-90)."""
    out: int

    @nn.compact
    def __call__(self, x, new_hw):
        x = resize_nearest_nhwc(x, new_hw)
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=XAVIER, name="conv")(x)
        return nn.elu(x)


class DensePrediction(nn.Module):
    """(reference: dense_upsample.py:114-182)."""
    max_depth: float
    token_dim: int

    @nn.compact
    def __call__(self, feat: jnp.ndarray, depth_pred4: jnp.ndarray,
                 depth_token: jnp.ndarray, seg_token: jnp.ndarray,
                 out_hw: Tuple[int, int]):
        """feat: (B, h, w, C) 1/4 feature; depth_pred4: (B, h, w) normalized;
        tokens: (B, h, w, tC). Returns depth (B, H, W) in meters and seg
        logits (B, H, W, 2)."""
        tC = self.token_dim
        B, h, w, _ = feat.shape
        mid_hw = (h * 2, w * 2)

        dfuse = jnp.concatenate([feat, depth_pred4[..., None], depth_token],
                                axis=-1)
        d = Mlp(dfuse.shape[-1], tC, name="depth_token_fuse")(dfuse)
        d = nn.LayerNorm(epsilon=1e-5, name="norm_depth")(
            UpConv(tC, name="upconv1_depth")(d, mid_hw))
        d = nn.elu(nn.Conv(tC, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name="conv1_depth")(d))
        d = UpConv(tC // 2, name="upconv2_depth")(d, out_hw)
        d = nn.elu(nn.Conv(tC // 2, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name="conv2_depth")(d))
        d = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=XAVIER, name="get_depth")(d)
        depth = self.max_depth * nn.sigmoid(d)[..., 0]

        sfuse = jnp.concatenate([feat, seg_token], axis=-1)
        s = Mlp(sfuse.shape[-1], tC, name="seg_token_fuse")(sfuse)
        s = nn.LayerNorm(epsilon=1e-5, name="norm_seg")(
            UpConv(tC, name="upconv1_seg")(s, mid_hw))
        s = nn.elu(nn.Conv(tC, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name="conv1_seg")(s))
        s = UpConv(tC // 2, name="upconv2_seg")(s, out_hw)
        s = nn.elu(nn.Conv(tC // 2, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name="conv2_seg")(s))
        seg = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=XAVIER, name="get_seg")(s)
        return depth, seg
