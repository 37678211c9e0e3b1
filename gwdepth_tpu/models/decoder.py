"""Full-resolution depth/seg decoder.

Re-derivation of the reference's `DensePrediction`
(reference: src/models/dense_upsample.py:114-185): token-fused MLP at 1/4,
two upconv stages (nearest x2 resize + 3x3 conv + ELU), a LayerNorm after
the first depth/seg upconv, then 3x3 head convs — sigmoid x max_depth for
depth, 2-channel logits for segmentation. Layout NHWC.

Two numerically-equivalent execution paths share one parameter tree:

- `blockconv=True` (default): the tail runs in space-to-depth form in two
  s2d(2) stages — the 1/2-res stage as (h, w, 4*tC) on the 1/4 grid, then
  a depth_to_space(2) and the full-res stage as (2h, 2w, 4*tC/2) on the
  HALF-res grid (see `_tail_block`; the earlier single s2d(4)-on-1/4-grid
  form paid 16x block-kernel MACs where s2d(2) pays 4x) — with kernels
  remapped by `ops/blockconv.block_kernel`. The original NHWC tail pads
  its 16/32
  channel planes 8x/4x to the 128-lane tile; measured on the v5e this
  made the decoder ~15 ms of a 42 ms eval forward (1.7-2.0 ms per
  full-res conv link). The block path keeps lanes full and is exact up
  to fp reassociation (tests/test_blockconv.py).
- `blockconv=False`: the direct pixel-domain tail, kept as the structural
  oracle and for odd output sizes (out_hw not 4x the feature grid).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gwdepth_tpu.models.swin import XAVIER, Mlp
from gwdepth_tpu.ops.blockconv import (block_conv, block_conv_xcy,
                                       depth_to_space, depth_to_space_mm)
from gwdepth_tpu.ops.interpolate import resize_nearest_nhwc


class _Kernel(nn.Module):
    """Bias-free conv-kernel param holder: declares the same
    `<name>/kernel` parameter an `nn.Conv(name=<name>)` would, so the
    block-conv path keeps the checkpoint tree identical."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", XAVIER, self.shape)


class UpConv(nn.Module):
    """Nearest-resize + 3x3 conv (no bias) + ELU
    (reference: dense_upsample.py:74-90). With `kernel_only=True` it
    declares/returns just the conv kernel (same param path) for the
    block-domain path."""
    out: int
    in_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x=None, new_hw=None, *, kernel_only: bool = False):
        if kernel_only:
            return _Kernel((3, 3, self.in_dim, self.out), name="conv")()
        x = resize_nearest_nhwc(x, new_hw)
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=XAVIER, name="conv")(x)
        return nn.elu(x)


class DensePrediction(nn.Module):
    """(reference: dense_upsample.py:114-182)."""
    max_depth: float
    token_dim: int
    blockconv: bool = True

    def _tail_direct(self, y, branch: str, head: str, out_ch: int,
                     mid_hw, out_hw):
        tC = self.token_dim
        y = nn.LayerNorm(epsilon=1e-5, name=f"norm_{branch}")(
            UpConv(tC, name=f"upconv1_{branch}")(y, mid_hw))
        y = nn.elu(nn.Conv(tC, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name=f"conv1_{branch}")(y))
        y = UpConv(tC // 2, name=f"upconv2_{branch}")(y, out_hw)
        y = nn.elu(nn.Conv(tC // 2, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, kernel_init=XAVIER,
                           name=f"conv2_{branch}")(y))
        return nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=False, kernel_init=XAVIER, name=head)(y)

    def _tail_block(self, y, branch: str, head: str, out_ch: int):
        """Same chain in block form: 1/2-res stage as s2d(2) on the 1/4
        grid, then full-res stage as s2d(2) on the HALF-res grid. Kernel
        params are shared with the direct path.

        The full-res stage used to run as s2d(4) on the 1/4 grid; a dense
        s2d(s) block kernel carries s^2 x the pixel conv's MACs (the
        remapped kernel is mostly structural zeros), so s=4 paid 16x
        FLOPs where s=2 pays 4x — the r3 device profile showed the two
        s=4 links at 1.25 ms each running at ~94% MXU utilization, i.e.
        peak-bound on redundant work. s=2 keeps the 128-lane tile full
        (4*tC/2 = 128 block channels) at a quarter of the MACs; the extra
        depth_to_space(2) relayouts cost ~0.1 ms each."""
        tC = self.token_dim
        B, h, w, _ = y.shape
        w_up1 = UpConv(tC, tC, name=f"upconv1_{branch}")(kernel_only=True)
        y = nn.elu(block_conv(y, w_up1, 2, u=2))            # (B,h,w,4tC)
        y = nn.LayerNorm(epsilon=1e-5, name=f"norm_{branch}")(
            y.reshape(B, h, w, 4, tC)).reshape(B, h, w, 4 * tC)
        w_c1 = _Kernel((3, 3, tC, tC), name=f"conv1_{branch}")()
        y = nn.elu(block_conv(y, w_c1, 2, u=1))
        y = depth_to_space(y, 2)                            # (B,2h,2w,tC)
        w_up2 = UpConv(tC // 2, tC, name=f"upconv2_{branch}")(
            kernel_only=True)
        y = nn.elu(block_conv(y, w_up2, 2, u=2))            # (B,2h,2w,2tC)
        w_c2 = _Kernel((3, 3, tC // 2, tC // 2), name=f"conv2_{branch}")()
        y = nn.elu(block_conv(y, w_c2, 2, u=1))
        w_head = _Kernel((3, 3, tC // 2, out_ch), name=head)()
        # final unblock via the (px, co, py)-ordered kernel + EXACT 0/1
        # interleave matmul: the plain depth_to_space here is a
        # tiny-granule transpose at out_ch=1/2 lanes, measured ~1.6 ms
        # per forward across the two heads at 768x1024 (r5 profile);
        # the matmul form runs on the MXU and the row interleave is a
        # free reshape (ops/blockconv.py:depth_to_space_mm)
        y = block_conv_xcy(y, w_head, 2, u=1)               # (B,2h,2w,4*out)
        return depth_to_space_mm(y, 2)

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
        use_block = self.blockconv and tuple(out_hw) == (h * 4, w * 4)

        dfuse = jnp.concatenate([feat, depth_pred4[..., None], depth_token],
                                axis=-1)
        d = Mlp(dfuse.shape[-1], tC, name="depth_token_fuse")(dfuse)
        sfuse = jnp.concatenate([feat, seg_token], axis=-1)
        s = Mlp(sfuse.shape[-1], tC, name="seg_token_fuse")(sfuse)

        if use_block:
            d = self._tail_block(d, "depth", "get_depth", 1)
            seg = self._tail_block(s, "seg", "get_seg", 2)
        else:
            d = self._tail_direct(d, "depth", "get_depth", 1, mid_hw, out_hw)
            seg = self._tail_direct(s, "seg", "get_seg", 2, mid_hw, out_hw)
        depth = self.max_depth * nn.sigmoid(d)[..., 0]
        return depth, seg
