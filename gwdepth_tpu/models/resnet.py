"""ResNet-50/101 backbone with frozen BatchNorm, NHWC, flax.linen.

Reimplements the reference backbone (reference: src/models/backbone.py:19-94):
torchvision ResNet with FrozenBatchNorm2d — batch statistics and affine
parameters are constants, so each BN is a pure per-channel affine
``x * scale + bias`` with scale = w / sqrt(rv + eps), bias = b - rm * scale
(reference: backbone.py:45-55). The reference freezes conv1/bn1/layer1
always and trains layer2-4 at a reduced LR (backbone.py:62-64,
main_glassrgbd.py:59-65); here freezing is applied through optimizer param
labels (see gwdepth_tpu/parallel/train_step.py), keeping the module purely
functional.

Returns a 4-level pyramid (1/4, 1/8, 1/16, 1/32) with per-level validity
masks downsampled from the image mask (reference: backbone.py:72-81), the
mask-based NestedTensor equivalent.

Layout is NHWC (TPU-native); parameter names mirror torchvision
(`layer2.0.conv1` → module path layer2/block0/conv1) so the torch weight
converter (gwdepth_tpu/convert/torch_weights.py) is a mechanical key remap.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gwdepth_tpu.ops.interpolate import resize_nearest


class FrozenBatchNorm(nn.Module):
    """Per-channel affine with torch-BN parameterization (backbone.py:45-55).
    All four tensors are stored so torchvision checkpoints import losslessly;
    the optimizer labels them frozen."""
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.param("running_mean", nn.initializers.zeros, (self.features,))
        rv = self.param("running_var", nn.initializers.ones, (self.features,))
        eps = 1e-5
        scale = w * jax.lax.rsqrt(rv + eps)
        bias = b - rm * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + shortcut."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, downsample=True,
                       dtype=self.dtype, name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class ResNetBackbone(nn.Module):
    """4-level feature pyramid: returns [C1(1/4,256), C2(1/8,512),
    C3(1/16,1024), C4(1/32,2048)] in NHWC."""
    name_or_depth: str = "resnet50"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = _LAYERS[self.name_or_depth]
        x = images.astype(self.dtype)
        # stem: 7x7/2 + maxpool 3x3/2 (torch pads 3 and 1 resp.)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, (planes, nblk) in enumerate(zip((64, 128, 256, 512), blocks)):
            stride = 1 if i == 0 else 2
            x = ResNetStage(planes, nblk, stride, dtype=self.dtype,
                            name=f"layer{i + 1}")(x)
            feats.append(x)
        return tuple(feats)


def pyramid_masks(valid_mask: jnp.ndarray,
                  feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
    """Downsample the (B, H, W) bool image-validity mask to each level via
    nearest interpolation of the float mask, matching the reference's
    ``F.interpolate(m[None].float(), size=...).to(torch.bool)``
    (backbone.py:79). Note the reference interpolates the PADDING mask; we
    carry the VALID mask — the nearest-resize of a binary map commutes with
    logical negation, so the conventions agree."""
    out = []
    m = valid_mask.astype(jnp.float32)
    for f in feats:
        h, w = f.shape[1], f.shape[2]
        out.append(resize_nearest(m, (h, w)) > 0.5)
    return tuple(out)
