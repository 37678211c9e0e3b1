"""torch.nn.functional.interpolate equivalents (NCHW).

The reference leans on three resize flavours:
  - nearest (feature upsampling between scales and GT downsampling,
    reference: src/models/multiscale_transformerr.py:1193,1230,1267 and
    src/engine_glassrgbd.py:76-77),
  - bilinear align_corners=True (uncertainty-variance upsample and SPP
    branches, reference: src/models/points/points_sample.py:293,115-121),
  - nearest ×2 in the decoder upconvs (reference: src/models/dense_upsample.py:84-86).

torch 'nearest' uses src = floor(dst * in/out) — NOT half-pixel centers —
so jax.image.resize('nearest') would disagree; both are implemented here
by explicit gathers/weights so numerics match the reference exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """x: (..., H, W) -> (..., size[0], size[1]) with torch-nearest indices."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = size
    iy = jnp.minimum(jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32), H - 1)
    ix = jnp.minimum(jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32), W - 1)
    return x[..., iy, :][..., :, ix]


def resize_nearest_nhwc(x: jnp.ndarray, size) -> jnp.ndarray:
    """(B, H, W, C) -> (B, size[0], size[1], C), torch-nearest indices,
    gathering on the spatial axes directly — no NCHW round-trip (layout
    copies are a measured hotspot on TPU)."""
    B, H, W, C = x.shape
    Ho, Wo = size
    iy = jnp.minimum(jnp.floor(jnp.arange(Ho) * (H / Ho)).astype(jnp.int32), H - 1)
    ix = jnp.minimum(jnp.floor(jnp.arange(Wo) * (W / Wo)).astype(jnp.int32), W - 1)
    return x[:, iy][:, :, ix]


def resize_bilinear_nhwc(x: jnp.ndarray, size,
                         align_corners: bool = False) -> jnp.ndarray:
    """(B, H, W, C) -> (B, Ho, Wo, C), torch bilinear semantics, NHWC-native."""
    B, H, W, C = x.shape
    Ho, Wo = size

    def src_coords(out_len: int, in_len: int):
        i = jnp.arange(out_len, dtype=jnp.float32)
        if align_corners:
            if out_len == 1:
                return jnp.zeros((1,), jnp.float32)
            return i * ((in_len - 1) / max(out_len - 1, 1))
        s = (i + 0.5) * (in_len / out_len) - 0.5
        return jnp.clip(s, 0.0, in_len - 1)

    fy = src_coords(Ho, H)
    fx = src_coords(Wo, W)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (fy - y0).astype(x.dtype)[None, :, None, None]
    wx = (fx - x0).astype(x.dtype)[None, :, None]

    top = x[:, y0]
    bot = x[:, y1]
    row = top + (bot - top) * wy
    left = row[:, :, x0]
    right = row[:, :, x1]
    return left + (right - left) * wx


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """x: (..., H, W) -> (..., Ho, Wo), torch bilinear semantics."""
    H, W = x.shape[-2], x.shape[-1]
    Ho, Wo = size

    def src_coords(out_len: int, in_len: int):
        i = jnp.arange(out_len, dtype=jnp.float32)
        if align_corners:
            if out_len == 1:
                return jnp.zeros((1,), jnp.float32)
            return i * ((in_len - 1) / max(out_len - 1, 1))
        s = (i + 0.5) * (in_len / out_len) - 0.5
        return jnp.clip(s, 0.0, in_len - 1)

    fy = src_coords(Ho, H)
    fx = src_coords(Wo, W)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (fy - y0).astype(x.dtype)
    wx = (fx - x0).astype(x.dtype)

    top = x[..., y0, :]
    bot = x[..., y1, :]
    row = top + (bot - top) * wy[..., :, None]
    left = row[..., :, x0]
    right = row[..., :, x1]
    return left + (right - left) * wx
