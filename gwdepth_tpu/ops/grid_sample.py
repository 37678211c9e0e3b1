"""torch.nn.functional.grid_sample equivalent as XLA gathers.

The reference mixes call-site conventions: `mode='nearest'` with the default
align_corners=False for reference-line feature sampling
(reference: src/models/multiscale_transformerr.py:694-696) and default
bilinear for point-based depth anchors
(reference: src/models/points/points_sample.py:264-268). Both are
reproduced here, padding_mode='zeros' (out-of-bounds samples contribute 0),
with the same unnormalization rules:

  align_corners=False: ix = ((x + 1) * W - 1) / 2
  align_corners=True:  ix = (x + 1) / 2 * (W - 1)

Nearest rounding is round-half-to-even, matching torch's nearbyint.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather2d(x: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, H, W); iy/ix: (B, N) int32 already clipped in-bounds.
    Returns (B, C, N)."""
    B, C, H, W = x.shape
    flat = x.reshape(B, C, H * W)
    idx = (iy * W + ix).astype(jnp.int32)  # (B, N)
    return jnp.take_along_axis(flat, idx[:, None, :], axis=2)


def _gather2d_nhwc(x: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C); iy/ix: (B, N) int32 clipped in-bounds -> (B, N, C).
    Gathers on the flattened spatial axis, channels stay in the lane dim —
    no layout copies."""
    B, H, W, C = x.shape
    flat = x.reshape(B, H * W, C)
    idx = (iy * W + ix).astype(jnp.int32)
    return jnp.take_along_axis(flat, idx[:, :, None], axis=1)


def grid_sample_nhwc(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                     align_corners: bool = False) -> jnp.ndarray:
    """NHWC-native grid_sample: x (B, H, W, C), grid (B, Hg, Wg, 2) ->
    (B, Hg, Wg, C). Same sampling semantics as `grid_sample`."""
    B, H, W, C = x.shape
    _, Hg, Wg, _ = grid.shape
    gx = grid[..., 0].reshape(B, Hg * Wg)
    gy = grid[..., 1].reshape(B, Hg * Wg)
    fx = _unnormalize(gx.astype(jnp.float32), W, align_corners)
    fy = _unnormalize(gy.astype(jnp.float32), H, align_corners)

    if mode == "nearest":
        ix = jnp.round(fx)
        iy = jnp.round(fy)
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        out = _gather2d_nhwc(x, jnp.clip(iy, 0, H - 1).astype(jnp.int32),
                             jnp.clip(ix, 0, W - 1).astype(jnp.int32))
        out = out * valid[..., None].astype(x.dtype)
        return out.reshape(B, Hg, Wg, C)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    out = jnp.zeros((B, Hg * Wg, C), dtype=x.dtype)
    for yi, wy in ((y0, 1.0 - (fy - y0)), (y0 + 1.0, fy - y0)):
        for xi, wx in ((x0, 1.0 - (fx - x0)), (x0 + 1.0, fx - x0)):
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            w = (wx * wy * valid).astype(x.dtype)
            g = _gather2d_nhwc(x, jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                               jnp.clip(xi, 0, W - 1).astype(jnp.int32))
            out = out + g * w[..., None]
    return out.reshape(B, Hg, Wg, C)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    """x: (B, C, H, W), grid: (B, Hg, Wg, 2) in [-1, 1] with (x, y) order.
    Returns (B, C, Hg, Wg)."""
    B, C, H, W = x.shape
    _, Hg, Wg, _ = grid.shape
    gx = grid[..., 0].reshape(B, Hg * Wg)
    gy = grid[..., 1].reshape(B, Hg * Wg)
    fx = _unnormalize(gx.astype(jnp.float32), W, align_corners)
    fy = _unnormalize(gy.astype(jnp.float32), H, align_corners)

    if mode == "nearest":
        ix = jnp.round(fx)
        iy = jnp.round(fy)
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        out = _gather2d(x, iyc, ixc) * valid[:, None, :].astype(x.dtype)
        return out.reshape(B, C, Hg, Wg)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = jnp.zeros((B, C, Hg * Wg), dtype=x.dtype)
    for yi, wy in ((y0, wy0), (y1, wy1)):
        for xi, wx in ((x0, wx0), (x1, wx1)):
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ixc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            iyc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            w = (wx * wy * valid).astype(x.dtype)
            out = out + _gather2d(x, iyc, ixc) * w[:, None, :]
    return out.reshape(B, C, Hg, Wg)
