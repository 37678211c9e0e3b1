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

import functools

import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=None)
def _lerp_matrix(out_len: int, in_len: int, align_corners: bool) -> np.ndarray:
    """(out_len, in_len) row-stochastic interpolation matrix with torch
    bilinear weights (two taps per row)."""
    i = np.arange(out_len, dtype=np.float64)
    if align_corners:
        f = (i * ((in_len - 1) / max(out_len - 1, 1))
             if out_len > 1 else np.zeros((1,)))
    else:
        f = np.clip((i + 0.5) * (in_len / out_len) - 0.5, 0.0, in_len - 1)
    i0 = np.floor(f).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_len - 1)
    w = f - i0
    M = np.zeros((out_len, in_len), np.float32)
    M[np.arange(out_len), i0] += (1.0 - w).astype(np.float32)
    M[np.arange(out_len), i1] += w.astype(np.float32)
    return M


def resize_bilinear_matmul_nhwc(x: jnp.ndarray, size,
                                align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize as two separable matmuls (exact same lerp weights
    as `resize_bilinear_nhwc`). On TPU the gather-based resize costs
    several relayout passes; expressing it as (Ho,H) @ x @ (W,Wo) keeps it
    on the MXU with one output write. Preferred for the SPP branch
    upsamples (models/points.py)."""
    B, H, W, C = x.shape
    Ho, Wo = size
    Ry = jnp.asarray(_lerp_matrix(Ho, H, align_corners))
    Rx = jnp.asarray(_lerp_matrix(Wo, W, align_corners))
    y = jnp.einsum("hH,bHWc->bhWc", Ry, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("wW,bhWc->bhwc", Rx, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _pool_matrix(in_len: int, k: int) -> np.ndarray:
    """(in_len//k, in_len) non-overlapping mean-pool matrix. Trailing
    `in_len % k` positions get zero weight (VALID-window floor semantics,
    matching `nn.avg_pool(strides=k)`)."""
    out_len = in_len // k
    M = np.zeros((out_len, in_len), np.float32)
    for i in range(out_len):
        M[i, i * k:(i + 1) * k] = 1.0 / k
    return M


def avg_pool_matmul_nhwc(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping k x k average pool as two separable matmuls
    (exactly `nn.avg_pool(x, (k, k), strides=(k, k))` up to summation
    order). reduce_window at large k is measurably slower on TPU."""
    B, H, W, C = x.shape
    Py = jnp.asarray(_pool_matrix(H, k))
    Px = jnp.asarray(_pool_matrix(W, k))
    y = jnp.einsum("hH,bHWc->bhWc", Py, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("wW,bhWc->bhwc", Px, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


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
