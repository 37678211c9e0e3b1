"""Plane-normal consistency loss (optional, --with_plane_norm_loss).

Jittable re-derivation of the reference's PlaneLoss
(reference: src/models/glassrgbd.py:385-450 + src/models/losses/sobel.py):
surface normals from Sobel depth gradients; for each high-scoring predicted
line-triangle (2 endpoints + polygon center), penalize the variance of the
normal's x/y components inside the triangle.

The reference rasterizes with matplotlib Path.contains_points per triangle
on the host and `continue`s on small areas (glassrgbd.py:430-440) — here
triangle membership is a batched half-plane sign test over the pixel grid
and the score/area gates become multiplicative weights, so the whole loss is
one fused XLA program over a FIXED `num_ref` triangles (B==1 restriction
gone; works for any batch)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SOBEL_KX = jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
SOBEL_KY = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)


def sobel_grad(depth: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W) -> (dx, dy) with the reference's kernels (sobel.py:9-11),
    zero ('same') padding."""
    x = depth[:, None]                                      # (B, 1, H, W)
    k = jnp.stack([SOBEL_KX, SOBEL_KY])[:, None]            # (2, 1, 3, 3)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0], out[:, 1]


def point_in_triangle(tri: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """tri: (..., 3, 2) pixel coords (x, y) -> (..., H, W) bool masks via
    consistent half-plane signs."""
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (H, W))
    py = jnp.broadcast_to(ys[:, None], (H, W))

    def edge(a, b):
        # cross((b - a), (p - a)) for every pixel p
        return ((b[..., 0] - a[..., 0])[..., None, None]
                * (py - a[..., 1][..., None, None])
                - (b[..., 1] - a[..., 1])[..., None, None]
                * (px - a[..., 0][..., None, None]))

    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    d0 = edge(a, b)
    d1 = edge(b, c)
    d2 = edge(c, a)
    neg = (d0 <= 0) & (d1 <= 0) & (d2 <= 0)
    pos = (d0 >= 0) & (d1 >= 0) & (d2 >= 0)
    return neg | pos


def plane_norm_loss(depth_pred: jnp.ndarray, pred_lines: jnp.ndarray,
                    pred_logits: jnp.ndarray, valid: jnp.ndarray,
                    num_ref: int = 28, score_thresh: float = 0.6,
                    min_area: int = 100) -> jnp.ndarray:
    """depth_pred: (B, H, W); pred_lines: (B, Q, 6) normalized
    [x1 y1 x2 y2 cx cy]; pred_logits: (B, Q, 2); valid: (B, H, W) bool."""
    B, H, W = depth_pred.shape
    dx, dy = sobel_grad(depth_pred)
    # normal = (-dx, -dy, 1); only x/y enter the variance (glassrgbd.py:441-445)

    score = jax.nn.softmax(pred_logits, -1)[..., 0]         # (B, Q)
    logit0 = pred_logits[..., 0]
    _, ids = jax.lax.top_k(logit0, num_ref)                 # (B, R)
    tri = jnp.take_along_axis(pred_lines, ids[..., None], axis=1)
    tri_score = jnp.take_along_axis(score, ids, axis=1)     # (B, R)
    tri = tri.reshape(B, num_ref, 3, 2) * jnp.asarray([W, H], jnp.float32)
    tri = jnp.round(tri)
    tri = jnp.stack([tri[..., 0].clip(0, W - 1),
                     tri[..., 1].clip(0, H - 1)], -1)

    masks = point_in_triangle(tri, H, W)                    # (B, R, H, W)
    masks = masks & valid[:, None]
    area = masks.sum(axis=(2, 3)).astype(jnp.float32)       # (B, R)
    gate = (tri_score > score_thresh) & (area >= min_area)

    def masked_var(g):
        m = masks.astype(jnp.float32)
        cnt = jnp.maximum(area, 1.0)
        mean = (g[:, None] * m).sum(axis=(2, 3)) / cnt
        var = ((g[:, None] - mean[..., None, None]) ** 2 * m
               ).sum(axis=(2, 3)) / cnt
        return var                                          # (B, R)

    var = masked_var(-dx) + masked_var(-dy)
    n = jnp.maximum(gate.sum(axis=1).astype(jnp.float32), 1.0)
    per_image = (var * gate).sum(axis=1) / n
    return per_image.mean()
