"""Sine position embeddings (DETR-style).

Two variants exist in the reference and both are reproduced:
  - mask-based cumsum with normalize=True for the line branch
    (reference: src/models/position_encoding.py:28-48, built with
    normalize=True at :83),
  - un-normalized variant for the dense encoder where PositionEmbeddingSine
    is constructed with default normalize=False
    (reference: src/models/multiscale_transformerr.py:1035,1051-1052).

`valid_mask` is True on VALID pixels (the inverse of the reference's padding
mask convention, where mask==True means padding).
"""

from __future__ import annotations

import math

import flax.linen as _nn
import jax.numpy as jnp


def _sine_embed(y_embed: jnp.ndarray, x_embed: jnp.ndarray,
                num_pos_feats: int, temperature: float) -> jnp.ndarray:
    """y_embed/x_embed: (B, H, W) float -> (B, 2*num_pos_feats, H, W)."""
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t   # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        (jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=4
    ).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack(
        (jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=4
    ).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate((pos_y, pos_x), axis=3)  # (B, H, W, 2F)


def sine_posemb_from_mask_nhwc(valid_mask: jnp.ndarray, num_pos_feats: int,
                               temperature: float = 10000.0,
                               normalize: bool = False,
                               scale: float | None = None) -> jnp.ndarray:
    """valid_mask: (B, H, W) bool, True = valid pixel.
    Returns (B, H, W, 2*num_pos_feats) — the framework's native layout."""
    if scale is None:
        scale = 2 * math.pi
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    return _sine_embed(y_embed, x_embed, num_pos_feats, temperature)


def sine_posemb_from_mask(valid_mask: jnp.ndarray, num_pos_feats: int,
                          temperature: float = 10000.0,
                          normalize: bool = False,
                          scale: float | None = None) -> jnp.ndarray:
    """NCHW variant (torch-parity tests): (B, 2*num_pos_feats, H, W)."""
    return sine_posemb_from_mask_nhwc(
        valid_mask, num_pos_feats, temperature, normalize,
        scale).transpose(0, 3, 1, 2)


def sine_posemb_grid(batch: int, H: int, W: int, num_pos_feats: int,
                     temperature: float = 10000.0,
                     normalize: bool = False,
                     scale: float | None = None) -> jnp.ndarray:
    """Full-valid shortcut of `sine_posemb_from_mask` (cumsum of ones is a
    static ramp, so XLA folds this to a constant)."""
    ones = jnp.ones((batch, H, W), dtype=jnp.bool_)
    return sine_posemb_from_mask(ones, num_pos_feats, temperature, normalize, scale)


class LearnedPosEmb2D(_nn.Module):
    """Learned absolute 2-D position embedding
    (reference: src/models/position_encoding.py:50-77, selected by
    --position_embedding learned/v3 at :79-87).

    Row/col tables of size 50 with uniform init, concat [x_emb, y_emb] —
    table size and ordering preserved from the reference (feature maps
    larger than 50 in either dim are unsupported there too; the line
    branch runs at 1/32, i.e. <= 32x32 for 1024px inputs)."""
    num_pos_feats: int = 256

    @_nn.compact
    def __call__(self, B: int, H: int, W: int) -> jnp.ndarray:
        """-> (B, H, W, 2*num_pos_feats) NHWC."""
        init = _nn.initializers.uniform(scale=1.0)
        F = self.num_pos_feats
        row = self.param("row_embed", init, (50, F))
        col = self.param("col_embed", init, (50, F))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[:W][None, :, :], (H, W, F)),
            jnp.broadcast_to(row[:H][:, None, :], (H, W, F)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * F))
