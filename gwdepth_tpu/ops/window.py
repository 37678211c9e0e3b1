"""Shifted-window helpers, expressed as pure reshapes/transposes so XLA
lowers them to free layout changes.

Mirrors the semantics of the reference's window helpers
(reference: src/models/multiscale_transformerr.py:120-168 window_partition /
window_reverse and :936-955 attention-mask construction) but computes the
SW-MSA mask with broadcasted iota instead of host-side python loops, so it
stays inside jit with static shapes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C). H, W must be multiples of ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B * nH * nW, ws*ws, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _region_ids(size: int, ws: int, shift: int) -> np.ndarray:
    """Region index (0/1/2) along one axis for the SW-MSA mask: tokens in
    [0, size-ws), [size-ws, size-shift), [size-shift, size) — identical to
    the slice triplet in the reference (multiscale_transformerr.py:940-945).
    Computed with numpy at trace time (size/ws/shift are static)."""
    idx = np.arange(size)
    region = np.zeros(size, dtype=np.int32)
    region[(idx >= size - ws) & (idx < size - shift)] = 1
    region[idx >= size - shift] = 2
    return region


def shifted_window_attn_mask(Hp: int, Wp: int, ws: int, shift: int,
                             neg: float = -100.0) -> jnp.ndarray:
    """Attention bias (nW, ws*ws, ws*ws): 0 within the same shifted region,
    `neg` across regions (reference uses -100.0,
    multiscale_transformerr.py:955)."""
    rh = _region_ids(Hp, ws, shift)
    rw = _region_ids(Wp, ws, shift)
    img = (rh[:, None] * 3 + rw[None, :]).astype(np.float32)  # (Hp, Wp)
    img = jnp.asarray(img)[None, :, :, None]                  # (1, Hp, Wp, 1)
    win = window_partition(img, ws).squeeze(-1)               # (nW, ws*ws)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.where(diff != 0, jnp.float32(neg), jnp.float32(0.0))


def pad_to_window_multiple(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """Pad (B, H, W, C) on the bottom/right to multiples of `ws`
    (reference: multiscale_transformerr.py:667-671)."""
    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
