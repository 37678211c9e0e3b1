"""DETR-style line-query transformer (the "line branch").

Rebuilds the reference's 6+6 layer post-norm DETR transformer with 100
learned queries (reference: src/models/transformer.py:18-287,
src/models/glassrgbd.py:51-62,86-94). The reference's vendored
MultiheadAttention (src/models/multi_head_attention.py) is functionally
torch.nn.MultiheadAttention; here attention is a batched einsum so XLA maps
it straight onto the MXU. Padding is handled with a key-validity mask
(True = real token), replacing the NestedTensor flatten at
transformer.py:47-57.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

_NEG = -1e9


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible: fused in-projection + out
    projection, scaled dot-product, optional key-padding mask, attention
    dropout (reference: src/models/multi_head_attention.py:375-380)."""
    d_model: int
    nheads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """query: (B, Nq, C), key/value: (B, Nk, C),
        key_valid: (B, Nk) bool (True = attendable)."""
        C, H = self.d_model, self.nheads
        hd = C // H
        in_w = self.param("in_proj_weight",
                          nn.initializers.xavier_uniform(), (3 * C, C))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        q = query @ in_w[:C].T.astype(query.dtype) + in_b[:C].astype(query.dtype)
        k = key @ in_w[C:2 * C].T.astype(key.dtype) + in_b[C:2 * C].astype(key.dtype)
        v = value @ in_w[2 * C:].T.astype(value.dtype) + in_b[2 * C:].astype(value.dtype)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :], logits, _NEG)
        attn = nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-norm encoder layer (reference: transformer.py:149-162)."""
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, key_valid, deterministic=True):
        qk = src + pos
        src2 = MultiheadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, name="self_attn")(
            qk, qk, src, key_valid, deterministic)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        src2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(src2))
        src2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(src2)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


class DecoderLayer(nn.Module):
    """Post-norm decoder layer (reference: transformer.py:212-233)."""
    d_model: int
    nheads: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, key_valid, deterministic=True):
        qk = tgt + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, name="self_attn")(
            qk, qk, tgt, None, deterministic)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt2 = MultiheadAttention(self.d_model, self.nheads, self.dropout,
                                  self.dtype, name="multihead_attn")(
            tgt + query_pos, memory + pos, memory, key_valid, deterministic)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        tgt2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(tgt2))
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(tgt2)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)


class DETRTransformer(nn.Module):
    """Encoder over flattened 1/32 tokens + decoder over `num_queries`
    line queries; returns every decoder layer's (normed) state for aux
    losses (reference: transformer.py:47-61,107-123)."""
    d_model: int
    nheads: int
    enc_layers: int
    dec_layers: int
    dim_feedforward: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, key_valid, query_embed, deterministic=True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """src/pos: (B, N, C); key_valid: (B, N) bool; query_embed: (Q, C).
        Returns hs (L, B, Q, C) and encoder memory (B, N, C)."""
        B = src.shape[0]
        memory = src
        for i in range(self.enc_layers):
            memory = EncoderLayer(self.d_model, self.nheads,
                                  self.dim_feedforward, self.dropout,
                                  self.dtype, name=f"encoder_layer{i}")(
                memory, pos, key_valid, deterministic)

        query_pos = jnp.broadcast_to(query_embed[None], (B,) + query_embed.shape)
        tgt = jnp.zeros_like(query_pos)
        inter = []
        out = tgt
        for i in range(self.dec_layers):
            out = DecoderLayer(self.d_model, self.nheads,
                               self.dim_feedforward, self.dropout,
                               self.dtype, name=f"decoder_layer{i}")(
                out, memory, pos, query_pos, key_valid, deterministic)
            inter.append(out)
        norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        hs = jnp.stack([norm(h) for h in inter], axis=0)
        return hs, memory


class MLP(nn.Module):
    """ReLU MLP head (reference: glassrgbd.py:30-42)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)
