"""Shifted-window transformer blocks with line-reference attention.

TPU-first re-derivation of the reference's dense-encoder attention stack
(reference: src/models/multiscale_transformerr.py:202-979):

- `RefWindowAttention`  — Swin W-MSA + relative position bias, where the
  query is replaced by an attention-weighted mix of line-reference features
  before attending within the window (multiscale_transformerr.py:267-332).
- `WindowClassAttention` — plain W-MSA plus per-pixel depth/seg class-token
  channel cross-attention (multiscale_transformerr.py:455-580).
- `PlainWindowAttention` — vanilla Swin fallback used when the line branch
  is disabled (reference: src/models/swin_transformer.py:94-175).
- `SwinBlock` / `SwinLayer` — pad → cyclic shift → window partition →
  attention → reverse, with the reference-point coordinate roll
  (multiscale_transformerr.py:646-788, 834-979).

Everything is static-shape: window counts, pad amounts and the SW-MSA mask
are computed at trace time, so the whole stack jit-compiles to batched
matmuls on the MXU. Layout is NHWC.

Faithfully kept reference quirks (behavior over intent):
- shifted ref coords that fall below -1 are *reflected* (new = -2 - old),
  not wrapped (multiscale_transformerr.py:684);
- ref features are sampled from the padded map but ref pos-embeds from the
  unpadded one (multiscale_transformerr.py:694-696);
- both depth and seg tokens go through the same `proj_dth` projection
  (multiscale_transformerr.py:572,578 — `proj_seg` exists but is unused).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gwdepth_tpu.ops.window import (
    window_partition, window_reverse, shifted_window_attn_mask)
from gwdepth_tpu.ops.grid_sample import grid_sample_nhwc

TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)
XAVIER = nn.initializers.xavier_uniform()


def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table
    (reference: multiscale_transformerr.py:236-247). Static numpy."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # 2, ws, ws
    flat = coords.reshape(2, -1)                            # 2, N
    rel = flat[:, :, None] - flat[:, None, :]               # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                      # N, N


class RelPosBias(nn.Module):
    """Learned relative position bias (nH, N, N)."""
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        ws = self.window_size
        table = self.param("relative_position_bias_table", TRUNC02,
                           ((2 * ws - 1) ** 2, self.num_heads))
        idx = relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(ws * ws, ws * ws, self.num_heads)
        return bias.transpose(2, 0, 1)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(..., N, C) -> (..., heads, N, C/heads)"""
    *lead, N, C = x.shape
    x = x.reshape(*lead, N, heads, C // heads)
    return jnp.moveaxis(x, -2, -3)


def window_msa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               bias: jnp.ndarray, mask: Optional[jnp.ndarray],
               use_pallas: bool = False) -> jnp.ndarray:
    """Core windowed attention. q/k/v: (B, nW, nH, N, hd); bias (nH, N, N);
    mask (nW, N, N) additive or None. Returns (B, nW, N, nH*hd).
    Softmax in fp32 for TPU numerical safety.

    `use_pallas` routes through the fused VPU kernel
    (ops/pallas_kernels.window_msa_pallas, interpret mode off-TPU): at
    the class-transformer shapes (hd 4-8, ~10^3 windows) the XLA path
    materializes the f32 (nW, H, N, N) logits in HBM and runs its tiny
    dots at <1% MXU peak; the kernel keeps each window chunk's logits in
    VMEM and is also MORE accurate through the tunnel (true-f32 vs bf16
    matmul passes)."""
    if use_pallas:
        from gwdepth_tpu.ops.pallas_kernels import window_msa_pallas
        return window_msa_pallas(q, k, v, bias, mask,
                                 interpret=jax.default_backend() != "tpu")
    logits = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias[None, None]
    if mask is not None:
        logits = logits + mask[None, :, None]
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)
    B, nW, nH, N, hd = out.shape
    return jnp.moveaxis(out, 2, 3).reshape(B, nW, N, nH * hd)


class RefAttnDiffusion(nn.Module):
    """3-iteration conv diffusion over the query→reference attention map
    (reference: multiscale_transformerr.py:262,297-305): treat the
    (nW*N, n_rf) attention plane as an image with `heads` channels, run a
    3x3 conv + param-free layernorm over the full plane + GELU, residual.

    `use_pallas=True` runs all three iterations as ONE fused Pallas kernel
    with the plane resident in VMEM (differentiable: the custom VJP
    backpropagates through the XLA formulation below)."""
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, ref_attn: jnp.ndarray) -> jnp.ndarray:
        """ref_attn: (B, nW, heads, N, n_rf) -> same."""
        B, nW, H, N, R = ref_attn.shape
        # (B, nW*N, R, heads) image, NHWC
        a = jnp.moveaxis(ref_attn, 2, 4).reshape(B, nW * N, R, H)
        kernel = self.param("conv_kernel", XAVIER, (3, 3, H, H))
        bias = self.param("conv_bias", nn.initializers.zeros, (H,))

        if self.use_pallas:
            from gwdepth_tpu.ops.pallas_kernels import ref_attn_diffusion
            a = ref_attn_diffusion(a, kernel, bias)
        else:
            a = diffusion_xla(a, kernel, bias)
        a = a.reshape(B, nW, N, R, H)
        return jnp.moveaxis(a, 4, 2)


def diffusion_xla(a: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation of the 3-iteration diffusion (also the backward
    semantics for the Pallas kernel's custom VJP)."""
    for _ in range(3):
        upd = jax.lax.conv_general_dilated(
            a, kernel.astype(a.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        # F.layer_norm over [nW*N, n_rf] (no params): normalize each
        # plane per batch & head jointly over both spatial axes.
        mean = upd.mean(axis=(1, 2), keepdims=True)
        var = upd.var(axis=(1, 2), keepdims=True)
        upd = (upd - mean) * jax.lax.rsqrt(var + 1e-5)
        a = a + nn.gelu(upd, approximate=False)
    return a


class RefQueryMixture(nn.Module):
    """Replace window queries by an attention-weighted mixture of line
    reference tokens: learned mu/sigma reparam of the ref queries, conv
    diffusion of the query->ref attention map, softmax mix
    (reference: multiscale_transformerr.py:281-311 / :467-511 — the same
    machinery gated by `group_attention` in the class blocks)."""
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q: jnp.ndarray, x_ref: jnp.ndarray) -> jnp.ndarray:
        """q: (B, nW, H, N, hd) already scaled; x_ref: (B, n_rf, C)."""
        H = self.num_heads
        C = x_ref.shape[-1]
        ref_qk = nn.Dense(2 * C, kernel_init=TRUNC02, name="ref_qk")(x_ref)
        ref_q, ref_v = jnp.split(ref_qk, 2, axis=-1)  # (B, n_rf, C)
        mu = self.param("diff_mu", nn.initializers.normal(1.0), (1, 1, C))
        logsigma = self.param("diff_logsigma", XAVIER, (1, 1, C))
        ref_q = mu + jnp.exp(logsigma) * ref_q
        ref_q = _split_heads(ref_q, H)               # (B, H, n_rf, hd)
        ref_v = _split_heads(ref_v, H)

        ref_attn = jnp.einsum("bwhnd,bhrd->bwhnr", q, ref_q,
                              preferred_element_type=jnp.float32)
        ref_attn = RefAttnDiffusion(H, self.use_pallas,
                                    name="ref_attn_diffusion")(
            ref_attn.astype(x_ref.dtype))
        ref_attn = jax.nn.softmax(ref_attn.astype(jnp.float32),
                                  -1).astype(x_ref.dtype)
        return jnp.einsum("bwhnr,bhrd->bwhnd", ref_attn, ref_v)


class RefWindowAttention(nn.Module):
    """Line-referenced W-MSA (reference: multiscale_transformerr.py:202-332).

    The window query first attends over `n_rf` line-reference tokens (with a
    learned mu/sigma reparameterization of the reference queries and a conv
    diffusion of the attention map); the resulting mixture replaces the
    query for standard windowed attention with relative position bias."""
    dim: int
    window_size: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_ref: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x: (B, nW, N, C) windowed features; x_ref: (B, n_rf, C);
        mask: (nW, N, N) additive or None."""
        B, nW, N, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = hd ** -0.5

        qkv = nn.Dense(3 * C, kernel_init=TRUNC02, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, H)                       # (B, nW, H, N, hd)
        k = _split_heads(k, H)
        v = _split_heads(v, H)

        q_new = RefQueryMixture(H, self.use_pallas,
                                name="ref")(q * scale, x_ref)

        bias = RelPosBias(self.window_size, H, name="rel_pos_bias")()
        out = window_msa(q_new * scale, k, v, bias, mask)
        return nn.Dense(C, kernel_init=TRUNC02, name="proj")(out)


class PlainWindowAttention(nn.Module):
    """Vanilla Swin W-MSA (reference: src/models/swin_transformer.py:94-175),
    used for the 1/32 layer when the line branch is off."""
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        B, nW, N, C = x.shape
        H = self.num_heads
        scale = (C // H) ** -0.5
        qkv = nn.Dense(3 * C, kernel_init=TRUNC02, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, H) * scale
        k = _split_heads(k, H)
        v = _split_heads(v, H)
        bias = RelPosBias(self.window_size, H, name="rel_pos_bias")()
        out = window_msa(q, k, v, bias, mask)
        return nn.Dense(C, kernel_init=TRUNC02, name="proj")(out)


class _DenseParams(nn.Module):
    """Declares the same kernel/bias params an `nn.Dense(name=...)` would
    (identical tree paths/initializers) without applying the layer — the
    fused Pallas attention consumes them through layout-absorbing einsums
    instead (ops/pallas_kernels.fused_window_attention)."""
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", TRUNC02,
                           (self.features_in, self.features_out)),
                self.param("bias", nn.initializers.zeros,
                           (self.features_out,)))


class WindowClassAttention(nn.Module):
    """W-MSA plus depth/seg class-token channel cross-attention
    (reference: multiscale_transformerr.py:455-580, shipped config has
    group_attention off so the ref-query path is skipped,
    reference: src/args.py:140).

    Token update: each token stream queries (over its channel groups) the
    concat of window features and both token streams."""
    dim: int
    window_size: int
    num_heads: int
    token_dim: int
    group_attention: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, depth_token: jnp.ndarray,
                 seg_token: jnp.ndarray, mask: Optional[jnp.ndarray],
                 x_ref: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: (B, nW, N, C); tokens: (B, nW, N, tC); mask (nW, N, N)|None;
        x_ref: (B, n_rf, C) when group_attention."""
        B, nW, N, C = x.shape
        H = self.num_heads
        tC = self.token_dim
        scale = (C // H) ** -0.5

        # NOTE on the fused Pallas W-MSA (ops/pallas_kernels.py,
        # fused_window_attention): in ISOLATION it beats this XLA path
        # ~2x at the class shapes (and is more accurate through the
        # tunnel — true-f32 vs bf16 matmul passes), and wired in here it
        # cut class2/3 attention 7.8 -> 5.5 ms — but the custom-call
        # boundary forces the windowed features to MATERIALIZE, and the
        # layout conversions that appear upstream (backbone/proj convs,
        # +3.5 ms) outweigh the local win at every fencing strategy
        # tried (explicit transposes / layout-absorbing GEMMs /
        # optimization_barrier / a Pallas identity fence). XLA's fusion
        # of window-partition into the qkv GEMM is worth more than the
        # kernel saves, so the model keeps the XLA formulation; the
        # kernel stays available for standalone/serving use.
        qkv = nn.Dense(3 * C, kernel_init=TRUNC02, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, H) * scale
        k = _split_heads(k, H)
        v = _split_heads(v, H)
        if self.group_attention and x_ref is not None:
            # gated ref-query replacement (reference :467-511; the shipped
            # config keeps group_attention_layers all False, src/args.py:140)
            q = RefQueryMixture(H, self.use_pallas,
                                name="ref")(q, x_ref) * scale
        bias = RelPosBias(self.window_size, H, name="rel_pos_bias")()
        out = window_msa(q, k, v, bias, mask)
        x_out = nn.Dense(C, kernel_init=TRUNC02, name="proj")(out)

        # ---- class-token channel cross-attention (ref :561-578) ----
        depth_q = nn.Dense(tC, kernel_init=TRUNC02, name="cls_dth_q")(depth_token)
        seg_q = nn.Dense(tC, kernel_init=TRUNC02, name="cls_seg_q")(seg_token)
        t_x = jnp.concatenate([x_out, depth_token, seg_token], axis=-1)
        t_k = nn.Dense(t_x.shape[-1], kernel_init=TRUNC02, name="global_k")(t_x)
        t_v = nn.Dense(t_x.shape[-1], kernel_init=TRUNC02, name="global_v")(t_x)

        # (B, nW, H, N, d) with d = tC/H for queries, (C+2tC)/H for k/v
        dq = _split_heads(depth_q, H) * scale
        sq = _split_heads(seg_q, H) * scale
        tk = _split_heads(t_k, H)
        tv = _split_heads(t_v, H)

        proj_dth = nn.Dense(tC, kernel_init=TRUNC02, name="proj_dth")

        # both token streams attend over the SAME tk/tv, and each channel
        # group is an independent softmax row — so run depth+seg as ONE
        # einsum pair (2x fewer small-dim dispatches; math identical)
        d_tok = tC // H
        q2 = jnp.concatenate([dq, sq], axis=-1)     # (B,nW,H,N,2*d_tok)
        # channel attention: (B,nW,H,2d,N) @ (B,nW,H,N,d_kv)
        a = jnp.einsum("bwhnd,bwhne->bwhde", q2, tk,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1).astype(tv.dtype)
        # (B,nW,H,2d,d_kv) @ (B,nW,H,d_kv,N)^T -> (B,nW,H,2d,N)
        t2 = jnp.einsum("bwhde,bwhne->bwhdn", a, tv)

        def finish(t):
            # heads*d_tok = tC channels, back to (B, nW, N, tC)
            t = t.reshape(B, nW, H * d_tok, N)
            t = jnp.moveaxis(t, 2, 3)
            # reference applies proj_dth to BOTH streams (ref :572,578)
            return proj_dth(t)

        return (x_out, finish(t2[..., :d_tok, :]),
                finish(t2[..., d_tok:, :]))


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference: multiscale_transformerr.py:55-73)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=TRUNC02, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=TRUNC02, name="fc2")(x)


def roll_ref_coords(ref: jnp.ndarray, shift: int, Hp: int, Wp: int) -> jnp.ndarray:
    """Shift normalized [-1,1] reference coords with the cyclic shift and
    reflect out-of-range values (reference: multiscale_transformerr.py:680-684
    — new = -2 - old for values < -1; behavior preserved verbatim)."""
    rx = ref[..., 0] - (shift / (Wp - 1)) * 2.0
    ry = ref[..., 1] - (shift / (Hp - 1)) * 2.0
    rolled = jnp.stack([rx, ry], axis=-1)
    return jnp.where(rolled < -1.0, -2.0 - rolled, rolled)


def _pad_hw(x: jnp.ndarray, Hp: int, Wp: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    if H == Hp and W == Wp:
        return x
    return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))


class SwinBlock(nn.Module):
    """One (shifted-)window block over an NHWC feature map, optionally with
    line-reference attention and depth/seg token streams
    (reference: multiscale_transformerr.py:583-788)."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    attn_kind: str          # "ref" | "class" | "plain"
    token_dim: int = 0
    group_attention: bool = False
    use_pallas: bool = False
    token_fuse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 ref_coords: Optional[jnp.ndarray] = None,
                 ref_pos: Optional[jnp.ndarray] = None,
                 depth_token: Optional[jnp.ndarray] = None,
                 seg_token: Optional[jnp.ndarray] = None,
                 token_pos: Optional[jnp.ndarray] = None):
        """x: (B, H, W, C); ref_coords: (B, L, P, 2) in [-1,1];
        ref_pos: (B, H, W, C) positional map; tokens: (B, H, W, tC);
        token_pos: (B, H, W, tC) positional map for the token streams
        (only used when token_fuse)."""
        B, H, W, C = x.shape
        ws, shift = self.window_size, self.shift_size
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
        has_tokens = depth_token is not None

        tC = self.token_dim
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if has_tokens:
            d_shortcut, s_shortcut = depth_token, seg_token
            depth_token = nn.LayerNorm(epsilon=1e-5, name="norm_depth1")(depth_token)
            seg_token = nn.LayerNorm(epsilon=1e-5, name="norm_seg1")(seg_token)
            # one pad/roll/partition for all three streams (op-count is the
            # measured TPU bottleneck, not FLOPs)
            x = jnp.concatenate([x, depth_token, seg_token], axis=-1)

        x = _pad_hw(x, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            attn_mask = shifted_window_attn_mask(Hp, Wp, ws, shift)
            if ref_coords is not None:
                ref_coords = roll_ref_coords(ref_coords, shift, Hp, Wp)
                if ref_pos is not None:
                    ref_pos = jnp.roll(ref_pos, (-shift, -shift), axis=(1, 2))
        else:
            attn_mask = None

        # sample line-reference features on the (padded, shifted) map; pos
        # embeds from the unpadded map — reference behavior (:694-696)
        need_ref = (self.attn_kind == "ref"
                    or (self.attn_kind == "class" and self.group_attention))
        x_ref = None
        if need_ref and ref_coords is not None:
            x_ref = grid_sample_nhwc(x[..., :C], ref_coords, mode="nearest")
            if ref_pos is not None:
                x_ref = x_ref + grid_sample_nhwc(ref_pos, ref_coords,
                                                 mode="nearest")
            x_ref = x_ref.reshape(B, -1, C)          # (B, L*P, C)

        nW = (Hp // ws) * (Wp // ws)
        xw = window_partition(x, ws).reshape(B, nW, ws * ws, x.shape[-1])
        if has_tokens:
            xw, dw, sw = (xw[..., :C], xw[..., C:C + tC], xw[..., C + tC:])

        if self.attn_kind == "ref":
            out = RefWindowAttention(self.dim, ws, self.num_heads,
                                     self.use_pallas,
                                     name="attn")(xw, x_ref, attn_mask)
        elif self.attn_kind == "class":
            out, dw, sw = WindowClassAttention(
                self.dim, ws, self.num_heads, self.token_dim,
                self.group_attention, self.use_pallas,
                name="attn")(xw, dw, sw, attn_mask, x_ref)
        else:
            out = PlainWindowAttention(self.dim, ws, self.num_heads,
                                       name="attn")(xw, attn_mask)

        if has_tokens:
            out = jnp.concatenate([out, dw, sw], axis=-1)

        def from_windows(t):
            c = t.shape[-1]
            t = window_reverse(t.reshape(-1, ws * ws, c), ws, Hp, Wp)
            if shift > 0:
                t = jnp.roll(t, (shift, shift), axis=(1, 2))
            return t[:, :H, :W]

        out = from_windows(out)
        x = shortcut + out[..., :C]
        x = x + Mlp(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x))

        if has_tokens:
            depth_token = d_shortcut + out[..., C:C + tC]
            depth_token = depth_token + Mlp(
                int(tC * self.mlp_ratio), tC,
                name="mlp_depth")(nn.LayerNorm(epsilon=1e-5, name="norm_depth2")(depth_token))
            seg_token = s_shortcut + out[..., C + tC:]
            seg_token = seg_token + Mlp(
                int(tC * self.mlp_ratio), tC,
                name="mlp_seg")(nn.LayerNorm(epsilon=1e-5, name="norm_seg2")(seg_token))
            if self.token_fuse and ref_coords is not None:
                # point-guided depth-token fusion, gated like the reference's
                # `token_fuse and args.with_line` (multiscale_transformerr.py
                # :781-786); uses the rolled ref coords, as there
                from gwdepth_tpu.models.geometry import PointGuidedTokenFuse
                depth_token = PointGuidedTokenFuse(
                    C, tC, name="token_relation")(
                    x, seg_token, depth_token, ref_coords, token_pos)

        return x, depth_token, seg_token


class SwinLayer(nn.Module):
    """Stack of SwinBlocks with alternating shift 0 / ws//2
    (reference: multiscale_transformerr.py:834-979)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    attn_kind: str
    token_dim: int = 0
    group_blocks: Tuple[bool, ...] = ()
    remat: bool = False
    use_pallas: bool = False
    token_fuse: bool = False

    @nn.compact
    def __call__(self, x, ref_coords=None, ref_pos=None,
                 depth_token=None, seg_token=None, token_pos=None):
        Block = nn.remat(SwinBlock, static_argnums=()) if self.remat else SwinBlock
        for i in range(self.depth):
            group = (self.group_blocks[i]
                     if i < len(self.group_blocks) else False)
            x, depth_token, seg_token = Block(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.mlp_ratio, self.attn_kind, self.token_dim, group,
                self.use_pallas, self.token_fuse,
                name=f"block{i}")(x, ref_coords, ref_pos,
                                  depth_token, seg_token, token_pos)
        return x, depth_token, seg_token
