"""Point/line-guided geometry fusion modules.

TPU-native (NHWC, static-shape) re-derivations of the reference's
`src/models/geometry_utils.py` and the point-token attention from
`src/models/multiscale_transformerr.py:334-374`. In the reference these
modules are library code behind gates that the shipped stage-1 config keeps
off (`class_tokenfuse_layers` defaults to all-False and is never even read
by the model code, `src/args.py:154`; `with_line_depth` is off;
`class_pred=True` is never passed). They are rebuilt here so the full
component inventory is available, and `PointGuidedTokenFuse` is actually
wired behind `config.class_tokenfuse_layers` (we honor the flag the
reference declares but never consumes).

Reference bitrot, preserved in spirit but not in crashes:
- `NonLocalPlannarGuidance` is instantiated with a `pre_pred=` kwarg its
  __init__ does not accept (multiscale_transformerr.py:919) — enabling
  `class_pred` in the reference raises TypeError. We implement the class as
  defined (geometry_utils.py:246-328).
- `ReflectionReduce.sp_red1` builds `upconv(..., ratio=0)`
  (geometry_utils.py:355) whose forward would interpolate with
  scale_factor=0; we treat ratio=0 as "no resize".
- `sample_by_centers` computes line length with the x-coords scaled by BOTH
  width and height (geometry_utils.py:442-443) — quirk kept and documented.

Coordinate convention: `refer_coords` are (B, L, P, 2) in [-1, 1], (x, y)
order, sampled with nearest-neighbor torch `grid_sample` semantics
(align_corners=False at every call site here, matching the reference
defaults in geometry_utils.py:222,308,637).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from gwdepth_tpu.models.swin import Mlp, TRUNC02, XAVIER
from gwdepth_tpu.ops.grid_sample import grid_sample_nhwc
from gwdepth_tpu.ops.interpolate import resize_bilinear_nhwc, resize_nearest_nhwc


class ConvA(nn.Module):
    """conv(k) + GELU (reference: geometry_utils.py:84-98)."""
    out: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.out, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    kernel_init=XAVIER, name="conv")(x)
        return nn.gelu(x, approximate=False)


def _flatten_hw(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def _sample_points(feat_map: jnp.ndarray, coords: jnp.ndarray,
                   pos_map: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Nearest grid-sample of an NHWC map at (B, L, P, 2) coords, plus the
    positional map sampled at the same points (reference pattern,
    geometry_utils.py:637-641). Returns (B, L*P, C)."""
    s = grid_sample_nhwc(feat_map, coords, mode="nearest")
    if pos_map is not None:
        s = s + grid_sample_nhwc(pos_map, coords, mode="nearest")
    B = s.shape[0]
    return s.reshape(B, -1, s.shape[-1])


# ---------------------------------------------------------------------------
# PointGuidedTokenFuse — the one module actually reachable via a flag
# ---------------------------------------------------------------------------

class PointGuidedTokenFuse(nn.Module):
    """Seg-token-queried attention over line-sampled depth tokens at two
    pooling scales (reference: geometry_utils.py:535-652).

    Depth/seg tokens are first fused with the block features; depth tokens
    are sampled at the reference line points; the seg stream queries, per
    pooling scale ks=(kernel, stride) in ((11,5), (17,8)), the concat of a
    conv-processed pooled depth-token context and the sampled reference
    tokens; the two fused streams are linearly merged."""
    x_dim: int
    token_dim: int
    ks_list: Tuple[Tuple[int, int], ...] = ((11, 5), (17, 8))

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg_token: jnp.ndarray,
                 depth_token: jnp.ndarray, refer_coords: jnp.ndarray,
                 token_pos: Optional[jnp.ndarray], with_pos: bool = True
                 ) -> jnp.ndarray:
        """x: (B, H, W, x_dim) block features; seg/depth_token and token_pos:
        (B, H, W, tC); refer_coords: (B, L, P, 2) in [-1, 1].
        Returns the fused depth token map (B, H, W, tC) — no residual, the
        reference returns the fusion directly (geometry_utils.py:651-652)."""
        tC = self.token_dim
        B, H, W, _ = x.shape
        xf = _flatten_hw(x)
        st = jnp.concatenate([_flatten_hw(seg_token), xf], axis=-1)
        dt = jnp.concatenate([_flatten_hw(depth_token), xf], axis=-1)
        stx = Mlp(self.x_dim, tC, name="xseg_proj")(st)
        dtx = Mlp(self.x_dim, tC, name="xdth_proj")(dt)

        refer_depth = _sample_points(
            dtx.reshape(B, H, W, tC), refer_coords,
            token_pos if with_pos else None)               # (B, L*P, tC)

        # two-layer Mlps, as the reference builds them
        # (geometry_utils.py:544-545: Mlp(tC, out=2tC) / Mlp(tC, out=tC))
        q_seg = nn.LayerNorm(epsilon=1e-5, name="norm_seg")(
            Mlp(tC, tC, name="q_seg")(stx))
        q_seg = q_seg * (tC ** -0.5)

        mlpctx = Mlp(tC * 4, tC, name="mlpctx")
        kv_refer = Mlp(tC, 2 * tC, name="kv_refer_depth")
        fuse_proj = nn.Dense(tC, kernel_init=TRUNC02, name="fuse_proj")
        norm_fuse = nn.LayerNorm(epsilon=1e-5, name="norm_fuse")
        fused_depth_proj = nn.Dense(tC, kernel_init=TRUNC02,
                                    name="fused_depth_proj")
        # ONE conv tower shared by every pooling scale (the reference reuses
        # self.convctx_* across ks, geometry_utils.py:579-609)
        convctx = [ConvA(tC * 4, 3, name="convctx_pre3_0"),
                   ConvA(tC * 4, 3, name="convctx_pre3_1"),
                   nn.LayerNorm(epsilon=1e-5, name="convctx_norm3"),
                   ConvA(tC, 3, name="convctx_after3"),
                   ConvA(tC * 4, 5, name="convctx_pre5_0"),
                   ConvA(tC * 4, 5, name="convctx_pre5_1"),
                   nn.LayerNorm(epsilon=1e-5, name="convctx_norm5"),
                   ConvA(tC, 5, name="convctx_after5")]

        def conv_process(y):
            for m in convctx:
                y = m(y)
            return y

        streams = []
        for k, s in self.ks_list:
            # pad so a 2-step pool fits (reference: geometry_utils.py:598-606)
            min_size = (2 - 1) * s + k
            dtm = depth_token
            if H < min_size or W < min_size:
                dtm = jnp.pad(dtm, ((0, 0), (0, max(0, min_size - H)),
                                    (0, max(0, min_size - W)), (0, 0)))
            pooled = nn.avg_pool(dtm, (k, k), strides=(s, s), padding="VALID")
            ctx = conv_process(pooled)
            ctx = _flatten_hw(ctx)                          # (B, n, tC)
            ctx1 = mlpctx(jnp.concatenate([ctx, refer_depth], axis=1))
            kv = kv_refer(ctx1)
            k_ref, v_ref = kv[..., :tC], kv[..., tC:]
            attn = jnp.einsum("bnc,bmc->bnm", q_seg, k_ref,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(v_ref.dtype)
            fused = attn @ v_ref
            fused = fuse_proj(fused)
            fused = fused_depth_proj(norm_fuse(fused))
            streams.append(fused)

        out = nn.Dense(tC, kernel_init=TRUNC02, name="mutil_depth_fuse")(
            jnp.concatenate(streams, axis=-1))
        return out.reshape(B, H, W, tC)


# ---------------------------------------------------------------------------
# TokenFuse — older single-scale variant (commented out in the reference)
# ---------------------------------------------------------------------------

class TokenFuse(nn.Module):
    """Seg-queried attention over depth tokens sampled at reference points,
    residual into the depth token map (reference: geometry_utils.py:183-244;
    superseded by PointGuidedTokenFuse at :634)."""
    token_dim: int

    @nn.compact
    def __call__(self, seg_token: jnp.ndarray, depth_token: jnp.ndarray,
                 refer_coords: jnp.ndarray, token_pos: Optional[jnp.ndarray],
                 with_pos: bool = True) -> jnp.ndarray:
        """seg/depth_token, token_pos: (B, H, W, tC);
        refer_coords: (B, L, P, 2). Returns (B, H, W, tC)."""
        tC = self.token_dim
        B, H, W, _ = depth_token.shape
        shortcut = depth_token
        dproj = Mlp(tC, tC, name="depth_proj")(_flatten_hw(depth_token))
        refer_depth = _sample_points(dproj.reshape(B, H, W, tC), refer_coords,
                                     token_pos if with_pos else None)
        # two-layer Mlps matching the reference (geometry_utils.py:191-193)
        kv = Mlp(tC, 2 * tC, name="kv_refer_depth")(refer_depth)
        k, v = kv[..., :tC], kv[..., tC:]

        seg_rel = Mlp(tC, tC, name="seg_proj")(_flatten_hw(seg_token))
        q = nn.LayerNorm(epsilon=1e-5, name="norm_geometry")(
            Mlp(tC, tC, name="q_seg_geometry")(seg_rel))
        attn = jnp.einsum("bnc,bmc->bnm", q, k,
                          preferred_element_type=jnp.float32) * (tC ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        fused = attn @ v
        fused = nn.LayerNorm(epsilon=1e-5, name="norm_fuse")(fused)
        fused = nn.Dense(tC, kernel_init=TRUNC02,
                         name="fused_depth_proj")(fused)
        return fused.reshape(B, H, W, tC) + shortcut


# ---------------------------------------------------------------------------
# ConvGRU / PyramidConv / NonLocalPlannarGuidance
# ---------------------------------------------------------------------------

class ConvGRU(nn.Module):
    """3x3-conv GRU cell (reference: geometry_utils.py:330-345). NHWC."""
    hidden_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        hx = jnp.concatenate([h, x], axis=-1)
        conv = lambda name: nn.Conv(self.hidden_dim, (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    kernel_init=XAVIER, name=name)
        z = nn.sigmoid(conv("convz")(hx))
        r = nn.sigmoid(conv("convr")(hx))
        q = jnp.tanh(conv("convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class PyramidConv(nn.Module):
    """Avg-pool pyramid -> per-level conv towers -> LN -> concat -> fuse conv
    (reference: geometry_utils.py:100-181). `size` resizes every level
    bilinearly (align_corners=False) before fusion."""
    out: int
    hidden: int
    num_levels: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        B, H, W, _ = x.shape
        # min input so num_levels stride-2 pools fit (reference :142-145)
        msize = 2
        for _ in range(self.num_levels):
            msize = (msize - 1) * 2 + 2
        xp = x
        if H < msize or W < msize:
            xp = jnp.pad(xp, ((0, 0), (0, max(0, msize - H)),
                              (0, max(0, msize - W)), (0, 0)))
        pyramid = [x]
        for _ in range(self.num_levels):
            xp = nn.avg_pool(xp, (2, 2), strides=(2, 2), padding="VALID")
            pyramid.append(xp)

        outs = []
        for i, ix in enumerate(pyramid):
            y = nn.Conv(self.hidden // 2, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=XAVIER,
                        name=f"conv_pre{i}_0")(ix)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=XAVIER,
                        name=f"conv_pre{i}_1")(y)
            y = nn.gelu(y, approximate=False)
            if size is not None:
                y = resize_bilinear_nhwc(y, size, align_corners=False)
            y = nn.Conv(self.hidden // 2, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=XAVIER,
                        name=f"conv_scales{i}_0")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=XAVIER,
                        name=f"conv_scales{i}_1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm_scales{i}")(y)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=XAVIER, name="conv3")(y)
        return nn.gelu(y, approximate=False)


class NonLocalPlannarGuidance(nn.Module):
    """Depth refinement by global correlation against reference-point
    features, integrated through a ConvGRU
    (reference: geometry_utils.py:246-328; the `class_pred` gate that would
    build it crashes in the reference — see module docstring)."""
    backbone_dim: int
    token_dim: int
    num_points: int
    num_levels: int = 2

    @nn.compact
    def __call__(self, backbone_x: jnp.ndarray, seg_token: jnp.ndarray,
                 depth_token: jnp.ndarray, refer_coords: jnp.ndarray,
                 token_pos: Optional[jnp.ndarray],
                 depth_pred: jnp.ndarray, with_pos: bool = True
                 ) -> Tuple[jnp.ndarray, None]:
        """backbone_x: (B, H, W, Cb); depth_token/token_pos: (B, H, W, tC);
        refer_coords: (B, L, P, 2) with L*P == num_points;
        depth_pred: (B, h, w, 1) coarser normalized depth.
        Returns ((B, H, W, 1) sigmoid depth, None)."""
        tC = self.token_dim
        B, H, W, _ = depth_token.shape
        fused = jnp.concatenate([_flatten_hw(backbone_x),
                                 _flatten_hw(depth_token)], axis=-1)
        df = nn.Dense(tC * 2, kernel_init=TRUNC02, name="depth_fuse_fc1")(fused)
        df = nn.gelu(df, approximate=False)
        df = nn.Dense(tC, kernel_init=TRUNC02, name="depth_fuse_fc2")(df)
        depth_feats = nn.gelu(df, approximate=False)       # (B, HW, tC)

        dp = PyramidConv(1, 32, self.num_levels,
                         name="pre_depth_upsample")(depth_pred, size=(H, W))

        kv = nn.gelu(nn.Dense(2 * tC, kernel_init=TRUNC02,
                              name="class_kv")(depth_feats),
                     approximate=False)
        class_k, class_v = kv[..., :tC], kv[..., tC:]

        class_pnt = _sample_points(class_k.reshape(B, H, W, tC), refer_coords,
                                   token_pos if with_pos else None)
        class_pnt = class_pnt * (tC ** -0.5)               # (B, nP, tC)
        corr = jnp.einsum("bnc,bpc->bnp", class_v, class_pnt,
                          preferred_element_type=jnp.float32
                          ).astype(class_v.dtype)          # (B, HW, nP)
        corr = corr.reshape(B, H, W, -1)

        c1 = jnp.concatenate([corr, dp], axis=-1)          # (B,H,W,nP+1)
        c2 = depth_feats.reshape(B, H, W, tC)
        h = ConvGRU(tC, name="gru")(c2, c1)
        new_depth = nn.Dense(1, kernel_init=TRUNC02, name="new_depth")(h)
        return nn.sigmoid(new_depth), None


# ---------------------------------------------------------------------------
# ReflectionReduce — reflection-hint feature pyramid
# ---------------------------------------------------------------------------

class ReflectionReduce(nn.Module):
    """Conv pyramid turning a reflection-hint RGB map into 1/16, 1/8, 1/4
    feature maps (reference: geometry_utils.py:347-401). The reference's
    sp_red1 uses upconv(ratio=0) which cannot run — treated as no resize."""

    @nn.compact
    def __call__(self, reflc: jnp.ndarray,
                 layers_size: Sequence[Tuple[int, int]]):
        """reflc: (B, H, W, 3); layers_size: [(h16,w16), (h8,w8), (h4,w4)].
        Returns [feat16 (256ch), feat8 (128ch), feat4 (64ch)]."""
        size16, size8, size4 = layers_size
        ch = (32, 64, 128, 256)

        def stage(x, mid, out, size, idx):
            x = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=XAVIER, name=f"sp_red{idx}_conv")(x)
            x = nn.elu(x)
            if size is not None:
                x = resize_nearest_nhwc(x, size)
            x = nn.Conv(out, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=XAVIER,
                        name=f"sp_red{idx}_up")(x)
            return nn.elu(x)

        ht1 = stage(reflc, 16, ch[0], None, 1)
        ht2 = stage(ht1, 64, ch[1], size4, 2)
        ht3 = stage(ht2, 256, ch[2], size8, 3)
        ht4 = stage(ht3, 256, ch[3], size16, 4)
        return [ht4, ht3, ht2]


# ---------------------------------------------------------------------------
# Global2PointGraph / PointTokenAttention — with_line_depth machinery
# ---------------------------------------------------------------------------

class Global2PointGraph(nn.Module):
    """Graph fuse between a coarse token grid and per-point tokens
    (reference: geometry_utils.py:473-533). Inactive (`with_line_depth`)."""
    token_dim: int
    num_point: int
    init_size: int
    upsample_ratio: int

    @nn.compact
    def __call__(self, token_init: jnp.ndarray, point_token: jnp.ndarray,
                 height: int, width: int, is_init: bool = False) -> jnp.ndarray:
        """token_init: (B, sH, sW, dim); point_token: (B, nPnt, dim).
        Returns (B, height*width, dim)."""
        dim = self.token_dim
        B, nPnt = point_token.shape[:2]
        if is_init:
            expd = token_init
        else:
            expd = jnp.repeat(jnp.repeat(token_init, 2, axis=1), 2, axis=2)

        new_size = self.init_size * self.upsample_ratio
        token_raw = resize_nearest_nhwc(expd, (height, width))
        if not is_init:
            expd = resize_nearest_nhwc(expd, (new_size, new_size))
        sH, sW = expd.shape[1:3]

        templ = expd.reshape(B, sH * sW, dim)
        adj = jnp.einsum("bnc,bpc->bnp", templ, point_token,
                         preferred_element_type=jnp.float32
                         ).astype(templ.dtype) * (dim ** -0.5)
        adj = Mlp(4 * self.num_point, self.num_point, name="node_relation")(adj)
        adj = adj.reshape(B, sH, sW, nPnt)
        # row/column graph aggregation (reference :517-521)
        node_w = jnp.einsum("bhpw,bhwc->bhpc", adj.transpose(0, 1, 3, 2),
                            expd) * (sW ** -0.5)            # (B,sH,nPnt,dim)
        node_h = jnp.einsum("bwph,bwhc->bwpc", adj.transpose(0, 2, 3, 1),
                            expd.transpose(0, 2, 1, 3)) * (sH ** -0.5)
        token_n = jnp.concatenate([node_w, node_h], axis=1)  # (B,sH+sW,nP,dim)
        tn = token_n.reshape(B, sH + sW, nPnt * dim).transpose(0, 2, 1)
        fusedv = Mlp(new_size * 2, 1, name="token_node_fuse")(tn)
        token_fused = fusedv.reshape(B, nPnt, dim)

        raw = token_raw.reshape(B, height * width, dim)
        attn = jnp.einsum("bnc,bpc->bnp", raw, point_token,
                          preferred_element_type=jnp.float32
                          ).astype(raw.dtype) * (dim ** -0.5)
        attn = jax.nn.softmax(
            Mlp(4 * self.num_point, self.num_point,
                name="node_attention")(attn).astype(jnp.float32),
            axis=-1).astype(raw.dtype)
        return attn @ token_fused + raw


class PointTokenAttention(nn.Module):
    """Per-point tokens attend over (global features ++ point tokens)
    (reference: multiscale_transformerr.py:334-374). Inactive
    (`with_line_depth` + `with_point_token`)."""
    dim: int
    num_heads: int
    token_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, point_token: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, dim); point_token: (B, nPnt, tC)."""
        tC = self.token_dim
        nH = self.num_heads
        B, H, W, _ = x.shape
        nPnt = point_token.shape[1]
        x_g = nn.Dense(tC, kernel_init=TRUNC02,
                       name="global_proj")(x.reshape(B, H * W, -1))
        q = nn.Dense(tC, kernel_init=TRUNC02, name="cls_pnt_q")(point_token)
        q = q.reshape(B, nPnt, nH, tC // nH).transpose(0, 2, 1, 3)

        t_x = nn.Dense(tC, kernel_init=TRUNC02, name="global_token_proj")(
            jnp.concatenate([x_g, point_token], axis=1))
        N = H * W + nPnt
        k = nn.Dense(tC, kernel_init=TRUNC02, name="global_k")(t_x)
        v = nn.Dense(tC, kernel_init=TRUNC02, name="global_v")(t_x)
        k = k.reshape(B, N, nH, tC // nH).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, nH, tC // nH).transpose(0, 2, 1, 3)

        # reference scales by class_token_dim**-0.5, not head_dim**-0.5 (:338)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (tC ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, nPnt, tC)
        return nn.Dense(tC, kernel_init=TRUNC02, name="proj_token")(out)


# ---------------------------------------------------------------------------
# distance_map / sample_by_centers — pure functions
# ---------------------------------------------------------------------------

def distance_map(height: int, width: int) -> jnp.ndarray:
    """(H*W, H*W) pairwise distances of the normalized [-1,1] pixel grid,
    divided by 4 (reference: geometry_utils.py:403-418)."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    gx = (xs / (width - 1)) * 2.0 - 1.0
    gy = (ys / (height - 1)) * 2.0 - 1.0
    g = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    d = jnp.sqrt(jnp.sum((g[None, :, :] - g[:, None, :]) ** 2, axis=-1))
    return d / 4.0


def _kmeans(points: jnp.ndarray, num_clusters: int,
            iters: int = 20) -> jnp.ndarray:
    """Jittable fixed-iteration Lloyd k-means labels for (N, 2) points.
    Deterministic init: evenly strided points in x-sorted order (the
    reference uses sklearn KMeans(random_state=0) on host,
    geometry_utils.py:428 — behavioral equivalent, not bit-identical)."""
    N = points.shape[0]
    order = jnp.argsort(points[:, 0])
    init_idx = order[jnp.linspace(0, N - 1, num_clusters).astype(jnp.int32)]
    centers = points[init_idx]

    def step(centers, _):
        d = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=points.dtype)
        counts = onehot.sum(0)                               # (K,)
        sums = onehot.T @ points                             # (K, 2)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1)


def sample_by_centers(center_coords: jnp.ndarray, line_coords: jnp.ndarray,
                      line_logits: jnp.ndarray, input_h: int, input_w: int,
                      shortest_ratio: float = 0.05, num_clusters: int = 16,
                      top_num: int = 6, sample_line_num: int = 50
                      ) -> jnp.ndarray:
    """Cluster line centers, keep the top-`top_num` lines per cluster (by
    class-0 logit) that are long enough, fill the remainder with global
    top-logit lines (reference: geometry_utils.py:420-471). Inactive in the
    shipped config; re-derived statically: per-line priority = in-cluster
    rank, masked by the length filter, padded by global logit rank — a fixed
    `sample_line_num`-size selection instead of host-side list building.

    Reference quirk kept: the length filter scales the x-coords by BOTH
    width and height (geometry_utils.py:442-443), so "length" is the
    x-extent scaled by sqrt(w^2 + h^2).

    center_coords: (B, Q, 2); line_coords: (B, Q, 4); line_logits: (B, Q, 2)
    (all normalized [0,1]). Returns (B, sample_line_num, 4)."""
    B, Q = center_coords.shape[:2]

    def per_image(centers, lines, logits):
        labels = _kmeans(centers, num_clusters)              # (Q,)
        score = logits[:, 0]
        # in-cluster rank by score (0 = best within its cluster)
        order = jnp.argsort(-score)
        ranked_labels = labels[order]
        onehot = jax.nn.one_hot(ranked_labels, num_clusters)  # (Q, K)
        within = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot
        rank_in_cluster = jnp.zeros(Q).at[order].set(within.sum(-1))
        # reference length quirk: both axes from x-coords
        xd = (lines[:, 0] - lines[:, 2])
        length = jnp.sqrt((xd * input_w) ** 2 + (xd * input_h) ** 2)
        long_enough = length > min(input_h, input_w) * shortest_ratio
        selected = (rank_in_cluster < top_num) & long_enough
        # priority: cluster-selected first (by score), then global by score
        prio = jnp.where(selected, score + 1e3, score)
        _, idx = jax.lax.top_k(prio, sample_line_num)
        return lines[idx]

    return jax.vmap(per_image)(center_coords, line_coords, line_logits)
