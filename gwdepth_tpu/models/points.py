"""Uncertainty-driven point sampling and point-based depth prediction.

Static-shape re-derivation of the reference's point machinery
(reference: src/models/points/points_sample.py):

- `certain_sample` — replaces the host-side per-interval python loops
  (points_sample.py:291-364) with a fully-jittable masked construction that
  reproduces the reference's *behavior* exactly, including its quirks:
  the per-interval top-k runs over the GLOBAL variance map (only the quota
  comes from the interval population, points_sample.py:319), indices are
  sorted ascending after top-k (:320), and the pad-to-fixed-size policy
  tiles then repeats the tail (:341-355).
- `PyramidLayer` — mini ResNet + 4-scale avg-pool SPP over the per-point
  attention planes (points_sample.py:45-125). The reference constructs a
  `layer4` that its forward never calls (:58 vs :106-123) — not built here.
- `PointBasedPred` — depth = sum over sampled points of
  softmax(pyramid(global x refer)) * anchor depth (points_sample.py:235-280),
  with the reference's `dim**-2` attention scale (:273).

- `OffsetGeneration` (ConvexHull point doubling, points_sample.py:133-233)
  is inactive in the shipped config (`pre_point_double` forced False at the
  only call sites, multiscale_transformerr.py:1057 commented /:906-909) but
  rebuilt as library code; the hull-area argmax runs through a host
  `pure_callback` under stop_gradient, exactly where the reference detaches
  to CPU scipy (:221-228).
- `sample_along_seg` / `sample_mid_seg` — extra points along each line
  segment (points_sample.py:368-424), static-shape.
Layout NHWC.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gwdepth_tpu.ops.grid_sample import grid_sample_nhwc
from gwdepth_tpu.ops.interpolate import (avg_pool_matmul_nhwc,
                                         resize_bilinear,
                                         resize_bilinear_matmul_nhwc,
                                         resize_bilinear_nhwc)
from gwdepth_tpu.models.swin import TRUNC02, XAVIER


# XLA tap-dot conv formulation for the non-fused ConvLn path (GW_TAPDOT=0
# reverts to lax.conv for A/B).  Read once at import (ADVICE r4): jit
# retrace caches key on the traced graph, so a mid-process flip would only
# apply to not-yet-traced modules and silently mix A/B measurements.
import os as _os
TAPDOT_DEFAULT = _os.environ.get("GW_TAPDOT", "1") == "1"


def _use_tapdots() -> bool:
    return TAPDOT_DEFAULT


# ---------------------------------------------------------------------------
# certain sample
# ---------------------------------------------------------------------------

def _topk_flat(v: jnp.ndarray, S: int) -> jnp.ndarray:
    """Exact top-S indices of a flat array, hierarchical: per-row top-S over
    a (rows, 1024) reshape, then top-S over the row candidates. Equivalent
    to `lax.top_k(v, S)[1]` including tie order (candidates stay in
    row-major = flat-index order, and top_k is stable), but ~5x faster on
    TPU for 50k-element maps since it sorts 1024-wide rows in parallel
    instead of one 50k-element sequence."""
    total = v.shape[0]
    cols = 1024
    if total <= cols or S >= cols:
        return jax.lax.top_k(v, S)[1]
    rows = -(-total // cols)
    vp = jnp.pad(v, (0, rows * cols - total), constant_values=-jnp.inf)
    vals, idx = jax.lax.top_k(vp.reshape(rows, cols), S)      # (rows, S)
    flat_idx = idx + jnp.arange(rows, dtype=idx.dtype)[:, None] * cols
    _, sel = jax.lax.top_k(vals.reshape(-1), S)
    return flat_idx.reshape(-1)[sel]


def certain_sample(pred_small: jnp.ndarray, pred_large: jnp.ndarray,
                   intervals: Sequence[float], sample_num: int,
                   min_depth_norm: float) -> jnp.ndarray:
    """Sample `sample_num` high-uncertainty points, stratified by the depth
    intervals of the finer prediction.

    Args:
      pred_small: (B, h, w) coarser normalized depth.
      pred_large: (B, H, W) finer normalized depth.
      intervals: interior interval bounds, e.g. (0.1, 0.3, 0.5, 0.7, 0.9).
      sample_num: fixed number of output points S.
      min_depth_norm: min_depth_eval / max_depth_eval (points_sample.py:286).
    Returns:
      (B, S, 1, 2) coords in [-1, 1], grid_sample convention (x, y).
    """
    B, H, W = pred_large.shape
    S = sample_num
    up = resize_bilinear(pred_small, (H, W), align_corners=True)
    variance = (up - pred_large) ** 2
    bounds = jnp.asarray([min_depth_norm] + list(intervals) + [1.0],
                         jnp.float32)
    K = bounds.shape[0] - 1
    total = H * W

    def one(pred, var):
        p = pred.reshape(-1)
        v = var.reshape(-1)
        counts = jnp.stack([
            jnp.sum((p >= bounds[i]) & (p < bounds[i + 1])) for i in range(K)
        ]).astype(jnp.float32)
        quotas = jnp.minimum(jnp.floor(counts / total * S),
                             counts).astype(jnp.int32)          # (K,)
        topi = _topk_flat(v, S)                                  # desc by var
        r = jnp.arange(S, dtype=jnp.int32)

        # segment content: the quota-largest-variance pixels, index-ascending
        def seg(q):
            masked = jnp.where(r < q, topi, jnp.int32(total))
            return jnp.sort(masked)
        mat = jax.vmap(seg)(quotas)                              # (K, S)

        csum = jnp.cumsum(quotas)
        starts = csum - quotas
        already = csum[-1]
        pidx = jnp.arange(S, dtype=jnp.int32)
        seg_id = jnp.searchsorted(csum, pidx, side="right").astype(jnp.int32)
        seg_id = jnp.clip(seg_id, 0, K - 1)
        base = mat[seg_id, pidx - starts[seg_id]]                # p < already

        # fixed-size fill: tile whole sequence, then repeat the tail
        # (points_sample.py:341-350)
        A = jnp.maximum(already, 1)
        copy_times = jnp.where(S - A >= A, (S - A) // A + 1, 1)
        T = A * copy_times
        remain2 = S - T
        tp = jnp.where(pidx < T, pidx, (T - remain2) + (pidx - T))
        filled = base[jnp.clip(tp, 0, S - 1) % A]

        # no interval produced a quota: global top-S, index-ascending
        fallback = jnp.sort(topi)
        return jnp.where(already > 0, filled, fallback)

    flat = jax.vmap(one)(pred_large, variance)                   # (B, S)
    col = (flat % W).astype(jnp.float32)
    row = (flat // W).astype(jnp.float32)
    x = (col / W) * 2.0 - 1.0
    y = (row / H) * 2.0 - 1.0
    return jnp.stack([x, y], axis=-1)[:, :, None, :]             # (B, S, 1, 2)


# ---------------------------------------------------------------------------
# pyramid layer
# ---------------------------------------------------------------------------

class _ConvKernel(nn.Module):
    """Param holder matching `nn.Conv(use_bias=False)`'s `<name>/kernel`."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", XAVIER, self.shape)


class _LnParams(nn.Module):
    """Param holder matching `nn.LayerNorm`'s `<name>/{scale,bias}`."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.dim,)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.dim,)))


class ConvLn(nn.Module):
    """3x3 (or kxk) conv without bias + channels-last LayerNorm
    (reference: points_sample.py:12-25).

    `fuse` folds the following activation (and optional residual add) into
    one Pallas TPU kernel (`ops/fused_conv.py`) — same params, bf16 taps /
    f32 accumulation, XLA-reference VJP. Only valid for the plain
    3x3/stride-1/dilation-1 case."""
    out: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    fuse: bool = False
    fuse_act: str | None = None

    @nn.compact
    def __call__(self, x, residual=None, frame_hw=None):
        if self.fuse and frame_hw is not None:
            # frame-chained link: x (and residual / the result) are
            # `nhwc_to_frame` frames — consecutive fused convs skip the
            # NHWC<->frame transposes (ops/fused_conv.py docstring)
            assert (self.kernel, self.stride, self.dilation) == (3, 1, 1)
            from gwdepth_tpu.ops.fused_conv import fused_conv_ln_act_frame
            w = _ConvKernel((3, 3, x.shape[1], self.out), name="conv")()
            g, b = _LnParams(self.out, name="ln")()
            y = fused_conv_ln_act_frame(x, w, g, b, self.fuse_act,
                                        tuple(frame_hw))
            return y + residual if residual is not None else y
        if self.fuse:
            assert (self.kernel, self.stride, self.dilation) == (3, 1, 1)
            from gwdepth_tpu.ops.fused_conv import fused_conv_ln_act
            w = _ConvKernel((3, 3, x.shape[-1], self.out), name="conv")()
            g, b = _LnParams(self.out, name="ln")()
            y = fused_conv_ln_act(x, w, g, b, self.fuse_act)
            return y + residual if residual is not None else y
        if (self.kernel, self.stride, self.dilation) == (3, 1, 1) and \
                _use_tapdots():
            # XLA tap-dot formulation: same param tree as nn.Conv, no
            # conv-blocking relayouts in fwd or wgrad (the r4 train HLO
            # carried 8.9 GB/step of copies around the native conv
            # lowering — see ops/fused_conv.py:conv3x3_tapdots)
            from gwdepth_tpu.ops.fused_conv import conv3x3_tapdots
            w = _ConvKernel((3, 3, x.shape[-1], self.out), name="conv")()
            x = conv3x3_tapdots(x, w)
        else:
            pad = self.dilation if self.dilation > 1 else self.kernel // 2
            x = nn.Conv(self.out, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, kernel_init=XAVIER, name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        if self.fuse_act == "gelu":
            x = nn.gelu(x, approximate=False)
        return x + residual if residual is not None else x


class BasicBlock(nn.Module):
    """ConvLn+GELU -> ConvLn, residual (reference: points_sample.py:27-43)."""
    planes: int
    dilation: int = 1
    fuse: bool = False

    @nn.compact
    def __call__(self, x, frame_hw=None):
        out = ConvLn(self.planes, dilation=self.dilation, fuse=self.fuse,
                     fuse_act="gelu", name="conv1")(x, frame_hw=frame_hw)
        return ConvLn(self.planes, dilation=self.dilation, fuse=self.fuse,
                      name="conv2")(out, residual=x, frame_hw=frame_hw)


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return nn.avg_pool(x, (k, k), strides=(k, k))


class PyramidLayer(nn.Module):
    """Mini ResNet + SPP over per-point planes
    (reference: points_sample.py:45-125). in/out channels = point count."""
    in_dim: int
    pool_sizes: Tuple[int, ...]
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, P) -> (B, H, W, P)."""
        B, H, W, P = x.shape
        d2 = self.in_dim * 2
        # fuse conv+LN+GELU into one Pallas kernel only on the full-size
        # planes; the pooled SPP branches are too small to pay off
        fuse = self.use_pallas
        if fuse:
            # FRAME-CHAINED trunk: one NHWC->frame transpose in, one out;
            # the 12 fused conv links in between exchange frames directly
            # (saved ~0.15-0.2 ms/link of relayout, r5 device profile)
            from gwdepth_tpu.ops.fused_conv import (frame_to_nhwc,
                                                    nhwc_to_frame)
            hw = (H, W)
            xf = nhwc_to_frame(x)
            xf = ConvLn(self.in_dim, fuse=True, fuse_act="gelu",
                        name="first0")(xf, frame_hw=hw)
            xf = ConvLn(d2, fuse=True, fuse_act="gelu",
                        name="first1")(xf, frame_hw=hw)
            xf = BasicBlock(d2, fuse=True, name="layer1_0")(xf, frame_hw=hw)
            xf = BasicBlock(d2, fuse=True, name="layer2_0")(xf, frame_hw=hw)
            xf = BasicBlock(d2, fuse=True, name="layer2_1")(xf, frame_hw=hw)
            xf = BasicBlock(d2, fuse=True, name="layer3_0")(xf, frame_hw=hw)
            xf = BasicBlock(d2, fuse=True, name="layer3_1")(xf, frame_hw=hw)
            x = frame_to_nhwc(xf, hw)
        else:
            x = ConvLn(self.in_dim, fuse=False, fuse_act="gelu",
                       name="first0")(x)
            x = ConvLn(d2, fuse=False, fuse_act="gelu", name="first1")(x)
            x = BasicBlock(d2, fuse=False, name="layer1_0")(x)
            x = BasicBlock(d2, fuse=False, name="layer2_0")(x)
            x = BasicBlock(d2, fuse=False, name="layer2_1")(x)
            x = BasicBlock(d2, fuse=False, name="layer3_0")(x)
            x = BasicBlock(d2, fuse=False, name="layer3_1")(x)
        # (reference builds a dilated layer4 it never calls — omitted)

        # pad so the largest pool fits (points_sample.py:94-104)
        k0 = self.pool_sizes[0]
        Hp = max(H, k0)
        Wp = max(W, k0)
        if Hp != H or Wp != W:
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        branches = [x]
        for i, k in enumerate(self.pool_sizes):
            # pool and upsample as separable matmuls: same numbers, one
            # MXU pass each instead of reduce_window + gather relayouts
            b = avg_pool_matmul_nhwc(x, k)
            b = nn.gelu(ConvLn(d2, name=f"branch{i + 1}")(b),
                        approximate=False)
            b = resize_bilinear_matmul_nhwc(b, (Hp, Wp), align_corners=True)
            branches.append(b)
        xx = jnp.concatenate(branches, axis=-1)
        # last0 (5*d2 -> 2*d2) goes to XLA when the concat is wide: at the
        # 1/4 site (800 ch) the MXU is already well fed with K=800 and the
        # Pallas chunk-slab materialization of the input cost ~1.1 ms of
        # pure relayout at eval size (r3 device profile: pad_bitcast_fusion
        # + copy + reshape on bf16[1,896,194,258]); at the narrower 1/8
        # site (300 ch) the fused kernel measured faster — keep it there.
        fuse_last0 = fuse and xx.shape[-1] <= 400
        x = ConvLn(d2 * 2, fuse=fuse_last0, fuse_act="gelu",
                   name="last0")(xx)
        x = nn.Conv(self.in_dim, (1, 1), use_bias=False, kernel_init=XAVIER,
                    name="last1")(x)
        return x[:, :H, :W]


# ---------------------------------------------------------------------------
# point based prediction
# ---------------------------------------------------------------------------

class PointBasedPred(nn.Module):
    """Depth from sampled anchor points (reference: points_sample.py:235-280).

    Global features attend to per-point reference features; the (H, W, P)
    attention volume is refined by `PyramidLayer`, softmaxed over points,
    and used to mix the anchor depths sampled at those points."""
    dim: int
    token_dim: int
    pool_sizes: Tuple[int, ...]
    point_num: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, depth_token: jnp.ndarray,
                 pre_depth: jnp.ndarray, coords: jnp.ndarray,
                 pos_embedding: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C); depth_token: (B, H, W, tC);
        pre_depth: (B, H, W) normalized depth; coords: (B, S, 1, 2);
        pos_embedding: (B, H, W, C). Returns (B, H, W) depth."""
        B, H, W, C = x.shape
        x_global = nn.Dense(self.dim, kernel_init=TRUNC02, name="pre_proj")(
            jnp.concatenate([x, depth_token], axis=-1))
        x_refer = nn.Dense(2 * self.dim, kernel_init=TRUNC02,
                           name="refer_proj")(x_global)
        xg, xr = jnp.split(x_refer, 2, axis=-1)

        refer_x = grid_sample_nhwc(xr, coords)                 # (B, S, 1, C)
        refer_x = refer_x + grid_sample_nhwc(pos_embedding, coords)
        refer = refer_x[:, :, 0, :]                            # (B, S, C)
        anchor = grid_sample_nhwc(pre_depth[..., None], coords)[:, :, 0, 0]

        rg = jnp.einsum("bhwc,bsc->bhws", xg, refer,
                        preferred_element_type=jnp.float32)
        rg = (rg * (self.dim ** -2)).astype(x.dtype)           # ref :273
        rg = PyramidLayer(self.point_num, self.pool_sizes,
                          use_pallas=self.use_pallas, name="pyramid")(rg)
        attn = jax.nn.softmax(rg.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhws,bs->bhw", attn,
                          anchor.astype(jnp.float32))


# ---------------------------------------------------------------------------
# offset generation (inactive in the shipped config; library parity)
# ---------------------------------------------------------------------------

def _hull_areas_host(pts: "np.ndarray") -> "np.ndarray":
    """(..., n, 2) -> (...) convex-hull areas via scipy on host (the
    reference also detaches to CPU scipy, points_sample.py:221-228)."""
    import numpy as np
    from scipy.spatial import QhullError, ConvexHull

    flat = pts.reshape(-1, *pts.shape[-2:])
    out = np.zeros(flat.shape[0], np.float32)
    for i, p in enumerate(flat):
        try:
            out[i] = ConvexHull(p).volume  # 2-D: volume == area
        except QhullError:
            out[i] = 0.0                   # degenerate/collinear set
    return out.reshape(pts.shape[:-2])


class OffsetGeneration(nn.Module):
    """Extra reference-point generation: token-channel attention over
    backbone features, dilated conv offsets, hull-area argmax selection
    (reference: points_sample.py:133-233).

    The reference path is bitrotted (its only call site passes one extra
    positional arg, multiscale_transformerr.py:934 vs points_sample.py:187,
    and the hull loop indexes shapes that cannot exist); this rebuild keeps
    the evident intent: every spatial location proposes `num_ref_points/2`
    2-D points, the location whose proposal set spans the largest convex
    hull is chosen, and its points (grouped like the reference lines) are
    appended to the reference coords."""
    x_dim: int
    token_dim: int
    num_ref_points: int
    pool_sizes: Tuple[int, ...] = (32, 16, 8, 4)

    @nn.compact
    def __call__(self, x: jnp.ndarray, depth_token: jnp.ndarray,
                 refer_coords: jnp.ndarray,
                 token_pos: jnp.ndarray, with_pos: bool = True) -> jnp.ndarray:
        """x: (B, H, W, x_dim); depth_token: (B, H, W, tC);
        refer_coords: (B, L, P, 2) in [-1,1]; token_pos: (B, H, W, x_dim).
        Returns (B, L + num_ref_points//(2P), P, 2)."""
        tC = self.token_dim
        B, H, W, _ = x.shape
        P = refer_coords.shape[2]

        # token-based channel attention (points_sample.py:190-192)
        ch = nn.Dense(tC, kernel_init=TRUNC02,
                      name="channel_attention_fc")(depth_token)
        ch = jax.nn.softmax(nn.gelu(ch, approximate=False), axis=-1)

        xs = nn.LayerNorm(epsilon=1e-5, name="backbone_norm")(x)
        xo = nn.Conv(self.x_dim // 2, (3, 3), padding=((1, 1), (1, 1)),
                     kernel_init=XAVIER, name="backbone_fc0")(xs)
        xo = nn.gelu(xo, approximate=False)
        xo = nn.Conv(tC, (1, 1), kernel_init=XAVIER, name="backbone_fc1")(xo)
        xo = nn.gelu(xo, approximate=False)
        xo = ch * xo + xo

        xo = nn.LayerNorm(epsilon=1e-5, name="global_norm")(xo)
        g = nn.Conv(tC // 2, (1, 1), kernel_init=XAVIER, name="goff0")(xo)
        g = nn.gelu(g, approximate=False)
        g = nn.Conv(tC // 2, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=XAVIER, name="goff1")(g)
        g = nn.Conv(tC // 2, (3, 3), padding=((6, 6), (6, 6)),
                    kernel_dilation=(6, 6), kernel_init=XAVIER,
                    name="goff2")(g)
        g = nn.Conv(tC // 2, (3, 3), padding=((16, 16), (16, 16)),
                    kernel_dilation=(16, 16), kernel_init=XAVIER,
                    name="goff3")(g)
        g = nn.Conv(tC // 2, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=XAVIER, name="goff4")(g)
        g = nn.Conv(tC // 4, (1, 1), kernel_init=XAVIER, name="goff5")(g)
        g = nn.gelu(g, approximate=False)
        g = nn.Conv(tC // 4, (1, 1), kernel_init=XAVIER, name="goff6")(g)

        # bilinear sampling at the current reference points (:206-211)
        refer_x = grid_sample_nhwc(xs, refer_coords)
        if with_pos:
            refer_x = refer_x + grid_sample_nhwc(token_pos, refer_coords)
        refer_x = refer_x.reshape(B, -1, self.x_dim)
        refer_x = nn.Dense(tC // 4, kernel_init=TRUNC02,
                           name="refer_proj")(refer_x)      # (B, L*P, tC/4)

        ref_g = jnp.einsum("bnc,bhwc->bnhw", refer_x, g,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)                # (B, L*P, H, W)
        ref_g = jnp.moveaxis(ref_g, 1, 3)                   # NHWC planes
        ref_g = PyramidLayer(self.num_ref_points, self.pool_sizes,
                             name="pyramid")(ref_g)
        coords = nn.sigmoid(ref_g.reshape(B, H * W, -1))    # (B, HW, nRP)
        pts = coords.reshape(B, H * W, self.num_ref_points // 2, 2)

        areas = jax.pure_callback(
            _hull_areas_host,
            jax.ShapeDtypeStruct((B, H * W), jnp.float32),
            jax.lax.stop_gradient(pts), vmap_method="sequential")
        best = jnp.argmax(areas, axis=-1)                   # (B,)
        chosen = jnp.take_along_axis(
            coords, best[:, None, None], axis=1)[:, 0]      # (B, nRP)
        chosen = chosen.reshape(B, -1, P, 2) * 2.0 - 1.0
        return jnp.concatenate([refer_coords, chosen], axis=1)


# ---------------------------------------------------------------------------
# extra points along line segments (points_sample.py:368-424)
# ---------------------------------------------------------------------------

def sample_along_seg(lines: jnp.ndarray, height: int, width: int,
                     sample_num_seg: int = 10) -> jnp.ndarray:
    """Append `sample_num_seg` evenly spaced points along each segment
    (reference: points_sample.py:368-415). lines: (B, L, 2, 2) in [-1, 1].
    Returns (B, L, 2 + sample_num_seg, 2) in [-1, 1]. The reference's
    y-step sign trick (:391-400) is kept: steps always start from the
    leftmost endpoint and walk toward the other, y moving by |dy|/n with the
    sign of (y_end - y_start)."""
    px = (lines + 1.0) / 2.0
    px = px * jnp.array([width, height], dtype=px.dtype)

    st_id = jnp.argmin(px[..., 0], axis=2)                  # (B, L)
    end_id = jnp.argmax(px[..., 0], axis=2)
    st = jnp.take_along_axis(px, st_id[..., None, None]
                             .repeat(2, -1), axis=2)[:, :, 0]
    end = jnp.take_along_axis(px, end_id[..., None, None]
                              .repeat(2, -1), axis=2)[:, :, 0]

    dist = jnp.sqrt(jnp.sum((st - end) ** 2, axis=-1))
    safe = jnp.maximum(dist, 1e-12)
    cosv = jnp.abs(st[..., 0] - end[..., 0]) / safe
    sinv = jnp.abs(st[..., 1] - end[..., 1]) / safe
    seg = dist / sample_num_seg
    row_oper = jnp.where(st[..., 1] < end[..., 1], 1.0, -1.0)

    steps = jnp.arange(1, sample_num_seg + 1, dtype=px.dtype)
    p_x = st[..., 0, None] + (seg * cosv)[..., None] * steps
    p_y = st[..., 1, None] + (seg * sinv * row_oper)[..., None] * steps
    new_pts = jnp.stack([p_x, p_y], axis=-1)                # (B, L, n, 2)

    allp = jnp.concatenate([px, new_pts], axis=2)
    allp = allp / jnp.array([width, height], dtype=px.dtype)
    return allp * 2.0 - 1.0


def sample_mid_seg(lines: jnp.ndarray) -> jnp.ndarray:
    """Append each segment's midpoint (reference: points_sample.py:418-424).
    lines: (B, L, 2, 2) -> (B, L, 3, 2)."""
    mid = (lines[:, :, 0] + lines[:, :, 1]) / 2.0
    return jnp.concatenate([lines, mid[:, :, None]], axis=2)
