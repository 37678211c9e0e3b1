"""Torch-oracle parity + behavior tests for the geometry fusion library
(reference: src/models/geometry_utils.py, multiscale_transformerr.py:334-374,
points_sample.py:133-233,368-424). These modules are behind gates the
shipped reference config keeps off; they are rebuilt as library components
and `PointGuidedTokenFuse` is wired behind `class_tokenfuse_layers`."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from gwdepth_tpu.models.geometry import (
    ConvGRU, PyramidConv, TokenFuse, PointGuidedTokenFuse,
    PointTokenAttention, Global2PointGraph, NonLocalPlannarGuidance,
    ReflectionReduce, distance_map, sample_by_centers)
from gwdepth_tpu.models.points import (
    OffsetGeneration, sample_along_seg, sample_mid_seg)

RNG = np.random.default_rng(7)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))


def lin(x, p):
    return x @ t(p["kernel"]) + t(p["bias"])


def mlp(x, p):
    return lin(TF.gelu(lin(x, p["fc1"])), p["fc2"])


def ln(x, p):
    return TF.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]))


def conv_nchw(x, p, pad=1, dilation=1, bias=True):
    w = t(p["kernel"]).permute(3, 2, 0, 1)
    b = t(p["bias"]) if bias and "bias" in p else None
    return TF.conv2d(x, w, b, padding=pad, dilation=dilation)


def conva(x, p, pad=1, dilation=1):
    """ConvA = conv + exact GELU (geometry_utils.py:84-98)."""
    return TF.gelu(conv_nchw(x, p, pad=pad, dilation=dilation))


def sample_pts(feat_nchw, coords, pos_nchw):
    """nearest grid-sample + pos (geometry_utils.py:637-641)."""
    s = TF.grid_sample(feat_nchw, t(coords), mode="nearest",
                       align_corners=False)
    if pos_nchw is not None:
        s = s + TF.grid_sample(pos_nchw, t(coords), mode="nearest",
                               align_corners=False)
    return s.flatten(2).permute(0, 2, 1)     # (B, L*P, C)


def P(params):
    return jax.tree.map(np.asarray, params["params"])


# ---------------------------------------------------------------------------
# ConvGRU (geometry_utils.py:330-345)
# ---------------------------------------------------------------------------

def test_conv_gru_matches_torch():
    B, H, W, C, Ci = 2, 7, 9, 8, 5
    m = ConvGRU(C)
    h = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    x = RNG.normal(size=(B, H, W, Ci)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x))
    got = m.apply(params, jnp.asarray(h), jnp.asarray(x))
    p = P(params)
    with torch.no_grad():
        ht = t(h).permute(0, 3, 1, 2)
        xt = t(x).permute(0, 3, 1, 2)
        hx = torch.cat([ht, xt], dim=1)
        z = torch.sigmoid(conv_nchw(hx, p["convz"]))
        r = torch.sigmoid(conv_nchw(hx, p["convr"]))
        q = torch.tanh(conv_nchw(torch.cat([r * ht, xt], 1), p["convq"]))
        want = (1 - z) * ht + z * q
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# PyramidConv (geometry_utils.py:100-181)
# ---------------------------------------------------------------------------

def torch_pyramid_conv(x_nchw, p, num_levels, size):
    H, W = x_nchw.shape[-2:]
    msize = 2
    for _ in range(num_levels):
        msize = (msize - 1) * 2 + 2
    xp = x_nchw
    if H < msize:
        xp = TF.pad(xp, (0, 0, 0, msize - H))
    if W < msize:
        xp = TF.pad(xp, (0, msize - W))
    pyr = [x_nchw]
    for _ in range(num_levels):
        xp = TF.avg_pool2d(xp, 2, stride=2)
        pyr.append(xp)
    outs = []
    for i, ix in enumerate(pyr):
        y = TF.gelu(conv_nchw(ix, p[f"conv_pre{i}_0"], bias=False))
        y = TF.gelu(conv_nchw(y, p[f"conv_pre{i}_1"], bias=False))
        if size is not None:
            y = TF.interpolate(y, size=size, mode="bilinear",
                               align_corners=False)
        y = TF.gelu(conv_nchw(y, p[f"conv_scales{i}_0"], bias=False))
        y = TF.gelu(conv_nchw(y, p[f"conv_scales{i}_1"], bias=False))
        y = ln(y.permute(0, 2, 3, 1), p[f"norm_scales{i}"]) \
            .permute(0, 3, 1, 2)
        outs.append(y)
    y = torch.cat(outs, dim=1)
    return TF.gelu(conv_nchw(y, p["conv3"], bias=False))


@pytest.mark.parametrize("hw", [(6, 7), (12, 16)])
def test_pyramid_conv_matches_torch(hw):
    """Covers both the min-size pad path (6x7 < 8) and the plain path."""
    B, C, O, HID, NL = 1, 3, 4, 8, 2
    H, W = hw
    size = (10, 12)
    m = PyramidConv(O, HID, NL)
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), size)
    got = m.apply(params, jnp.asarray(x), size)
    with torch.no_grad():
        want = torch_pyramid_conv(t(x).permute(0, 3, 1, 2), P(params),
                                  NL, size)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# TokenFuse (geometry_utils.py:183-244)
# ---------------------------------------------------------------------------

def test_token_fuse_matches_torch():
    B, H, W, tC, L, Pp = 1, 8, 10, 8, 4, 3
    m = TokenFuse(tC)
    st = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    dt = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    pos = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    ref = RNG.uniform(-1, 1, size=(B, L, Pp, 2)).astype(np.float32)
    args = (jnp.asarray(st), jnp.asarray(dt), jnp.asarray(ref),
            jnp.asarray(pos))
    params = m.init(jax.random.PRNGKey(0), *args)
    got = m.apply(params, *args)
    p = P(params)
    with torch.no_grad():
        dflat = t(dt).reshape(B, H * W, tC)
        dproj = mlp(dflat, p["depth_proj"])
        dmap = dproj.reshape(B, H, W, tC).permute(0, 3, 1, 2)
        refer = sample_pts(dmap, ref, t(pos).permute(0, 3, 1, 2))
        kv = mlp(refer, p["kv_refer_depth"])
        k, v = kv[..., :tC], kv[..., tC:]
        srel = mlp(t(st).reshape(B, H * W, tC), p["seg_proj"])
        q = ln(mlp(srel, p["q_seg_geometry"]), p["norm_geometry"])
        attn = torch.softmax(q @ k.transpose(1, 2) * tC ** -0.5, dim=-1)
        fused = ln(attn @ v, p["norm_fuse"])
        fused = lin(fused, p["fused_depth_proj"])
        want = fused.reshape(B, H, W, tC) + t(dt)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# PointGuidedTokenFuse (geometry_utils.py:535-652)
# ---------------------------------------------------------------------------

def torch_pgtf(x, st, dt, ref, pos, p, tC, ks_list):
    B, H, W, Cx = x.shape
    xf = t(x).reshape(B, H * W, Cx)
    stf = torch.cat([t(st).reshape(B, H * W, tC), xf], -1)
    dtf = torch.cat([t(dt).reshape(B, H * W, tC), xf], -1)
    stx = mlp(stf, p["xseg_proj"])
    dtx = mlp(dtf, p["xdth_proj"])
    dmap = dtx.reshape(B, H, W, tC).permute(0, 3, 1, 2)
    refer_depth = sample_pts(dmap, ref, t(pos).permute(0, 3, 1, 2))
    q_seg = ln(mlp(stx, p["q_seg"]), p["norm_seg"]) * tC ** -0.5

    def conv_process(y):
        y = conva(y, p["convctx_pre3_0"]["conv"], pad=1)
        y = conva(y, p["convctx_pre3_1"]["conv"], pad=1)
        y = ln(y.permute(0, 2, 3, 1), p["convctx_norm3"]).permute(0, 3, 1, 2)
        y = conva(y, p["convctx_after3"]["conv"], pad=1)
        y = conva(y, p["convctx_pre5_0"]["conv"], pad=2)
        y = conva(y, p["convctx_pre5_1"]["conv"], pad=2)
        y = ln(y.permute(0, 2, 3, 1), p["convctx_norm5"]).permute(0, 3, 1, 2)
        return conva(y, p["convctx_after5"]["conv"], pad=2)

    streams = []
    dt_nchw = t(dt).permute(0, 3, 1, 2)
    for k, s in ks_list:
        min_size = (2 - 1) * s + k
        dpad = dt_nchw
        if H < min_size:
            dpad = TF.pad(dpad, (0, 0, 0, min_size - H))
        if W < min_size:
            dpad = TF.pad(dpad, (0, min_size - W))
        pooled = TF.avg_pool2d(dpad, k, stride=s)
        ctx = conv_process(pooled).flatten(2).permute(0, 2, 1)
        ctx1 = mlp(torch.cat([ctx, refer_depth], dim=1), p["mlpctx"])
        kv = mlp(ctx1, p["kv_refer_depth"])
        kk, vv = kv[..., :tC], kv[..., tC:]
        attn = torch.softmax(q_seg @ kk.transpose(1, 2), dim=-1)
        fused = lin(attn @ vv, p["fuse_proj"])
        fused = lin(ln(fused, p["norm_fuse"]), p["fused_depth_proj"])
        streams.append(fused)
    out = lin(torch.cat(streams, -1), p["mutil_depth_fuse"])
    return out.reshape(B, H, W, tC)


def test_point_guided_token_fuse_matches_torch():
    B, H, W, Cx, tC, L, Pp = 1, 9, 13, 12, 8, 4, 3
    ks = ((3, 2), (5, 3))   # small-scale stand-ins for ((11,5),(17,8))
    m = PointGuidedTokenFuse(Cx, tC, ks)
    x = RNG.normal(size=(B, H, W, Cx)).astype(np.float32)
    st = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    dt = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    pos = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    ref = RNG.uniform(-1, 1, size=(B, L, Pp, 2)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(st), jnp.asarray(dt),
            jnp.asarray(ref), jnp.asarray(pos))
    params = m.init(jax.random.PRNGKey(0), *args)
    got = m.apply(params, *args)
    with torch.no_grad():
        want = torch_pgtf(x, st, dt, ref, pos, P(params), tC, ks)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=3e-4, atol=3e-5)


def test_point_guided_token_fuse_pad_path():
    """H,W below the pooling min-size triggers the pad branch
    (geometry_utils.py:598-606)."""
    B, H, W, Cx, tC = 1, 5, 6, 8, 8
    m = PointGuidedTokenFuse(Cx, tC)   # default ks ((11,5),(17,8)), min 16/25
    x = jnp.asarray(RNG.normal(size=(B, H, W, Cx)), jnp.float32)
    st = jnp.asarray(RNG.normal(size=(B, H, W, tC)), jnp.float32)
    dt = jnp.asarray(RNG.normal(size=(B, H, W, tC)), jnp.float32)
    pos = jnp.asarray(RNG.normal(size=(B, H, W, tC)), jnp.float32)
    ref = jnp.asarray(RNG.uniform(-1, 1, size=(B, 2, 3, 2)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, st, dt, ref, pos)
    out = m.apply(params, x, st, dt, ref, pos)
    assert out.shape == (B, H, W, tC)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# PointTokenAttention (multiscale_transformerr.py:334-374)
# ---------------------------------------------------------------------------

def test_point_token_attention_matches_torch():
    B, H, W, C, tC, nH, nP = 1, 6, 8, 12, 8, 2, 5
    m = PointTokenAttention(C, nH, tC)
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    pt = RNG.normal(size=(B, nP, tC)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pt))
    got = m.apply(params, jnp.asarray(x), jnp.asarray(pt))
    p = P(params)
    with torch.no_grad():
        x_g = lin(t(x).reshape(B, H * W, C), p["global_proj"])
        q = lin(t(pt), p["cls_pnt_q"]) \
            .reshape(B, nP, nH, tC // nH).permute(0, 2, 1, 3)
        t_x = lin(torch.cat([x_g, t(pt)], 1), p["global_token_proj"])
        N = H * W + nP
        k = lin(t_x, p["global_k"]).reshape(B, N, nH, -1).permute(0, 2, 1, 3)
        v = lin(t_x, p["global_v"]).reshape(B, N, nH, -1).permute(0, 2, 1, 3)
        attn = torch.softmax((q * tC ** -0.5) @ k.transpose(-2, -1), -1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, nP, tC)
        want = lin(out, p["proj_token"])
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Global2PointGraph (geometry_utils.py:473-533)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("is_init", [True, False])
def test_global2point_graph_matches_torch(is_init):
    B, dim, nP, s0, up = 1, 8, 5, 4, 2
    H, W = 10, 12
    m = Global2PointGraph(dim, nP, s0, up)
    ti = RNG.normal(size=(B, s0 if is_init else s0, s0, dim)) \
        .astype(np.float32)
    # for is_init the template grid stays s0; the up path doubles then
    # resizes to s0*up (reference :494-507)
    pt = RNG.normal(size=(B, nP, dim)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(ti), jnp.asarray(pt),
                    H, W, is_init)
    got = m.apply(params, jnp.asarray(ti), jnp.asarray(pt), H, W, is_init)
    p = P(params)
    with torch.no_grad():
        tt = t(ti)
        if not is_init:
            tt = tt.repeat_interleave(2, 1).repeat_interleave(2, 2)
        raw = TF.interpolate(tt.permute(0, 3, 1, 2), (H, W), mode="nearest")
        expd = tt
        if not is_init:
            ns = s0 * up
            expd = TF.interpolate(tt.permute(0, 3, 1, 2), (ns, ns),
                                  mode="nearest").permute(0, 2, 3, 1)
        sH, sW = expd.shape[1:3]
        templ = expd.reshape(B, sH * sW, dim)
        adj = templ @ t(pt).transpose(1, 2) * dim ** -0.5
        adj = mlp(adj, p["node_relation"]).reshape(B, sH, sW, nP)
        node_w = adj.permute(0, 1, 3, 2) @ expd * sW ** -0.5
        node_h = adj.permute(0, 2, 3, 1) @ expd.permute(0, 2, 1, 3) \
            * sH ** -0.5
        token_n = torch.cat([node_w, node_h], dim=1)
        tn = token_n.flatten(2).permute(0, 2, 1)
        fused = mlp(tn, p["token_node_fuse"]).reshape(B, nP, dim)
        rawf = raw.permute(0, 2, 3, 1).reshape(B, H * W, dim)
        attn = rawf @ t(pt).transpose(1, 2) * dim ** -0.5
        attn = torch.softmax(mlp(attn, p["node_attention"]), -1)
        want = attn @ fused + rawf
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# NonLocalPlannarGuidance (geometry_utils.py:246-328)
# ---------------------------------------------------------------------------

def test_nonlocal_plannar_guidance_matches_torch():
    B, H, W, Cb, tC, L, Pp = 1, 8, 10, 6, 8, 3, 3
    m = NonLocalPlannarGuidance(Cb, tC, L * Pp)
    x = RNG.normal(size=(B, H, W, Cb)).astype(np.float32)
    st = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    dt = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    pos = RNG.normal(size=(B, H, W, tC)).astype(np.float32)
    ref = RNG.uniform(-1, 1, size=(B, L, Pp, 2)).astype(np.float32)
    dpred = RNG.uniform(size=(B, 4, 5, 1)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(st), jnp.asarray(dt),
            jnp.asarray(ref), jnp.asarray(pos), jnp.asarray(dpred))
    params = m.init(jax.random.PRNGKey(0), *args)
    got, aux = m.apply(params, *args)
    assert aux is None
    p = P(params)
    with torch.no_grad():
        fused = torch.cat([t(x).reshape(B, H * W, Cb),
                           t(dt).reshape(B, H * W, tC)], -1)
        df = TF.gelu(lin(fused, p["depth_fuse_fc1"]))
        depth_feats = TF.gelu(lin(df, p["depth_fuse_fc2"]))
        dp = torch_pyramid_conv(t(dpred).permute(0, 3, 1, 2),
                                p["pre_depth_upsample"], 2, (H, W))
        kv = TF.gelu(lin(depth_feats, p["class_kv"]))
        ck, cv = kv[..., :tC], kv[..., tC:]
        cmap = ck.reshape(B, H, W, tC).permute(0, 3, 1, 2)
        cpnt = sample_pts(cmap, ref, t(pos).permute(0, 3, 1, 2)) \
            * tC ** -0.5
        corr = cv @ cpnt.transpose(1, 2)          # (B, HW, nP)
        corr = corr.reshape(B, H, W, -1).permute(0, 3, 1, 2)
        c1 = torch.cat([corr, dp], dim=1)
        c2 = depth_feats.reshape(B, H, W, tC).permute(0, 3, 1, 2)
        pg = p["gru"]
        hx = torch.cat([c2, c1], 1)
        z = torch.sigmoid(conv_nchw(hx, pg["convz"]))
        r = torch.sigmoid(conv_nchw(hx, pg["convr"]))
        q = torch.tanh(conv_nchw(torch.cat([r * c2, c1], 1), pg["convq"]))
        h = (1 - z) * c2 + z * q
        nd = lin(h.permute(0, 2, 3, 1), p["new_depth"])
        want = torch.sigmoid(nd)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# distance_map (geometry_utils.py:403-418)
# ---------------------------------------------------------------------------

def test_distance_map_matches_torch():
    H, W = 5, 7
    got = distance_map(H, W)
    with torch.no_grad():
        ty, tx = torch.meshgrid(torch.arange(H), torch.arange(W),
                                indexing="ij")
        g = torch.cat((tx.unsqueeze(-1), ty.unsqueeze(-1)), -1).float()
        g[:, :, 0] = g[:, :, 0] / (W - 1) * 2 - 1
        g[:, :, 1] = g[:, :, 1] / (H - 1) * 2 - 1
        g1 = g.reshape(-1, 2).unsqueeze(0)
        g2 = g.reshape(-1, 2).unsqueeze(1)
        want = torch.sqrt(torch.sum((g1 - g2) ** 2, -1)) / 4.0
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# behavior tests: sample_by_centers / OffsetGeneration / seg sampling
# ---------------------------------------------------------------------------

def test_sample_by_centers_prefers_cluster_winners():
    """Top lines per spatial cluster come first; short lines (per the
    reference's x-extent length quirk, geometry_utils.py:442-443) are only
    used as global fill."""
    B, Q = 1, 64
    rng = np.random.default_rng(3)
    centers = rng.uniform(size=(B, Q, 2)).astype(np.float32)
    lines = rng.uniform(size=(B, Q, 4)).astype(np.float32)
    logits = rng.normal(size=(B, Q, 2)).astype(np.float32)
    # make line 0 the global best but ZERO x-extent -> fails length filter
    logits[0, 0, 0] = 100.0
    lines[0, 0] = [0.5, 0.1, 0.5, 0.9]
    out = np.asarray(sample_by_centers(
        jnp.asarray(centers), jnp.asarray(lines), jnp.asarray(logits),
        480, 640, num_clusters=4, top_num=2, sample_line_num=10))
    assert out.shape == (B, 10, 4)
    # line 0 still appears (as global fill) but not before cluster winners:
    # every selected line is one of the input lines
    for sel in out[0]:
        assert (np.abs(lines[0] - sel).sum(-1) < 1e-6).any()


def test_sample_by_centers_deterministic():
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.uniform(size=(2, 40, 2)), jnp.float32)
    l = jnp.asarray(rng.uniform(size=(2, 40, 4)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 40, 2)), jnp.float32)
    a = np.asarray(sample_by_centers(c, l, g, 480, 640, sample_line_num=20))
    b = np.asarray(sample_by_centers(c, l, g, 480, 640, sample_line_num=20))
    np.testing.assert_array_equal(a, b)


def test_offset_generation_appends_largest_hull_set():
    B, H, W, Cx, tC, L, Pp, nRP = 1, 8, 10, 12, 8, 4, 3, 12
    m = OffsetGeneration(Cx, tC, nRP)
    x = jnp.asarray(RNG.normal(size=(B, H, W, Cx)), jnp.float32)
    dt = jnp.asarray(RNG.normal(size=(B, H, W, tC)), jnp.float32)
    pos = jnp.asarray(RNG.normal(size=(B, H, W, Cx)), jnp.float32)
    ref = jnp.asarray(RNG.uniform(-1, 1, size=(B, L, Pp, 2)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, dt, ref, pos)
    out = np.asarray(m.apply(params, x, dt, ref, pos))
    extra = nRP // (2 * Pp)
    assert out.shape == (B, L + extra, Pp, 2)
    # original coords preserved in front
    np.testing.assert_allclose(out[:, :L], np.asarray(ref), atol=1e-6)
    # appended coords are valid grid coords
    assert (out[:, L:] >= -1.0 - 1e-6).all() and (out[:, L:] <= 1.0 + 1e-6).all()


def test_sample_along_seg_points_lie_on_segment():
    B, L, n = 1, 5, 6
    rng = np.random.default_rng(11)
    lines = rng.uniform(-0.9, 0.9, size=(B, L, 2, 2)).astype(np.float32)
    out = np.asarray(sample_along_seg(jnp.asarray(lines), 480, 640, n))
    assert out.shape == (B, L, 2 + n, 2)
    # the first two points are the original endpoints
    np.testing.assert_allclose(out[:, :, :2], lines, atol=1e-5)
    # every appended point is within the segment's bounding box (+eps)
    lo = lines.min(axis=2) - 1e-4
    hi = lines.max(axis=2) + 1e-4
    pts = out[:, :, 2:]
    assert (pts >= lo[:, :, None]).all() and (pts <= hi[:, :, None]).all()


def test_sample_mid_seg():
    lines = jnp.asarray(RNG.uniform(-1, 1, size=(2, 4, 2, 2)), jnp.float32)
    out = np.asarray(sample_mid_seg(lines))
    assert out.shape == (2, 4, 3, 2)
    np.testing.assert_allclose(out[:, :, 2],
                               np.asarray(lines).mean(axis=2), atol=1e-6)


def test_reflection_reduce_shapes():
    m = ReflectionReduce()
    x = jnp.asarray(RNG.normal(size=(1, 64, 96, 3)), jnp.float32)
    sizes = [(4, 6), (8, 12), (16, 24)]
    params = m.init(jax.random.PRNGKey(0), x, sizes)
    f16, f8, f4 = m.apply(params, x, sizes)
    assert f16.shape == (1, 4, 6, 256)
    assert f8.shape == (1, 8, 12, 128)
    assert f4.shape == (1, 16, 24, 64)


# ---------------------------------------------------------------------------
# gate wiring: class_tokenfuse_layers actually changes the model
# ---------------------------------------------------------------------------

def test_class_tokenfuse_gate_adds_params():
    from gwdepth_tpu.config import tiny_test_config
    from gwdepth_tpu.models.glassrgbd import GlassRGBD

    cfg_off = tiny_test_config()
    cfg_on = tiny_test_config(class_tokenfuse_layers=(True, False, False))
    H, W = cfg_on.train_hw
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    mask = jnp.ones((1, H, W), bool)
    p_off = GlassRGBD(cfg_off).init(jax.random.PRNGKey(0), img, mask)
    p_on = GlassRGBD(cfg_on).init(jax.random.PRNGKey(0), img, mask)
    n_off = sum(x.size for x in jax.tree.leaves(p_off))
    n_on = sum(x.size for x in jax.tree.leaves(p_on))
    assert n_on > n_off
    assert "token_relation" in str(jax.tree_util.tree_structure(p_on))


def test_class_tokenfuse_gate_gradients_flow():
    """Training-path health: grads reach the PointGuidedTokenFuse params
    when the gate is on (the fuse REPLACES the depth token, so it is on the
    loss path of every depth prediction)."""
    from gwdepth_tpu.config import tiny_test_config
    from gwdepth_tpu.models.glassrgbd import GlassRGBD

    cfg = tiny_test_config(class_tokenfuse_layers=(True, False, False))
    model = GlassRGBD(cfg)
    H, W = cfg.train_hw
    img = jnp.asarray(RNG.normal(size=(1, H, W, 3)), jnp.float32)
    mask = jnp.ones((1, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), img, mask)

    def loss(p):
        out = model.apply(p, img, mask)
        return sum(jnp.mean(d) for d in out["pred_depth"])

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    tok = [np.abs(np.asarray(v)).sum() for k, v in flat
           if "token_relation" in jax.tree_util.keystr(k)]
    assert tok, "no token_relation grads found"
    assert all(np.isfinite(x) for x in tok)
    assert sum(x > 0 for x in tok) >= len(tok) // 2
