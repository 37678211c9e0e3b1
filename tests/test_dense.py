"""Dense-branch tests: certain_sample behavioral parity vs a host oracle
that follows the reference algorithm (reference:
src/models/points/points_sample.py:291-364), plus shape/finiteness checks
for the Swin stack, point prediction, and the full GlassRGBD forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.models.points import certain_sample, PointBasedPred, PyramidLayer
from gwdepth_tpu.models.swin import SwinLayer
from gwdepth_tpu.models.glassrgbd import GlassRGBD


def oracle_certain_sample(pred_small, pred_large, intervals, S, min_d):
    """Host re-statement of the reference's loop (points_sample.py:291-364):
    bilinear-upsample coarse pred, variance = squared diff, per-interval
    quota from the population share, GLOBAL top-k per quota with
    index-ascending sort, tile+tail-repeat padding to fixed size."""
    from gwdepth_tpu.ops.interpolate import resize_bilinear
    B, H, W = pred_large.shape
    up = np.asarray(resize_bilinear(jnp.asarray(pred_small), (H, W),
                                    align_corners=True))
    variance = (up - pred_large) ** 2
    bounds = [min_d] + list(intervals) + [1.0]
    outs = []
    for b in range(B):
        v = variance[b].reshape(-1)
        p = pred_large[b].reshape(-1)
        total = H * W
        order = np.argsort(-v, kind="stable")
        segs, already = [], 0
        for i in range(len(bounds) - 1):
            cnt = int(((p >= bounds[i]) & (p < bounds[i + 1])).sum())
            q = int(min(np.floor(cnt / total * S), cnt))
            if q > 0:
                idx = np.sort(order[:q])
                segs.append(idx)
                already += q
        if segs:
            cat = np.concatenate(segs)
            remain = S - already
        else:
            cat = np.sort(order[:S])
            remain = 0
        if remain > 0 and remain >= already:
            times = remain // already + 1
            cat = np.tile(cat, times)
            remain = S - already * times
        if remain > 0:
            cat = np.concatenate([cat, cat[-remain:]])
        outs.append(cat[:S])
    flat = np.stack(outs)
    col = (flat % W).astype(np.float32)
    row = (flat // W).astype(np.float32)
    return np.stack([(col / W) * 2 - 1, (row / H) * 2 - 1], -1)[:, :, None]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_certain_sample_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B, h, w, H, W, S = 2, 4, 6, 8, 12, 13
    ps = rng.uniform(0, 1, (B, h, w)).astype(np.float32)
    pl = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
    intervals = (0.1, 0.3, 0.5, 0.7, 0.9)
    got = np.asarray(certain_sample(jnp.asarray(ps), jnp.asarray(pl),
                                    intervals, S, 1e-4))
    want = oracle_certain_sample(ps, pl, intervals, S, 1e-4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_certain_sample_fallback_no_intervals():
    # all preds below min bound -> every quota 0 -> global top-S fallback
    B, H, W, S = 1, 5, 5, 6
    pl = np.full((B, H, W), 1e-6, np.float32)
    ps = np.zeros((B, 3, 3), np.float32)
    got = np.asarray(certain_sample(jnp.asarray(ps), jnp.asarray(pl),
                                    (0.1, 0.3, 0.5, 0.7, 0.9), S, 1e-4))
    want = oracle_certain_sample(ps, pl, (0.1, 0.3, 0.5, 0.7, 0.9), S, 1e-4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_swin_layer_shapes_ref_attention():
    cfg = tiny_test_config()
    B, H, W, C = 2, 10, 12, 32
    layer = SwinLayer(C, 2, 4, 7, 2.0, "ref")
    x = jnp.ones((B, H, W, C))
    ref = jnp.zeros((B, 4, 2, 2))
    pos = jnp.zeros((B, H, W, C))
    params = layer.init(jax.random.PRNGKey(0), x, ref, pos)
    y, _, _ = layer.apply(params, x, ref, pos)
    assert y.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(y)).all()


def test_swin_layer_class_tokens():
    B, H, W, C, tC = 1, 9, 11, 32, 8
    layer = SwinLayer(C, 2, 4, 7, 2.0, "class", tC)
    x = jnp.ones((B, H, W, C))
    coords = jnp.zeros((B, 6, 1, 2))
    pos = jnp.zeros((B, H, W, C))
    dt = jnp.ones((B, H, W, tC))
    st = jnp.ones((B, H, W, tC))
    params = layer.init(jax.random.PRNGKey(0), x, coords, pos, dt, st)
    y, d, s = layer.apply(params, x, coords, pos, dt, st)
    assert y.shape == (B, H, W, C)
    assert d.shape == (B, H, W, tC) and s.shape == (B, H, W, tC)


def test_point_based_pred_convex_mix():
    """Prediction is a softmax mix of anchor depths -> bounded by anchors."""
    B, H, W, C, tC, S = 1, 8, 8, 16, 8, 5
    m = PointBasedPred(C, tC, (4, 2, 2, 2), S)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, C))
    dt = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, tC))
    pre = jnp.linspace(0.2, 0.8, H * W).reshape(B, H, W)
    coords = jax.random.uniform(jax.random.PRNGKey(2), (B, S, 1, 2),
                                minval=-0.9, maxval=0.9)
    pos = jnp.zeros((B, H, W, C))
    params = m.init(rng, x, dt, pre, coords, pos)
    pred = m.apply(params, x, dt, pre, coords, pos)
    assert pred.shape == (B, H, W)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0


def test_glassrgbd_forward_shapes():
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    B, H, W = 1, *cfg.train_hw
    imgs = jnp.zeros((B, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["pred_logits"].shape == (B, cfg.num_queries, 2)
    assert out["pred_lines"].shape == (B, cfg.num_queries, 6)
    assert len(out["aux_outputs"]) == cfg.dec_layers - 1
    d16, d8, d4, dfull = out["pred_depth"]
    assert d16.shape == (B, H // 16, W // 16)
    assert d8.shape == (B, H // 8, W // 8)
    assert d4.shape == (B, H // 4, W // 4)
    assert dfull.shape == (B, H, W)
    assert out["pred_seg"].shape == (B, H, W, 2)
    # final depth in meters within [0, max_depth]
    assert float(dfull.max()) <= cfg.max_depth
    for t in [out["pred_logits"], dfull, out["pred_seg"]]:
        assert np.isfinite(np.asarray(t)).all()


def test_glassrgbd_group_attention_path():
    """group_attention_layers on -> ref-query mixture inside class blocks
    (reference flag, src/args.py:140 — default off)."""
    cfg = tiny_test_config(
        group_attention_layers=((True,), (True,), (True,)),
        class_trans_layers=(1, 1, 1))
    model = GlassRGBD(cfg)
    imgs = jnp.zeros((1, *cfg.train_hw, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert np.isfinite(np.asarray(out["pred_depth"][-1])).all()
    # the ref-mixture params must exist in the class transformers
    p = params["params"]["dense_encoder"]["class_transformer1"]["block0"]
    assert "ref" in p["attn"], list(p["attn"].keys())


def test_glassrgbd_with_line_depth_path():
    """with_line_depth on -> depth tokens come from Global2PointGraph fused
    with learned per-line-endpoint tokens instead of a broadcast parameter
    (reference gate, src/args.py:131; the reference's own forward cannot
    run it — see models/dense_encoder.py docstring and the bitrot
    assertions in tests/test_reference_parity_geometry.py)."""
    cfg = tiny_test_config(with_line_depth=True)
    model = GlassRGBD(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (1, *cfg.train_hw, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    de = params["params"]["dense_encoder"]
    assert "point_depth_token" in de and "init_token" in de
    assert all(f"gpg{i}" in de for i in (1, 2, 3)), list(de.keys())
    # the broadcast token and the MlpNorm reprojections are NOT built
    assert "depth_token" not in de
    assert "old_depth_token_proj8" not in de
    assert "old_seg_token_proj8" not in de
    assert de["point_depth_token"].shape == (
        1, cfg.num_ref * 2, cfg.class_token_dim)
    assert de["init_token"].shape == (
        1, cfg.class_init_size, cfg.class_init_size, cfg.class_token_dim)

    out = model.apply(params, imgs)
    B, H, W = 1, *cfg.train_hw
    for d, s in zip(out["pred_depth"], (16, 8, 4, 1)):
        assert d.shape == (B, H // s, W // s)
        assert np.isfinite(np.asarray(d)).all()

    # gradients flow into the graph-token machinery
    def loss(p):
        o = model.apply({"params": p}, imgs)
        return jnp.sum(o["pred_depth"][-1]) + jnp.sum(o["pred_seg"])

    g = jax.grad(loss)(params["params"])
    gd = g["dense_encoder"]
    for path in ("point_depth_token", "init_token"):
        arr = np.asarray(gd[path])
        assert np.isfinite(arr).all() and np.abs(arr).max() > 0, path
    k = np.asarray(gd["gpg1"]["node_attention"]["fc1"]["kernel"])
    assert np.isfinite(k).all() and np.abs(k).max() > 0
