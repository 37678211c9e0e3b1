"""Torch-oracle parity for the point machinery and decoder numerics:
ConvLn / BasicBlock / PyramidLayer (reference: points_sample.py:12-125),
PointBasedPred (:235-280) and the UpConv decoder stage
(dense_upsample.py:74-90, 160-182)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from gwdepth_tpu.models.points import ConvLn, PyramidLayer, PointBasedPred
from gwdepth_tpu.models.decoder import UpConv

RNG = np.random.default_rng(31)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))


def torch_convln(x_nchw, params, stride=1, dilation=1):
    """conv(no bias) -> channels-last LayerNorm (points_sample.py:12-25)."""
    w = t(params["conv"]["kernel"]).permute(3, 2, 0, 1)
    pad = dilation if dilation > 1 else w.shape[-1] // 2
    y = TF.conv2d(x_nchw, w, stride=stride, padding=pad, dilation=dilation)
    y = y.permute(0, 2, 3, 1)
    y = TF.layer_norm(y, (y.shape[-1],), t(params["ln"]["scale"]),
                      t(params["ln"]["bias"]))
    return y.permute(0, 3, 1, 2)


def test_convln_matches_torch():
    B, H, W, C, O = 2, 9, 11, 6, 10
    m = ConvLn(O)
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = torch_convln(t(x).permute(0, 3, 1, 2),
                            jax.tree.map(np.asarray, params))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-5)


def test_pyramid_layer_shapes_and_padding():
    """Output crops back to the input HW even when the largest pool pads
    (reference pads before pooling, points_sample.py:94-104)."""
    B, H, W, P = 1, 10, 12, 6   # H < pool_sizes[0]=16 -> pad path
    m = PyramidLayer(P, (16, 8, 4, 2))
    x = RNG.normal(size=(B, H, W, P)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x))
    assert y.shape == (B, H, W, P)
    assert np.isfinite(np.asarray(y)).all()


def test_point_based_pred_scale_and_softmax():
    """The rg attention uses the reference's odd dim**-2 scale
    (points_sample.py:273) and mixes anchors convexly."""
    B, H, W, C, tC, S = 1, 16, 16, 8, 4, 5
    m = PointBasedPred(C, tC, (4, 2, 2, 2), S)
    x = jnp.zeros((B, H, W, C))
    dt = jnp.zeros((B, H, W, tC))
    pre = jnp.full((B, H, W), 0.5)
    coords = jnp.zeros((B, S, 1, 2))
    pos = jnp.zeros((B, H, W, C))
    params = m.init(jax.random.PRNGKey(0), x, dt, pre, coords, pos)
    pred = m.apply(params, x, dt, pre, coords, pos)
    # constant anchors of 0.5 -> convex mix is exactly 0.5 everywhere
    np.testing.assert_allclose(np.asarray(pred), 0.5, atol=1e-6)


def test_upconv_matches_torch():
    """nearest x2 resize + conv3x3(no bias) + ELU (dense_upsample.py:74-90)."""
    B, H, W, C, O = 1, 5, 7, 6, 8
    m = UpConv(O)
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), (2 * H, 2 * W))
    got = m.apply(params, jnp.asarray(x), (2 * H, 2 * W))
    with torch.no_grad():
        up = TF.interpolate(t(x).permute(0, 3, 1, 2), scale_factor=2,
                            mode="nearest")
        w = t(np.asarray(params["params"]["conv"]["kernel"])) \
            .permute(3, 2, 0, 1)
        want = TF.elu(TF.conv2d(up, w, padding=1))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-5)


def test_topk_flat_matches_lax_topk_with_ties():
    """The hierarchical top-k used by certain_sample must be exact,
    including tie order (stable, lower flat index first)."""
    from gwdepth_tpu.models.points import _topk_flat
    rng = np.random.default_rng(17)
    for total, S in [(49152, 160), (12288, 30), (500, 30), (2048, 80)]:
        v = rng.normal(size=(total,)).astype(np.float32)
        v[::7] = 2.0            # heavy ties crossing row boundaries
        v[5::11] = 2.0
        got = np.asarray(_topk_flat(jnp.asarray(v), S))
        want = np.asarray(jax.lax.top_k(jnp.asarray(v), S)[1])
        np.testing.assert_array_equal(got, want)
