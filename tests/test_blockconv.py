"""Space-to-depth decoder-tail equivalence (ops/blockconv.py).

The block path is a pure re-layout of the same convolutions; these tests
pin (a) the kernel remap math against `lax.conv_general_dilated` /
`resize_nearest_nhwc` for every (s_out, u) case the decoder uses, and
(b) the full `DensePrediction` block path against the direct pixel-domain
path under one shared parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwdepth_tpu.models.decoder import DensePrediction
from gwdepth_tpu.ops.blockconv import (block_conv, depth_to_space,
                                       space_to_depth)
from gwdepth_tpu.ops.interpolate import resize_nearest_nhwc


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("s_out,u", [(2, 1), (4, 1), (2, 2), (4, 2)])
def test_block_conv_matches_pixel_conv(s_out, u):
    k = jax.random.PRNGKey(s_out * 10 + u)
    H, W, ci, co = 16, 24, 5, 7
    si = s_out // u
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, H, W, ci))
    w = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, ci, co))

    if u == 1:
        ref = _conv(x, w)
    else:
        ref = _conv(resize_nearest_nhwc(x, (2 * H, 2 * W)), w)
    got = depth_to_space(
        block_conv(space_to_depth(x, si) if si > 1 else x, w, s_out, u),
        s_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_s2d_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x))


def test_dense_prediction_block_path_matches_direct():
    k = jax.random.PRNGKey(7)
    B, h, w, C, tC = 1, 8, 12, 40, 32
    feat = jax.random.normal(jax.random.fold_in(k, 1), (B, h, w, C))
    d4 = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 2),
                                          (B, h, w)))
    dt = jax.random.normal(jax.random.fold_in(k, 3), (B, h, w, tC))
    st = jax.random.normal(jax.random.fold_in(k, 4), (B, h, w, tC))
    out_hw = (4 * h, 4 * w)

    direct = DensePrediction(10.0, tC, blockconv=False)
    block = DensePrediction(10.0, tC, blockconv=True)
    params = direct.init(jax.random.PRNGKey(0), feat, d4, dt, st, out_hw)
    params_b = block.init(jax.random.PRNGKey(0), feat, d4, dt, st, out_hw)
    # identical parameter trees (paths AND values: init RNG folds by path)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params_b)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))

    dep_a, seg_a = direct.apply(params, feat, d4, dt, st, out_hw)
    dep_b, seg_b = block.apply(params, feat, d4, dt, st, out_hw)
    np.testing.assert_allclose(np.asarray(dep_b), np.asarray(dep_a),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a),
                               atol=2e-5, rtol=1e-5)


def test_dense_prediction_block_path_odd_size_falls_back():
    """out_hw that is not 4x the grid must route to the direct path."""
    k = jax.random.PRNGKey(9)
    B, h, w, C, tC = 1, 6, 6, 12, 8
    feat = jax.random.normal(jax.random.fold_in(k, 1), (B, h, w, C))
    d4 = jnp.zeros((B, h, w))
    dt = jnp.zeros((B, h, w, tC))
    st = jnp.zeros((B, h, w, tC))
    out_hw = (4 * h - 2, 4 * w)  # not 4x
    m = DensePrediction(10.0, tC, blockconv=True)
    params = m.init(jax.random.PRNGKey(0), feat, d4, dt, st, out_hw)
    dep, seg = m.apply(params, feat, d4, dt, st, out_hw)
    assert dep.shape == (B, *out_hw) and seg.shape == (B, *out_hw, 2)
