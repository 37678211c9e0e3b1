"""Golden tests for core ops against torch (CPU) / scipy / numpy references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gwdepth_tpu.ops import (
    window_partition, window_reverse, shifted_window_attn_mask,
    grid_sample, resize_nearest, resize_bilinear,
    sine_posemb_from_mask, hungarian, hungarian_scipy,
)
from gwdepth_tpu.ops.lap import match_lines

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

RNG = np.random.default_rng(0)


def test_window_roundtrip():
    x = jnp.asarray(RNG.normal(size=(2, 14, 21, 5)).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 3, 49, 5)
    back = window_reverse(w, 7, 14, 21)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shifted_window_mask_matches_reference_loop():
    """Reference builds the SW-MSA mask with host-side slice loops
    (multiscale_transformerr.py:936-955); check our iota version agrees."""
    Hp, Wp, ws, shift = 14, 21, 7, 3
    img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = np.asarray(window_partition(jnp.asarray(img_mask), ws)).squeeze(-1)
    ref = mw[:, None, :] - mw[:, :, None]
    ref = np.where(ref != 0, -100.0, 0.0)
    ours = np.asarray(shifted_window_attn_mask(Hp, Wp, ws, shift))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch(mode, align):
    x = RNG.normal(size=(2, 3, 9, 13)).astype(np.float32)
    grid = (RNG.uniform(-1.3, 1.3, size=(2, 4, 6, 2))).astype(np.float32)
    want = TF.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                          mode=mode, align_corners=align).numpy()
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                 mode=mode, align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_torch():
    x = RNG.normal(size=(2, 3, 11, 7)).astype(np.float32)
    for size in [(22, 14), (5, 3), (16, 10)]:
        want = TF.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
        got = np.asarray(resize_nearest(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(align):
    x = RNG.normal(size=(2, 3, 11, 7)).astype(np.float32)
    for size in [(22, 14), (5, 3), (17, 9)]:
        want = TF.interpolate(torch.from_numpy(x), size=size, mode="bilinear",
                              align_corners=align).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=align))
        np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_sine_posemb(mask_valid, num_pos_feats, normalize):
    """Port of reference PositionEmbeddingSine (position_encoding.py:28-48)."""
    import math
    not_mask = torch.from_numpy(mask_valid.astype(np.float32))
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2).numpy()


@pytest.mark.parametrize("normalize", [False, True])
def test_sine_posemb_matches_reference(normalize):
    valid = np.zeros((2, 6, 9), bool)
    valid[0, :5, :7] = True
    valid[1] = True
    want = _torch_sine_posemb(valid, 16, normalize)
    got = np.asarray(sine_posemb_from_mask(jnp.asarray(valid), 16, normalize=normalize))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hungarian_matches_scipy_cost():
    from scipy.optimize import linear_sum_assignment
    for n in [1, 2, 5, 17, 40]:
        c = RNG.normal(size=(n, n)).astype(np.float32)
        col4row = np.asarray(jax.jit(hungarian)(jnp.asarray(c)))
        assert sorted(col4row.tolist()) == list(range(n))  # a permutation
        rows, cols = linear_sum_assignment(c)
        want = c[rows, cols].sum()
        got = c[np.arange(n), col4row].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hungarian_scipy_callback():
    c = RNG.normal(size=(8, 8)).astype(np.float32)
    a = np.asarray(hungarian(jnp.asarray(c)))
    b = np.asarray(hungarian_scipy(jnp.asarray(c)))
    got = c[np.arange(8), a].sum()
    want = c[np.arange(8), b].sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_match_lines_rectangular():
    from scipy.optimize import linear_sum_assignment
    Q, T = 20, 8
    for n_valid in [1, 3, 8]:
        c = RNG.normal(size=(Q, T)).astype(np.float32)
        t2q = np.asarray(match_lines(jnp.asarray(c), jnp.asarray(n_valid)))
        rows, cols = linear_sum_assignment(c[:, :n_valid])
        want = c[rows, cols].sum()
        got = c[t2q[:n_valid], np.arange(n_valid)].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # matched queries must be distinct
        assert len(set(t2q[:n_valid].tolist())) == n_valid


def test_match_lines_vmaps():
    B, Q, T = 3, 10, 5
    costs = jnp.asarray(RNG.normal(size=(B, Q, T)).astype(np.float32))
    n_valid = jnp.asarray([1, 3, 5])
    out = jax.jit(jax.vmap(match_lines))(costs, n_valid)
    assert out.shape == (B, T)


def test_hungarian_fuzz_vs_scipy():
    """Fuzz the on-device JV solver against scipy on adversarial matrices:
    ties, duplicated rows/columns, huge magnitude spread, near-zero costs.
    Optimal COST must match (assignments may differ on ties)."""
    from scipy.optimize import linear_sum_assignment
    from gwdepth_tpu.ops.lap import hungarian
    rng = np.random.default_rng(123)
    for trial in range(30):
        n = int(rng.integers(2, 24))
        kind = trial % 5
        if kind == 0:
            c = rng.normal(size=(n, n))
        elif kind == 1:
            c = rng.integers(0, 3, (n, n)).astype(np.float64)   # many ties
        elif kind == 2:
            c = np.tile(rng.normal(size=(1, n)), (n, 1))        # equal rows
        elif kind == 3:
            c = rng.normal(size=(n, n)) * 1e6                    # big spread
        else:
            c = np.abs(rng.normal(size=(n, n))) * 1e-6           # tiny
        col4row = np.asarray(hungarian(jnp.asarray(c, jnp.float32)))
        assert sorted(col4row.tolist()) == list(range(n)), "not a permutation"
        got = c[np.arange(n), col4row].sum()
        r, cc = linear_sum_assignment(c)
        want = c[r, cc].sum()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_learned_posemb_matches_torch():
    """Learned row/col embedding vs the reference layout
    (position_encoding.py:50-77): concat [x_emb per column, y_emb per row]
    on channels."""
    from gwdepth_tpu.ops.posemb import LearnedPosEmb2D
    m = LearnedPosEmb2D(8)
    params = m.init(jax.random.PRNGKey(3), 2, 6, 9)
    got = np.asarray(m.apply(params, 2, 6, 9))           # (2, 6, 9, 16)
    row = np.asarray(params["params"]["row_embed"])
    col = np.asarray(params["params"]["col_embed"])
    want = np.concatenate([
        np.broadcast_to(col[:9][None], (6, 9, 8)),
        np.broadcast_to(row[:6][:, None], (6, 9, 8)),
    ], axis=-1)
    np.testing.assert_allclose(got[0], want, atol=0)
    np.testing.assert_allclose(got[1], want, atol=0)


def test_learned_posemb_selected_in_model():
    from gwdepth_tpu.config import tiny_test_config
    from gwdepth_tpu.models import GlassRGBD
    cfg = tiny_test_config(position_embedding="learned", with_dense=False)
    img = jnp.zeros((1, *cfg.train_hw, 3), jnp.float32)
    params = GlassRGBD(cfg).init(jax.random.PRNGKey(0), img)
    assert "position_embedding" in params["params"]
    out = GlassRGBD(cfg).apply(params, img)
    assert out["pred_lines"].shape[-1] == cfg.line_dim


def test_hungarian_rect_fuzz_vs_scipy():
    """Rectangular JV (only n_valid rows augmented, gated loops) vs
    scipy's rectangular solve: exact assignment on unique costs,
    cost-optimal on ties/degenerate matrices, -1 for skipped rows."""
    from scipy.optimize import linear_sum_assignment
    from gwdepth_tpu.ops.lap import hungarian_rect
    rng = np.random.default_rng(7)
    for trial in range(40):
        T = int(rng.integers(1, 30))
        Q = int(rng.integers(T, 110))
        nv = int(rng.integers(1, T + 1))
        if trial % 3 == 0:
            cost = rng.integers(0, 4, size=(T, Q)).astype(np.float32)
            if trial % 6 == 0:
                cost[:] = 0.0
        else:
            cost = (rng.normal(size=(T, Q)).astype(np.float32)
                    * rng.uniform(0.1, 10))
        got = np.asarray(hungarian_rect(jnp.asarray(cost), jnp.int32(nv)))
        sel = got[:nv]
        assert (got[nv:] == -1).all()
        assert len(set(sel.tolist())) == nv
        assert (sel >= 0).all() and (sel < Q).all()
        r, c = linear_sum_assignment(cost[:nv].astype(np.float64))
        np.testing.assert_allclose(cost[np.arange(nv), sel].sum(),
                                   cost[r, c].sum(), rtol=1e-5, atol=1e-3)


def test_match_lines_jax_matches_scipy_rectangular():
    """The jax backend's direct rectangular solve returns scipy's exact
    assignment on unique-cost DETR-sized problems (Q=100, T=96)."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(11)
    for nv in (1, 4, 17, 40, 96):
        cost = rng.normal(size=(100, 96)).astype(np.float32)
        got = np.asarray(match_lines(jnp.asarray(cost), jnp.int32(nv),
                                     "jax"))
        r, c = linear_sum_assignment(cost[:, :nv].T.astype(np.float64))
        assert (got[:nv] == c).all()
        assert (got >= 0).all() and (got < 100).all()
