"""Plane loss tests: Sobel parity vs torch conv, triangle rasterization vs
matplotlib-free host check, and the variance semantics (flat plane -> 0)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gwdepth_tpu.losses.plane import (
    sobel_grad, point_in_triangle, plane_norm_loss)

torch = pytest.importorskip("torch")


def test_sobel_matches_torch():
    import torch.nn.functional as TF
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16)).astype(np.float32)
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)
    k = torch.from_numpy(np.stack([kx, ky])[:, None])
    want = TF.conv2d(torch.from_numpy(x[:, None]), k, padding=1).numpy()
    dx, dy = sobel_grad(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), want[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy), want[:, 1], atol=1e-4)


def test_point_in_triangle():
    tri = jnp.asarray([[[1.0, 1.0], [8.0, 1.0], [1.0, 8.0]]])
    mask = np.asarray(point_in_triangle(tri, 10, 10))[0]
    assert mask[2, 2] and mask[1, 1]
    assert not mask[9, 9]
    # area roughly half the bounding square
    assert 20 < mask.sum() < 40


def test_plane_loss_zero_on_planar_depth():
    """A ramp depth map has constant Sobel gradients inside any triangle ->
    variance 0 (up to border effects kept outside via the valid mask)."""
    H, W, Q = 32, 32, 10
    y = np.linspace(0, 1, H)[:, None] * np.ones((1, W))
    depth = jnp.asarray(y[None], jnp.float32)
    valid = jnp.zeros((1, H, W), bool).at[:, 2:-2, 2:-2].set(True)
    lines = np.zeros((1, Q, 6), np.float32)
    lines[0, 0] = [0.2, 0.2, 0.8, 0.2, 0.5, 0.8]  # big triangle
    logits = np.full((1, Q, 2), -3.0, np.float32)
    logits[0, 0, 0] = 3.0
    loss = plane_norm_loss(depth, jnp.asarray(lines), jnp.asarray(logits),
                           valid, num_ref=4, min_area=20)
    assert float(loss) < 1e-8


def test_plane_loss_positive_on_curved_depth():
    H, W, Q = 32, 32, 10
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.uniform(1, 5, (1, H, W)).astype(np.float32))
    valid = jnp.ones((1, H, W), bool)
    lines = np.zeros((1, Q, 6), np.float32)
    lines[0, 0] = [0.1, 0.1, 0.9, 0.1, 0.5, 0.9]
    logits = np.full((1, Q, 2), -3.0, np.float32)
    logits[0, 0, 0] = 3.0
    loss = plane_norm_loss(depth, jnp.asarray(lines), jnp.asarray(logits),
                           valid, num_ref=4, min_area=20)
    assert float(loss) > 0.1
