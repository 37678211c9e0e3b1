"""Offline toolchain tests: pinhole project/deproject roundtrip, planar
polygon depth completion recovers the plane, reflection hint sampling."""

import numpy as np

from gwdepth_tpu.tools import (
    Intrinsics, deproject, project, interpolate_side_points,
    complete_polygon_depth, complete_depth,
    reflection_difference, sample_reflection_points)

INTR = Intrinsics(fx=900.0, fy=900.0, ppx=640.0, ppy=360.0,
                  width=1280, height=720)


def test_project_deproject_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 1280, (50, 2))
    d = rng.uniform(0.5, 8.0, 50)
    pts = deproject(px, d, INTR)
    back = project(pts, INTR)
    np.testing.assert_allclose(back, px, atol=1e-6)
    np.testing.assert_allclose(pts[:, 2], d)


def test_side_interpolation_step():
    p1 = np.array([0.0, 0.0, 1.0])
    p2 = np.array([0.0, 0.0, 1.06])   # 60mm apart
    seg = interpolate_side_points(p1, p2, step_mm=6.0)
    assert len(seg) == 11             # 10 steps + endpoint
    np.testing.assert_allclose(seg[0], p1)
    np.testing.assert_allclose(seg[-1], p2)


def test_complete_polygon_recovers_plane():
    """Vertices on a fronto-parallel plane at 2m, hole inside -> filled
    region ~2000mm everywhere."""
    h, w = 120, 160
    raw = np.zeros((h, w), np.float32)
    verts = np.array([[30, 20], [130, 20], [130, 100], [30, 100]], float)
    vx, vy = verts[:, 0].astype(int), verts[:, 1].astype(int)
    raw[vy, vx] = 2000.0
    out = complete_polygon_depth(raw, verts, INTR, step_mm=6.0)
    interior = out[40:80, 60:110]
    assert (interior > 0).mean() > 0.95
    vals = interior[interior > 0]
    np.testing.assert_allclose(vals, 2000.0, rtol=0.02)


def test_complete_polygon_slanted_plane():
    """Left edge at 2m, right edge at 3m -> interior interpolates between."""
    h, w = 120, 160
    raw = np.zeros((h, w), np.float32)
    verts = np.array([[20, 20], [140, 20], [140, 100], [20, 100]], float)
    depths = np.array([2000.0, 3000.0, 3000.0, 2000.0])
    out = complete_polygon_depth(raw, verts, INTR, step_mm=6.0,
                                 vertex_depth_mm=depths)
    mid_left = out[60, 30]
    mid_right = out[60, 130]
    assert 1900 < mid_left < 2400
    assert 2600 < mid_right < 3100
    assert mid_right > mid_left + 300


def test_complete_depth_label_driver():
    h, w = 80, 80
    raw = np.zeros((h, w), np.float32)
    raw[10, 10] = raw[10, 60] = raw[60, 60] = raw[60, 10] = 1500.0
    label = {"shapes": [{"points": [[10, 10], [60, 10], [60, 60], [10, 60]],
                         "poly_id": 0}]}
    out = complete_depth(raw, label, INTR)
    assert (out[20:50, 20:50] > 0).mean() > 0.9


def test_reflection_pipeline():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    rr = img.copy()
    rr[5:15, 5:15] = np.clip(rr[5:15, 5:15].astype(int) - 120, 0, 255)
    diff = reflection_difference(img, rr)
    assert diff.dtype == np.uint8 and diff[8, 8].max() > 50
    hints = sample_reflection_points(diff, hint_center_num=5)
    pts = np.array(hints["rhint_points"])
    assert len(pts) >= 1
    assert (pts[:, 0] >= 4).all() and (pts[:, 0] <= 15).all()
