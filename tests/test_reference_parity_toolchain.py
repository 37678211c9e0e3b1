"""Reference-code parity for the GT depth-completion toolchain's
geometric core.

Imports the real depth_interpolation/depth_interpolation.py over the
harness's pyrealsense2 pinhole stub (all-zero distortion coefficients,
for which librealsense's brown-conrady math reduces exactly to the
pinhole model) and asserts our tools/depth_completion.py agrees on:

  * deprojection / projection        (:382-395)
  * metric side-stepping placement   (inline_points_interpolation :397-420)
  * the full per-side sample chain   (calculate_sides_depth :121-145)

The INTERIOR fill is a documented re-derivation (vectorized scanline
sweeps vs the reference's all-pairs dict-averaged line walks,
calculate_region_depth :168-206) and is not numerically comparable —
our own tests/test_tools.py asserts its reconstruction quality instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from reference_harness import get_ref_toolchain

from gwdepth_tpu.tools.depth_completion import (Intrinsics, deproject,
                                                interpolate_side_points,
                                                project)


@pytest.fixture(scope="module")
def reft():
    return get_ref_toolchain()


def _intrin(reft):
    import pyrealsense2 as rs
    intr = rs.intrinsics()
    intr.width, intr.height = 1280, 720
    intr.fx, intr.fy = 636.08, 635.23
    intr.ppx, intr.ppy = 634.82, 357.02
    intr.coeffs = [0.0] * 5
    intr.model = rs.distortion.inverse_brown_conrady
    mine = Intrinsics(fx=intr.fx, fy=intr.fy, ppx=intr.ppx, ppy=intr.ppy,
                      width=intr.width, height=intr.height)
    return intr, mine


def test_deproject_project_vs_reference(reft):
    di = reft.depth_interpolation
    intr_t, intr_m = _intrin(reft)
    rng = np.random.default_rng(41)
    n = 40
    pixels = np.stack([rng.uniform(0, 1279, n), rng.uniform(0, 719, n)], 1)
    depths_mm = rng.uniform(400, 9000, n)

    pts_t = np.asarray(di.deproject_to_points(
        list(pixels), list(depths_mm), intr_t, depth_scale=0.001))
    pts_m = deproject(pixels, depths_mm * 0.001, intr_m)
    np.testing.assert_allclose(pts_m, pts_t, rtol=1e-12, err_msg="deproject")

    px_t = np.asarray(di.project_to_pixel(list(pts_t), intr_t))
    px_m = project(pts_m, intr_m)
    np.testing.assert_allclose(px_m, px_t, rtol=1e-9, err_msg="project")
    np.testing.assert_allclose(px_m, pixels, rtol=1e-6,
                               err_msg="roundtrip to source pixels")


def test_side_stepping_vs_reference(reft):
    di = reft.depth_interpolation
    rng = np.random.default_rng(43)
    for _ in range(5):
        p1_m = rng.uniform(-1.0, 1.0, 3) + np.array([0, 0, 3.0])
        p2_m = p1_m + rng.uniform(-0.5, 0.5, 3)
        # reference walks in millimeter units (main flow rescales points
        # by /depth_scale before calculate_sides_depth, :646)
        ref_pts = np.asarray(di.inline_points_interpolation(
            p1_m * 1000.0, p2_m * 1000.0, is_millimeter=True,
            milli_step=6, to_meter=False))
        mine = interpolate_side_points(p1_m, p2_m, step_mm=6.0)
        # ours includes the endpoints; the reference appends them
        # separately (calculate_sides_depth :133-145)
        inner = mine[1:-1] * 1000.0
        assert inner.shape == ref_pts.shape, (inner.shape, ref_pts.shape)
        np.testing.assert_allclose(inner, ref_pts, rtol=1e-9,
                                   err_msg="side sample placement")


def test_calculate_sides_depth_vs_reference(reft):
    """Full side chain: vertex pixels + mm 3D points -> per-side sample
    pixels/points, exactly as the reference composes it."""
    di = reft.depth_interpolation
    intr_t, intr_m = _intrin(reft)
    rng = np.random.default_rng(47)
    k = 4
    vertex_px = np.stack([rng.uniform(300, 900, k),
                          rng.uniform(150, 600, k)], 1)
    depths_mm = rng.uniform(1500, 6000, k)
    pts_mm = deproject(vertex_px, depths_mm * 0.001, intr_m) * 1000.0

    sides_px_t, sides_pts_t = di.calculate_sides_depth(
        list(vertex_px), list(pts_mm), intr_t, milli_step=6)

    for sid in range(k):
        p1, p2 = pts_mm[sid] / 1000.0, pts_mm[(sid + 1) % k] / 1000.0
        mine_pts = interpolate_side_points(p1, p2, step_mm=6.0)
        mine_px = project(mine_pts, intr_m)
        ref_pts = np.asarray([np.asarray(p) for p in sides_pts_t[sid]])
        ref_px = np.asarray([np.asarray(p) for p in sides_px_t[sid]])
        np.testing.assert_allclose(mine_pts[1:-1] * 1000.0, ref_pts[1:-1],
                                   rtol=1e-9, err_msg=f"side {sid} points")
        # reference bookends sides with the raw vertex pixel coords
        np.testing.assert_allclose(mine_px[1:-1], ref_px[1:-1], rtol=1e-6,
                                   err_msg=f"side {sid} pixels")
        np.testing.assert_allclose(ref_px[0], vertex_px[sid], rtol=1e-12)
        np.testing.assert_allclose(ref_pts[0], pts_mm[sid], rtol=1e-12)
