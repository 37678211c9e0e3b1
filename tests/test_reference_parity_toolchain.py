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

from gwdepth_tpu.tools.depth_completion import (Intrinsics,
                                                complete_polygon_depth,
                                                deproject,
                                                interpolate_side_points,
                                                polygon_mask, project)


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


def test_interior_fill_vs_reference_on_plane(reft):
    """Oracle-compare the INTERIOR fill (VERDICT r4 weak #5 / next #6).

    The reference fills a polygon's interior with the all-pairs line walk
    `calculate_region_depth` (depth_interpolation.py:168-206): sampled
    side points x every side point, 3D chord interpolation at milli_step,
    per-pixel running average.  Ours is a vectorized scanline sweep
    (tools/depth_completion.py:_scanline_fill).  On a PLANAR glass pane —
    the physical case the toolchain exists for — every chord lies in the
    plane, so both constructions must reproduce the same analytic depth
    field; this pins our re-derivation to the reference numerically where
    the two algorithms have a common ground truth.

    Asserts, on the interior pixels both methods wrote:
      * ref fill  ~= analytic plane
      * our fill  ~= analytic plane, and not worse than 1.2x ref's RMSE
      * our fill  ~= ref fill (direct parity on the overlap)
    """
    di = reft.depth_interpolation
    intr_t, intr_m = _intrin(reft)

    for a, b, c in [(0.0, 0.0, 3.0),          # fronto-parallel pane
                    (0.25, -0.15, 3.2)]:      # slanted pane
        # plane Z = a*X + b*Y + c (meters);  at pixel (u, v):
        #   Z = c / (1 - a*(u-ppx)/fx - b*(v-ppy)/fy)
        def plane_z(u, v):
            return c / (1.0 - a * (u - intr_m.ppx) / intr_m.fx
                        - b * (v - intr_m.ppy) / intr_m.fy)

        vertex_px = np.array([[600.0, 330.0], [700.0, 335.0],
                              [695.0, 410.0], [605.0, 405.0]])
        vdepth_m = plane_z(vertex_px[:, 0], vertex_px[:, 1])
        pts_mm = deproject(vertex_px, vdepth_m, intr_m) * 1000.0

        # reference fill (milli_step widened 6->15 to keep the O(N^2)
        # python walk tractable; coverage stays dense at this pane size)
        sides_px_t, sides_pts_t = di.calculate_sides_depth(
            list(vertex_px), list(pts_mm), intr_t, milli_step=15)
        h, w = 720, 1280
        ref_mat, _times = di.calculate_region_depth(
            sides_px_t, sides_pts_t, intr_t,
            compl_depth_mat=np.zeros((h, w), np.float64), milli_step=15)

        ours = complete_polygon_depth(
            np.zeros((h, w), np.float32), vertex_px, intr_m, step_mm=15.0,
            vertex_depth_mm=vdepth_m * 1000.0)

        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        truth_mm = plane_z(uu, vv) * 1000.0
        # compare strictly interior (erode 2px): int() truncation scatters
        # the reference's boundary writes
        interior = polygon_mask(vertex_px, h, w).copy()
        interior[:2] = interior[-2:] = False
        er = interior.copy()
        er[1:] &= interior[:-1]; er[:-1] &= interior[1:]
        er[:, 1:] &= interior[:, :-1]; er[:, :-1] &= interior[:, 1:]
        both = er & (ref_mat > 0) & (ours > 0)
        assert both.sum() > 2000, both.sum()

        rmse_ref = float(np.sqrt(((ref_mat - truth_mm)[both] ** 2).mean()))
        rmse_our = float(np.sqrt(((ours - truth_mm)[both] ** 2).mean()))
        rmse_ab = float(np.sqrt(((ours - ref_mat)[both] ** 2).mean()))
        print(f"plane a={a} b={b}: rmse_ref={rmse_ref:.3f}mm "
              f"rmse_ours={rmse_our:.3f}mm rmse_ours_vs_ref={rmse_ab:.3f}mm "
              f"({int(both.sum())} px)")
        # both reconstruct the pane to sub-centimeter accuracy; ours is
        # equivalent-or-better (within 20%) and directly close to ref
        assert rmse_ref < 10.0, rmse_ref
        assert rmse_our < max(1.2 * rmse_ref, 2.0), (rmse_our, rmse_ref)
        assert rmse_ab < 15.0, rmse_ab
