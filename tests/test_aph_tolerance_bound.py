"""APH tolerance-protocol bound (VERDICT r3 missing #3 / next #8).

The reference's AP^H shells out to MATLAB's `eval_release`
(reference: evaluation/eval-aph-score-glassrgbd.py:70-77), whose pixel
matcher (BSDS correspondPixels heritage) is ONE-TO-ONE; the .m sources
are not shipped, so exact numeric parity is unverifiable on this box
(as it is for the reference itself without MATLAB). This test bounds
the difference between our fast default "dilate" counting and the
one-to-one "match" counting instead of leaving it as "may differ":

1. worst case — adversarial pred sets that crowd the full (2r+1)^2
   neighborhood of isolated GT pixels drive the dilate protocol's
   precision to 1.0 while one-to-one precision is 1/(2r+1)^2 — the
   maximal possible disagreement, constructed and asserted exactly;
2. realistic case — 1-px line rasters with non-crowded predictions:
   the two protocols agree tightly (few points of AP^H), because a
   1-px raster simply cannot crowd GT pixels (2r+1)^2-deep.
"""

from __future__ import annotations

import numpy as np
import pytest

from gwdepth_tpu.evaluation.line_metrics import (
    _dilate, _match_counts, aph_score, rasterize_lines)


def _dilate_counts(pmap, gmap, r):
    gdil = _dilate(gmap, r)
    pdil = _dilate(pmap, r)
    return (int((pmap & gdil).sum()), int((pmap & ~gdil).sum()),
            int((gmap & ~pdil).sum()))


def test_protocols_agree_when_one_to_one_is_possible():
    """Exact-overlap and clearly-separated pixels: identical counts."""
    pmap = np.zeros((32, 32), bool)
    gmap = np.zeros((32, 32), bool)
    # matched pair (distance 1), a lone fp, a lone fn
    gmap[5, 5] = True
    pmap[5, 6] = True
    pmap[20, 20] = True
    gmap[28, 3] = True
    assert _match_counts(pmap, gmap, 1) == (1, 1, 1)
    assert _dilate_counts(pmap, gmap, 1) == (1, 1, 1)


@pytest.mark.parametrize("r", [1, 2])
def test_worst_case_crowding_bound(r):
    """The maximal disagreement: every pred pixel inside one GT pixel's
    (2r+1)^2 neighborhood. dilate says precision 1.0; one-to-one says
    1/(2r+1)^2. No pred set can do worse, because a pred pixel outside
    every GT neighborhood is fp under BOTH protocols — the gap comes
    only from crowding, and crowding is capped at the neighborhood
    size."""
    k = 2 * r + 1
    pmap = np.zeros((16, 16), bool)
    gmap = np.zeros((16, 16), bool)
    gmap[8, 8] = True
    pmap[8 - r:8 + r + 1, 8 - r:8 + r + 1] = True
    tp_d, fp_d, fn_d = _dilate_counts(pmap, gmap, r)
    tp_m, fp_m, fn_m = _match_counts(pmap, gmap, r)
    assert (tp_d, fp_d, fn_d) == (k * k, 0, 0)
    assert (tp_m, fp_m, fn_m) == (1, k * k - 1, 0)
    # the documented bound: dilate tp <= (2r+1)^2 * match tp, achieved
    assert tp_d == k * k * tp_m


def test_match_tp_never_exceeds_dilate_tp():
    """Monotonicity on random pixel clouds: one-to-one tp <= dilate tp,
    and both protocols agree on the never-matchable pixels (fp_dilate
    <= fp_match, fn_dilate <= fn_match)."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        pmap = rng.random((24, 24)) < 0.08
        gmap = rng.random((24, 24)) < 0.08
        tp_d, fp_d, fn_d = _dilate_counts(pmap, gmap, 1)
        tp_m, fp_m, fn_m = _match_counts(pmap, gmap, 1)
        assert tp_m <= tp_d
        assert fp_d <= fp_m and fn_d <= fn_m
        assert tp_m + fp_m == int(pmap.sum())
        assert tp_m + fn_m == int(gmap.sum())


def _dump_pairs(tmp_path, cases):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    for i, (pl, ps, gl) in enumerate(cases):
        np.savez(pred_dir / f"{i:03d}.npz",
                 lines=np.asarray(pl, np.float32),
                 score=np.asarray(ps, np.float32))
        np.savez(gt_dir / f"{i:03d}.npz", lpos=np.asarray(gl, np.float32))
    return str(pred_dir), str(gt_dir)


def test_realistic_line_rasters_keep_protocols_close(tmp_path):
    """Non-crowded 1-px line predictions (jittered copies of GT plus a
    few spurious lines): AP^H under dilate vs match stays within a few
    points — the realistic-case bound the docstring promises."""
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(4):
        gl = rng.random((6, 2, 2)) * 100 + 10
        jitter = rng.normal(0, 0.7, gl.shape)
        spurious = rng.random((2, 2, 2)) * 100 + 10
        pl = np.concatenate([gl + jitter, spurious])
        ps = np.concatenate([rng.random(6) * 0.5 + 0.5, rng.random(2) * 0.3])
        cases.append((pl, ps, gl))
    pred_dir, gt_dir = _dump_pairs(tmp_path, cases)
    s_dil = aph_score(pred_dir, gt_dir, tolerance=1, protocol="dilate")
    s_mat = aph_score(pred_dir, gt_dir, tolerance=1, protocol="match")
    assert s_mat <= s_dil + 1e-9          # upper-bound direction
    assert s_dil - s_mat < 5.0, (s_dil, s_mat)


def test_adversarial_line_rasters_hit_the_gap(tmp_path):
    """MANY coincident predicted lines on one GT line: dilate counts all
    their pixels tp (the rasters coincide), match caps tp at |GT raster|
    ... but coincident rasters collapse to the SAME pixel set, so even
    this adversary cannot widen the gap — rasterization itself dedups.
    The only adversary that works is sub-pixel-offset parallel lines
    (distinct pixels, one GT row), bounded by (2r+1) rows."""
    gl = np.array([[[20.0, 10.0], [20.0, 110.0]]])
    # 3 parallel pred lines at +-1 row: 3x the GT pixel count within r=1
    pl = np.stack([gl[0] + np.array([dy, 0.0]) for dy in (-1.0, 0.0, 1.0)])
    ps = np.array([0.9, 0.9, 0.9])
    pred_dir, gt_dir = _dump_pairs(tmp_path, [(pl, ps, gl)])
    s_dil = aph_score(pred_dir, gt_dir, tolerance=1, protocol="dilate")
    s_mat = aph_score(pred_dir, gt_dir, tolerance=1, protocol="match")
    # dilate: all 3 rows tp -> precision 1; match: 1 row tp -> ~1/3
    assert s_dil > 95.0
    assert s_mat < 55.0
    # and the pixel-level factor is exactly the (2r+1) row bound
    pmap = rasterize_lines(pl)
    gmap = rasterize_lines(gl)
    tp_d, _, _ = _dilate_counts(pmap, gmap, 1)
    tp_m, _, _ = _match_counts(pmap, gmap, 1)
    assert tp_d <= 3 * tp_m + 3   # (2r+1) rows, +ends slack
