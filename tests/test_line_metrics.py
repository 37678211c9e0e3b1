"""Offline line metric tests: perfect predictions give sAP=100, misses
lower it; NMS suppresses duplicate collinear segments; npz dump round-trips
through the directory-level scorer."""

import numpy as np
import pytest

from gwdepth_tpu.evaluation import (
    ap, fscore, ms_tp_fp, sap_score, line_nms, dump_benchmark_npz,
    postprocess_lines)


def _rand_lines(n, rng):
    return rng.uniform(0, 128, (n, 2, 2))


def test_ms_tp_fp_perfect_match():
    rng = np.random.default_rng(0)
    gt = _rand_lines(5, rng)
    tp, fp = ms_tp_fp(gt.copy(), gt, threshold=5)
    assert tp.sum() == 5 and fp.sum() == 0


def test_ms_tp_fp_endpoint_permutation():
    rng = np.random.default_rng(1)
    gt = _rand_lines(3, rng)
    pred = gt[:, ::-1]  # swapped endpoints still match
    tp, fp = ms_tp_fp(pred, gt, threshold=5)
    assert tp.sum() == 3


def test_ms_tp_fp_one_to_one():
    gt = np.array([[[0, 0], [10, 10]]], float)
    pred = np.stack([gt[0], gt[0] + 0.1])  # two preds, one gt
    tp, fp = ms_tp_fp(pred, gt, threshold=5)
    assert tp.sum() == 1 and fp.sum() == 1


def test_ap_perfect_and_degraded():
    tp = np.array([0.5, 1.0])
    fp = np.array([0.0, 0.0])
    assert ap(tp, fp) == 1.0
    assert 0 < ap(np.array([0.5, 0.5]), np.array([0.0, 0.5])) < 1.0
    assert 0 < fscore(tp, fp) <= 1.0


def test_sap_pipeline_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for i in range(3):
        h, w = 240, 320
        gt_lines_128 = rng.uniform(0, 128, (4, 2, 2))
        np.savez(gt_dir / f"img{i}.npz", lpos=gt_lines_128)
        # construct logits/lines whose postprocessed dump reproduces the GT
        # in 128-space: lines stored [x1 y1 x2 y2] normalized
        xyxy = gt_lines_128[:, :, ::-1]  # to xy
        norm = xyxy / np.array([128, 128]) # [0,1] in 128-space == normalized
        pred_lines = np.zeros((10, 4))
        pred_lines[:4] = norm.reshape(4, 4)
        pred_logits = np.full((10, 2), -5.0)
        pred_logits[:4, 0] = 5.0  # 4 confident lines, 6 background
        dump_benchmark_npz(str(pred_dir), f"img{i}", pred_logits,
                           pred_lines, (h, w))
    scores = sap_score(str(pred_dir), str(gt_dir))
    assert scores[5] > 99.0


def test_postprocess_scales_to_pixels():
    logits = np.zeros((2, 2))
    lines = np.array([[0.5, 0.5, 1.0, 1.0, 0.7, 0.7]] * 2)
    out, scores = postprocess_lines(logits, lines, (200, 100))
    np.testing.assert_allclose(out[0], [50, 100, 100, 200])
    assert scores.shape == (2,)


def test_line_nms_suppresses_duplicates():
    base = np.array([[0.0, 0.0], [100.0, 0.0]])
    lines = np.stack([base, base + [[0, 0.001], [0, 0.001]],
                      [[0, 50], [100, 50]]])
    scores = np.array([0.9, 0.8, 0.7])
    nl, ns, ids = line_nms(lines, scores, threshold=0.01 * 100)
    assert len(nl) == 2
    assert set(ids.tolist()) == {0, 2}


def test_aph_perfect_predictions(tmp_path):
    from gwdepth_tpu.evaluation.line_metrics import aph_score
    rng = np.random.default_rng(5)
    pred_dir = tmp_path / "p"; gt_dir = tmp_path / "g"
    pred_dir.mkdir(); gt_dir.mkdir()
    for i in range(2):
        gt = rng.uniform(10, 118, (5, 2, 2))
        np.savez(gt_dir / f"i{i}.npz", lpos=gt)
        np.savez(pred_dir / f"i{i}.npz", lines=gt.copy(),
                 score=np.linspace(1.0, 0.6, 5))
    s = aph_score(str(pred_dir), str(gt_dir))
    assert s > 95.0
    # degraded: random preds score much lower
    for i in range(2):
        np.savez(pred_dir / f"i{i}.npz",
                 lines=rng.uniform(0, 128, (5, 2, 2)),
                 score=np.linspace(1.0, 0.6, 5))
    s2 = aph_score(str(pred_dir), str(gt_dir))
    assert s2 < s


def test_canvas_norm_dump_roundtrip(tmp_path):
    """GT lines canvas-normalized by the dataset, converted back to the
    image frame by the CLI dump path (main.py --benchmark math), score
    perfect sAP against GT npz in original-image 128-space."""
    from gwdepth_tpu.evaluation import sap_score
    rng = np.random.default_rng(9)
    iw, ih = 96, 72                      # image extent on the canvas
    cw, ch = 128, 128                    # padded canvas
    raw_w, raw_h = 640, 480              # original image
    pred_dir = tmp_path / "pred"; gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for i in range(2):
        # original-pixel GT lines
        px = rng.uniform(20, 600, (5, 2)).astype(np.float64)
        py = rng.uniform(20, 440, (5, 2)).astype(np.float64)
        gt128 = np.stack([py * 128 / raw_h, px * 128 / raw_w], -1)  # (5,2,2) yx
        np.savez(gt_dir / f"i{i}.npz", lpos=gt128)
        # dataset normalization: orig px -> image-norm -> canvas-norm
        img_norm_x, img_norm_y = px / raw_w, py / raw_h
        canvas_x = img_norm_x * (iw / cw)
        canvas_y = img_norm_y * (ih / ch)
        pred_lines = np.zeros((8, 4))
        pred_lines[:5] = np.stack([canvas_x[:, 0], canvas_y[:, 0],
                                   canvas_x[:, 1], canvas_y[:, 1]], -1)
        logits = np.full((8, 2), -4.0)
        logits[:5, 0] = 4.0
        # CLI dump conversion (main.py --benchmark): canvas -> image frame
        lines = pred_lines.copy()
        lines[:, 0::2] *= cw / iw
        lines[:, 1::2] *= ch / ih
        dump_benchmark_npz(str(pred_dir), f"i{i}", logits, lines, (ih, iw))
    scores = sap_score(str(pred_dir), str(gt_dir))
    assert scores[5] > 99.0, scores


def test_pr_curve_and_plot(tmp_path):
    """PR arrays are monotone-recall and the plot writes a png
    (reference: evaluation/eval-aph-post-*.py curve rendering)."""
    from gwdepth_tpu.evaluation.line_metrics import pr_curve, plot_pr_curves
    rng = np.random.default_rng(0)
    pred_dir = tmp_path / "pred"; gt_dir = tmp_path / "gt"
    pred_dir.mkdir(); gt_dir.mkdir()
    gt = rng.uniform(0, 128, (6, 2, 2)).astype(np.float32)
    pred = np.concatenate([gt[:4] + rng.normal(0, 1, (4, 2, 2)),
                           rng.uniform(0, 128, (5, 2, 2))]).astype(np.float32)
    np.savez(pred_dir / "a.npz", lines=pred, score=np.linspace(1, 0.1, 9))
    np.savez(gt_dir / "a.npz", lpos=gt)
    c = pr_curve(str(pred_dir), str(gt_dir), threshold=10)
    assert c["recall"].shape == c["precision"].shape == (9,)
    assert (np.diff(c["recall"]) >= -1e-9).all()
    assert (c["precision"] <= 1.0 + 1e-9).all()
    out = plot_pr_curves({"run0": c}, str(tmp_path / "pr.png"))
    import os
    assert os.path.getsize(out) > 0


def test_aph_pr_curve_outputs(tmp_path):
    """PR-curve tail of the APH pipeline (reference: eval-aph-score-
    glassrgbd.py:104-170): PNG + points npz written, AP^H consistent with
    aph_score, F^H in (0, 1]."""
    from gwdepth_tpu.evaluation.line_metrics import aph_score
    from gwdepth_tpu.utils.visualize import aph_pr_curve
    rng = np.random.default_rng(9)
    pred_dir = tmp_path / "p"; gt_dir = tmp_path / "g"
    pred_dir.mkdir(); gt_dir.mkdir()
    for i in range(2):
        gt = rng.uniform(10, 118, (5, 2, 2))
        np.savez(gt_dir / f"i{i}.npz", lpos=gt)
        # half-right predictions so the sweep has a real PR trade-off
        noisy = np.concatenate([gt[:3], rng.uniform(0, 128, (4, 2, 2))])
        np.savez(pred_dir / f"i{i}.npz", lines=noisy,
                 score=np.linspace(1.0, 0.5, 7))
    res = aph_pr_curve(str(pred_dir), str(gt_dir), str(tmp_path / "out"))
    assert res["aph"] == pytest.approx(
        aph_score(str(pred_dir), str(gt_dir)))
    assert 0.0 < res["fh"] <= 1.0
    import os
    assert os.path.exists(res["png"]) and os.path.getsize(res["png"]) > 1000
    pts = np.load(res["npz"])
    assert pts["precisions"].shape == pts["recalls"].shape == \
        pts["thresholds"].shape == (20,)
    assert float(pts["aph"]) == pytest.approx(res["aph"])
