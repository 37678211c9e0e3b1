"""Offline prediction-comparison tools (SURVEY §2.7; VERDICT r4 #5).

Oracle checks: resize_nearest vs torch.nn.functional.interpolate (the
exact call the reference uses, depth_pred_comparison.py:24-28), RMSE and
log-format vs hand-computed values, and the eval_wogt listing contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import torch
from PIL import Image

from gwdepth_tpu.tools.pred_compare import (compare_depth_predictions,
                                            compute_rmse, id_to_image,
                                            resize_nearest, vis_depth_jet)


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(5)
    for (H, W), (h, w) in [((720, 1280), (360, 512)), ((64, 96), (100, 50)),
                           ((33, 47), (33, 47))]:
        x = rng.uniform(0, 9000, (H, W)).astype(np.float32)
        ours = resize_nearest(x, h, w)
        ref = torch.nn.functional.interpolate(
            torch.tensor(x)[None, None], size=[h, w],
            mode="nearest")[0, 0].numpy()
        np.testing.assert_array_equal(ours, ref, err_msg=f"{(H, W)}->{(h, w)}")


def test_compare_depth_predictions(tmp_path):
    rng = np.random.default_rng(7)
    h, w = 60, 80
    gt_dir = tmp_path / "gt"
    dirs = {"ours": tmp_path / "ours", "other": tmp_path / "other"}
    os.makedirs(gt_dir)
    for d in dirs.values():
        os.makedirs(d)
    expected = {"ours": [], "other": []}
    for i in range(3):
        gt_m = rng.uniform(1.0, 8.0, (h, w)).astype(np.float32)
        gt_mm = np.round(gt_m * 1000).astype(np.uint16)
        Image.fromarray(gt_mm, mode="I;16").save(gt_dir / f"s{i}.png")
        gt_back = gt_mm.astype(np.float32) / 1000.0
        ours = gt_back + rng.normal(0, 0.05, (h, w)).astype(np.float32)
        other = gt_back + rng.normal(0, 0.3, (h, w)).astype(np.float32)
        np.save(dirs["ours"] / f"s{i}.npy", ours)
        np.save(dirs["other"] / f"s{i}.npy", other)
        expected["ours"].append(compute_rmse(gt_back, ours))
        expected["other"].append(compute_rmse(gt_back, other))

    save = tmp_path / "cmp"
    means = compare_depth_predictions(
        {k: str(v) for k, v in dirs.items()}, str(gt_dir), str(save))
    np.testing.assert_allclose(means["ours"], np.mean(expected["ours"]),
                               rtol=1e-5)
    np.testing.assert_allclose(means["other"], np.mean(expected["other"]),
                               rtol=1e-5)
    assert means["ours"] < means["other"]

    # reference rmse_log.txt line format: "name, m1:x.xxx, m2:y.yyy"
    lines = (save / "rmse_log.txt").read_text().strip().splitlines()
    assert len(lines) == 3
    name, o, t = lines[0].split(", ")
    assert name == "s0" and o.startswith("ours:") and \
        t.startswith("other:")
    np.testing.assert_allclose(float(o.split(":")[1]), expected["ours"][0],
                               atol=5e-4)

    # vis outputs: per-method depth + gt + error maps
    for m in ("ours", "other", "gt"):
        assert (save / m / "s0.png").exists(), m
    assert (save / "ours" / "error-em3.0-jet" / "s1.png").exists()
    img = np.asarray(Image.open(save / "gt" / "s0.png"))
    assert img.shape == (h, w, 3) and img.dtype == np.uint8


def test_vis_depth_jet_contract():
    d = np.array([[0.0, 5.0, 10.0, 20.0]])
    out = vis_depth_jet(d)
    assert out.shape == (1, 4, 3) and out.dtype == np.uint8
    # cv2 JET: 0 m -> dark blue (high B), ~10 m (index 255) -> dark red
    assert out[0, 0, 2] > 100 and out[0, 0, 0] < 50      # blue at 0 m
    assert out[0, 2, 0] > 100 and out[0, 2, 2] < 50      # red at 10 m
    assert (out[0, 3] == out[0, 2]).all()                # clips beyond


def test_id_to_image(tmp_path):
    imgs = tmp_path / "imgs"
    os.makedirs(imgs)
    for n in ("b.png", "a.png", "c.png"):
        (imgs / n).touch()
    save_file = tmp_path / "out" / "id_to_image.json"
    txt = id_to_image(str(imgs), str(save_file))
    with open(save_file) as f:
        mapping = json.load(f)
    assert sorted(mapping.values()) == ["a.png", "b.png", "c.png"]
    assert os.path.basename(txt) == "eval_nogt_3.txt"
    names = open(txt).read().split()
    assert names == [v.split(".")[0] for v in mapping.values()]
