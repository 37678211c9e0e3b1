"""End-to-end dataset parity: the real reference DataLoadPreprocess vs
our GlassRGBDDataset on the same on-disk files.

Builds a tiny GW-Depth-format dataset (RGB png + uint16 depth png + seg
png + labelme polygon json + name list + images json), loads item 0
through the ACTUAL reference pipeline
(/root/reference/src/datasets/glassrgbd_norhint.py build('val') with
make_coco_transforms eval protocol: long side 1024) and through ours, and
asserts the normalized image, metric depth, binarized seg, and 6-dim
normalized lines+centers agree.

The image is 1280x720 (the GW-Depth capture size): the protocol resize
gives 1024x576 on both sides, which exactly fills our (576, 1024) canvas,
so no padding is involved and coordinates are directly comparable
(collate's image->canvas rescale is a no-op).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
import torch
from PIL import Image

from reference_harness import get_ref_data, make_ref_args

from gwdepth_tpu.config import GWDepthConfig


@pytest.fixture(scope="module")
def refd():
    return get_ref_data()


def _write_dataset(root) -> str:
    rng = np.random.default_rng(43)
    H, W = 720, 1280
    name = "20220101_000000_0"
    for sub in ("images", "depth", "seg", "lines"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
                    "RGB").save(os.path.join(root, "images", name + ".png"))
    depth = rng.integers(400, 9500, (H, W)).astype(np.uint16)
    Image.fromarray(depth).save(os.path.join(root, "depth", name + ".png"))
    seg = (rng.random((H, W)) > 0.5).astype(np.uint8) * 255
    Image.fromarray(seg, "L").save(os.path.join(root, "seg", name + ".png"))

    shapes = []
    for pid, (cx, cy, rad, k) in enumerate([(400, 300, 200, 5),
                                            (900, 420, 150, 4)]):
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], -1)
        shapes.append({"points": pts.tolist(), "poly_id": pid,
                       "label": "wall"})
    label = {"shapes": shapes, "imageWidth": W, "imageHeight": H,
             "imageId": 1}
    with open(os.path.join(root, "lines", name + ".json"), "w") as f:
        json.dump(label, f)
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write(name + "\n")
    with open(os.path.join(root, "glassrgbd_images.json"), "w") as f:
        json.dump({"images": [{"id": 1, "file_name": name + ".png"}]}, f)
    return name


def test_dataset_eval_item_vs_reference(refd, tmp_path):
    root = str(tmp_path)
    _write_dataset(root)

    cfg = GWDepthConfig(
        eval_hw=(576, 1024), with_center=True, max_lines=16,
        data_path=os.path.join(root, "images"),
        gt_depth_path=os.path.join(root, "depth"),
        gt_seg_path=os.path.join(root, "seg"),
        gt_line_path=os.path.join(root, "lines"),
        filenames_file_eval=os.path.join(root, "val.txt"),
        glassrgbd_images_json=os.path.join(root, "glassrgbd_images.json"))

    args = make_ref_args(
        cfg, eval=True,
        data_path=cfg.data_path, gt_depth_path=cfg.gt_depth_path,
        gt_seg_path=cfg.gt_seg_path, gt_line_path=cfg.gt_line_path,
        filenames_file_eval=cfg.filenames_file_eval,
        glassrgbd_images_json=cfg.glassrgbd_images_json)
    ref_ds = refd.glassrgbd_norhint.build("val", args)
    img_t, depth_t, seg_t, tgt_t, name_t = ref_ds[0]

    from gwdepth_tpu.data.dataset import GlassRGBDDataset
    my_ds = GlassRGBDDataset(cfg, split="val")
    item = my_ds[0]

    assert item["name"] == name_t
    np.testing.assert_array_equal(item["orig_hw"], [576, 1024])
    np.testing.assert_allclose(item["images"].transpose(2, 0, 1),
                               img_t.numpy(), atol=1e-5, err_msg="image")
    np.testing.assert_allclose(item["depth"], depth_t.numpy()[0],
                               atol=1e-5, err_msg="metric depth")
    np.testing.assert_array_equal(item["seg"], seg_t.numpy()[0],
                                  err_msg="binarized seg")
    n = int(item["line_mask"].sum())
    assert n == tgt_t["lines"].shape[0] == 9
    np.testing.assert_allclose(item["lines"][:n], tgt_t["lines"].numpy(),
                               atol=1e-6, err_msg="normalized lines+centers")
