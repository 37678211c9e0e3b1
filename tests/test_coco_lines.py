"""COCO-lines legacy dataset tests (wireframe/york benchmark path)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.data.coco_lines import CocoLinesDataset


@pytest.fixture()
def coco_dir(tmp_path):
    os.makedirs(tmp_path / "imgs")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        name = f"{i:08d}.png"
        w, h = 128, 96
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            tmp_path / "imgs" / name)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for j in range(4):
            x, y = rng.uniform(5, 60, 2)
            annotations.append({"image_id": i, "category_id": 0,
                                "line": [float(x), float(y), 30.0, 20.0],
                                "area": 1, "iscrowd": 0})
    ann = {"images": images, "annotations": annotations}
    with open(tmp_path / "lines_train2017.json", "w") as f:
        json.dump(ann, f)
    return tmp_path


def test_coco_lines_dataset(coco_dir):
    cfg = tiny_test_config(train_hw=(96, 128), eval_hw=(96, 128))
    ds = CocoLinesDataset(cfg, str(coco_dir / "imgs"),
                          str(coco_dir / "lines_train2017.json"), "val")
    assert len(ds) == 3
    item = ds[0]
    assert item["images"].shape == (96, 128, 3)
    assert item["line_mask"].sum() == 4
    lines = item["lines"][item["line_mask"]]
    assert lines.min() >= 0 and lines.max() <= 1
    # depth/seg are empty placeholders for the line-only path
    assert item["depth"].max() == 0
    ds_train = CocoLinesDataset(cfg, str(coco_dir / "imgs"),
                                str(coco_dir / "lines_train2017.json"),
                                "train")
    item2 = ds_train.__getitem__(1, seed=3)
    assert item2["images"].shape == (96, 128, 3)
