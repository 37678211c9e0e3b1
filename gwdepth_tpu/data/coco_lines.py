"""COCO-format line dataset (wireframe / YorkUrban LETR benchmarks).

Re-derivation of the reference's legacy line-only path
(reference: src/datasets/coco.py:15-73): `lines_{split}2017.json` holds COCO
images + annotations where each annotation's "line" is [x, y, dx, dy]
(offset form, converted to xyxy at :45). Produces the same static-canvas
sample dicts as the GW-Depth dataset (zero depth/seg), so the line branch
trains/evals on wireframe data with the same Batch/engine machinery."""

from __future__ import annotations

import json
import os
import random
from typing import Dict, Optional

import numpy as np
from PIL import Image

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.data.transforms import (
    Sample, train_transform, eval_transform)
from gwdepth_tpu.data.dataset import collate_sample


class CocoLinesDataset:
    def __init__(self, cfg: GWDepthConfig, img_folder: str, ann_file: str,
                 split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.img_folder = img_folder
        with open(ann_file) as f:
            data = json.load(f)
        self.images = {im["id"]: im for im in data["images"]}
        self.anns: Dict[int, list] = {im_id: [] for im_id in self.images}
        for ann in data.get("annotations", []):
            if ann["image_id"] in self.anns:
                self.anns[ann["image_id"]].append(ann)
        self.ids = sorted(self.images)

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int, seed: Optional[int] = None
                    ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        im_id = self.ids[idx]
        info = self.images[im_id]
        from gwdepth_tpu.data.dataset import _open_rgb
        image = _open_rgb(os.path.join(self.img_folder,
                                       info["file_name"]))
        w, h = image.size
        lines = np.asarray([a["line"] for a in self.anns[im_id]],
                           np.float64).reshape(-1, 4)
        # offset form -> endpoints (reference: coco.py:45)
        lines[:, 2:] += lines[:, :2]
        lines[:, 0::2] = lines[:, 0::2].clip(0, w)
        lines[:, 1::2] = lines[:, 1::2].clip(0, h)
        mids = (lines[:, :2] + lines[:, 2:]) / 2.0   # center slot = midpoint
        zeros2d = np.zeros((h, w), np.int32)
        s = Sample(image, zeros2d, zeros2d.astype(np.uint8), lines, mids,
                   np.arange(len(lines)))
        if self.split == "train":
            rng = random.Random(seed if seed is not None
                                else random.getrandbits(32))
            s = train_transform(s, rng, cfg.train_hw)
            canvas = cfg.train_hw
        else:
            s = eval_transform(s, cfg.eval_hw)
            canvas = cfg.eval_hw
        name = os.path.splitext(info["file_name"])[0]
        return collate_sample(s, canvas, cfg, name)
