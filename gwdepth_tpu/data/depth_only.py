"""Depth-only dataset (NYU-V2 / BTS-style filename lists).

The reference's dense branch descends from BTS, whose datasets are
`rgb_path depth_path [focal]` lines in a filenames file (the vestigial
@-file parser in the reference reads exactly these fields,
reference: src/datasets/glassrgbd_norhint.py:38-117 and
script/train/arguments_train_glassrgbd.txt). This dataset serves the
depth-only eval/train path (`with_line=False`, seg ignored): standard
monocular-depth benchmarks run through the same Batch/engine machinery
with zero line/seg supervision.

depth png scale defaults to 1/1000 (mm -> m, NYU/GW-Depth convention).
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import numpy as np
from PIL import Image

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.data.transforms import (
    Sample, train_transform, eval_transform)
from gwdepth_tpu.data.dataset import collate_sample


class DepthOnlyDataset:
    def __init__(self, cfg: GWDepthConfig, root: str, filenames_file: str,
                 split: str = "train", depth_scale: float = 1000.0):
        self.cfg = cfg
        self.root = root
        self.split = split
        self.depth_scale = depth_scale
        with open(filenames_file) as f:
            self.pairs = [ln.split()[:2] for ln in f if ln.strip()]

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int, seed: Optional[int] = None
                    ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rgb_rel, depth_rel = self.pairs[idx]
        from gwdepth_tpu.data.dataset import _open_array, _open_rgb
        image = _open_rgb(os.path.join(self.root, rgb_rel.lstrip("/")))
        depth = _open_array(
            os.path.join(self.root, depth_rel.lstrip("/"))).astype(np.int32)
        h, w = depth.shape[:2]
        s = Sample(image, depth, np.zeros((h, w), np.uint8),
                   np.zeros((0, 4)), np.zeros((0, 2)),
                   np.zeros((0,), np.int64))
        if self.split == "train":
            rng = random.Random(seed if seed is not None
                                else random.getrandbits(32))
            s = train_transform(s, rng, cfg.train_hw)
            canvas = cfg.train_hw
        else:
            s = eval_transform(s, cfg.eval_hw)
            canvas = cfg.eval_hw
        name = os.path.splitext(os.path.basename(rgb_rel))[0]
        out = collate_sample(s, canvas, cfg, name)
        if self.depth_scale != 1000.0:
            # collate divides by 1000; rescale to this dataset's convention
            out["depth"] = out["depth"] * (1000.0 / self.depth_scale)
        return out
