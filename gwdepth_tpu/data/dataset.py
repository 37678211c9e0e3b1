"""GW-Depth dataset: host-side decode + augmentation + static-canvas collate.

Re-derivation of the reference's active dataset
(reference: src/datasets/glassrgbd_norhint.py):

- name lists from train.txt / val.txt (:218-224);
- per sample: RGB png, depth png (/1000 -> meters, :273), seg png
  (binarized >0 -> 1, :275), labelme-style polygon json -> closed line
  loops + per-polygon centroids (generate_line_labels :182-211 with
  gen_pairs, src/util/commons.py:28-34);
- `with_center` concatenates the polygon center onto each line -> 6 coords
  (:279-280).

Instead of torch DataLoader + NestedTensor collate (src/util/misc.py:273-280)
this module emits fixed-shape `Batch` pytrees: images zero-padded
bottom-right onto the configured canvas with a validity mask, GT lines
padded to `max_lines` slots with a line mask. A tiny thread prefetcher
overlaps host decode with device steps.
"""

from __future__ import annotations

import json
import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.data.batch import Batch
from gwdepth_tpu.data.transforms import (
    Sample, centroid, train_transform, eval_transform)


def _open_rgb(path: str) -> Image.Image:
    """PNG -> PIL RGB image via the native decoder when built (bit-exact
    with `Image.open(...).convert("RGB")`, tests/test_native_loader.py)."""
    from gwdepth_tpu import native
    if path.endswith(".png") and native.available():
        arr = native.decode_png(path, rgb=True)
        if arr is not None:
            return Image.fromarray(arr)
    return Image.open(path).convert("RGB")


def _open_array(path: str) -> np.ndarray:
    """PNG -> raw numpy array (native fast path; PIL fallback)."""
    from gwdepth_tpu import native
    if path.endswith(".png") and native.available():
        arr = native.decode_png(path, rgb=False)
        if arr is not None:
            return arr
    return np.asarray(Image.open(path))


def gen_pairs(vertices: np.ndarray) -> np.ndarray:
    """Consecutive vertex pairs closing the loop
    (reference: src/util/commons.py:28-34): (N, 2) -> (N, 2, 2)."""
    nxt = np.roll(vertices, -1, axis=0)
    return np.stack([vertices, nxt], axis=1)


def lines_from_polygons(label: Dict) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """labelme dict -> (lines (N,4), centers (N,2), poly_ids (N,))
    (reference: glassrgbd_norhint.py:182-211)."""
    lines, centers, ids = [], [], []
    for poly in label.get("shapes", []):
        pts = poly.get("points", [])
        if len(pts) == 0:
            continue
        pl = gen_pairs(np.asarray(pts, np.float64)).reshape(-1, 4)
        loop_pts = [list(pl[0][:2]), list(pl[0][2:4])] + \
                   [list(l[2:4]) for l in pl[1:]]
        c = centroid(loop_pts)
        for l in pl:
            lines.append(l)
            centers.append(c)
            ids.append(poly.get("poly_id", 0))
    if not lines:
        return (np.zeros((0, 4)), np.zeros((0, 2)), np.zeros((0,), np.int64))
    return (np.asarray(lines, np.float64), np.asarray(centers, np.float64),
            np.asarray(ids, np.int64))


class GlassRGBDDataset:
    """Indexable dataset of augmented, canvas-fitted samples."""

    def __init__(self, cfg: GWDepthConfig, split: str = "train"):
        self.cfg = cfg
        self.split = split
        names_file = (cfg.filenames_file_train if split == "train"
                      else cfg.filenames_file_eval)
        with open(names_file) as f:
            self.names = [ln.split()[0] for ln in f if ln.strip()]
        self.id_to_img = {}
        if cfg.glassrgbd_images_json and os.path.exists(
                cfg.glassrgbd_images_json):
            with open(cfg.glassrgbd_images_json) as f:
                for d in json.load(f).get("images", []):
                    self.id_to_img[d["id"]] = d["file_name"].split(".")[0]

    def __len__(self) -> int:
        return len(self.names)

    def load_raw(self, idx: int) -> Tuple[Sample, str]:
        cfg = self.cfg
        name = self.names[idx]
        image = _open_rgb(os.path.join(cfg.data_path, name + ".png"))
        depth = _open_array(
            os.path.join(cfg.gt_depth_path, name + ".png")).astype(np.int32)
        seg = _open_array(os.path.join(cfg.gt_seg_path, name + ".png"))
        if seg.ndim == 3:
            seg = seg[..., 0]
        with open(os.path.join(cfg.gt_line_path, name + ".json")) as f:
            label = json.load(f)
        lines, centers, ids = lines_from_polygons(label)
        w, h = image.size
        if len(lines):
            # clamp into the image (reference: glassrgbd_norhint.py:143-147)
            lines[:, 0::2] = lines[:, 0::2].clip(0, w)
            lines[:, 1::2] = lines[:, 1::2].clip(0, h)
            centers[:, 0] = centers[:, 0].clip(0, w)
            centers[:, 1] = centers[:, 1].clip(0, h)
        return Sample(image, depth, seg.astype(np.uint8), lines,
                      centers, ids), name

    def load_reflection(self, name: str) -> Optional[np.ndarray]:
        """Reflection-hint points [row, col] json (reference variant:
        src/datasets/glassrgbd_data.py:277-279, flipped to [col, row])."""
        cfg = self.cfg
        if not cfg.with_reflection or not cfg.glassrgbd_rhint_points_path:
            return None
        path = os.path.join(cfg.glassrgbd_rhint_points_path, name + ".json")
        if not os.path.exists(path):
            return np.zeros((0, 2), np.float32)
        with open(path) as f:
            pts = np.asarray(json.load(f).get("rhint_points", []),
                             np.float32).reshape(-1, 2)
        return pts[:, ::-1]  # [row, col] -> [col(x), row(y)]

    def __getitem__(self, idx: int, seed: Optional[int] = None
                    ) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        s, name = self.load_raw(idx)
        if self.split == "train":
            rng = random.Random(seed if seed is not None
                                else random.getrandbits(32))
            s = train_transform(s, rng, cfg.train_hw)
            canvas = cfg.train_hw
        else:
            s = eval_transform(s, cfg.eval_hw)
            canvas = cfg.eval_hw
        out = collate_sample(s, canvas, cfg, name)
        rpts = self.load_reflection(name)
        if rpts is not None:
            # hints stored in ORIGINAL pixel coords -> normalize by the raw
            # extent, then rescale into the canvas frame like the lines
            raw_w, raw_h = Image.open(
                os.path.join(cfg.data_path, name + ".png")).size
            ih, iw = out["orig_hw"]
            ch, cw = canvas
            P = cfg.max_rhint_points
            padded = np.zeros((P, 2), np.float32)
            mask = np.zeros((P,), bool)
            n = min(len(rpts), P)
            if n:
                norm = rpts[:n] / np.array([raw_w, raw_h], np.float32)
                padded[:n] = norm * np.array([iw / cw, ih / ch], np.float32)
                mask[:n] = True
            out["reflection_points"] = padded
            out["reflection_mask"] = mask
        return out


def collate_sample(s: Sample, canvas_hw: Tuple[int, int],
                   cfg: GWDepthConfig, name: str = "") -> Dict[str, np.ndarray]:
    """Pad a normalized sample onto the canvas; depth png units -> meters,
    seg binarized, centers appended to lines when with_center
    (reference: glassrgbd_norhint.py:273-280)."""
    ch, cw = canvas_hw
    h, w = s.image.shape[:2]
    assert h <= ch and w <= cw, (h, w, canvas_hw)
    img = np.zeros((ch, cw, 3), np.float32)
    img[:h, :w] = s.image
    valid = np.zeros((ch, cw), bool)
    valid[:h, :w] = True
    depth = np.zeros((ch, cw), np.float32)
    depth[:h, :w] = s.depth.astype(np.float32) / 1000.0
    seg = np.zeros((ch, cw), np.int32)
    seg[:h, :w] = (s.seg > 0).astype(np.int32)

    T, D = cfg.max_lines, cfg.line_dim
    lines = np.zeros((T, D), np.float32)
    mask = np.zeros((T,), bool)
    n = min(len(s.lines), T)
    if n:
        ln = s.lines[:n].astype(np.float32)
        if cfg.with_center:
            ln = np.concatenate([ln, s.centers[:n].astype(np.float32)], 1)
        # IMAGE-normalized -> CANVAS-normalized. The dense branch samples
        # predicted lines on the padded canvas ([-1,1] over the full map,
        # multiscale_transformerr.py:1174-1175); the reference trains at
        # batch 1 where padding is zero so image==canvas — with a fixed
        # canvas the two frames must be reconciled here or reference points
        # land below/right of the true lines.
        scale = np.array([w / cw, h / ch], np.float32)
        ln = ln * np.tile(scale, D // 2)
        lines[:n] = ln
        mask[:n] = True
    return {"images": img, "valid": valid, "depth": depth, "seg": seg,
            "lines": lines, "line_mask": mask, "name": name,
            "orig_hw": np.array([h, w], np.int32)}


def make_batch(samples: Sequence[Dict[str, np.ndarray]]) -> Batch:
    stack = lambda k: np.stack([s[k] for s in samples])
    return Batch(images=stack("images"), valid=stack("valid"),
                 depth=stack("depth"), seg=stack("seg"),
                 lines=stack("lines"), line_mask=stack("line_mask"))


class Loader:
    """Epoch iterator with a decode thread pool + prefetch queue — the
    DataLoader(num_workers=2) replacement (reference:
    src/main_glassrgbd.py:95). PIL/zlib release the GIL during png decode,
    so threads parallelize the host hot path effectively."""

    def __init__(self, dataset: GlassRGBDDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, num_workers: int = 4,
                 pad_to_batch: bool = False):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        # pad a short final batch with all-invalid dummy images so every
        # batch has a static shape (required for jit and mesh sharding);
        # padded entries carry an all-False validity mask, which every eval
        # accumulator treats as "not an image" (train_step.py img_ok)
        self.pad_to_batch = pad_to_batch

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[Batch, List[str]]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        # multi-host: each process reads its own shard — the
        # DistributedSampler equivalent (reference: main_glassrgbd.py:86-88)
        import jax
        if jax.process_count() > 1:
            order = order[jax.process_index()::jax.process_count()]
        nb = len(order) // self.bs if self.drop_last else -(-len(order) // self.bs)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        from concurrent.futures import ThreadPoolExecutor

        def worker():
            import collections
            # num_workers=0 means "load in the caller" in the reference's
            # DataLoader; the threaded equivalent is a 1-thread pool
            # (ThreadPoolExecutor(0) raises).
            with ThreadPoolExecutor(max(1, self.num_workers)) as pool:
                pending: "collections.deque" = collections.deque()
                bi = 0
                while bi < nb or pending:
                    # sliding submit window bounds decoded-ahead memory
                    while bi < nb and len(pending) <= self.prefetch:
                        idxs = order[bi * self.bs:(bi + 1) * self.bs]
                        pending.append([
                            pool.submit(self.ds.__getitem__, int(i))
                            for i in idxs])
                        bi += 1
                    fs = pending.popleft()
                    samples = [f.result() for f in fs]
                    names = [s["name"] for s in samples]
                    if self.pad_to_batch and len(samples) < self.bs:
                        pad = {k: np.zeros_like(v) for k, v in
                               samples[0].items()
                               if isinstance(v, np.ndarray)}
                        pad["name"] = ""
                        samples += [pad] * (self.bs - len(samples))
                    q.put((make_batch(samples), names))
            q.put(None)

        def worker_guard():
            # any worker exception must reach the consumer — a dead worker
            # that never enqueues its sentinel hangs q.get() forever
            # (observed: ThreadPoolExecutor(0) raising at thread start left
            # a training run blocked indefinitely)
            try:
                worker()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)

        t = threading.Thread(target=worker_guard, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
