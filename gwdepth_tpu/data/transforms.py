"""Host-side joint augmentations: image + lines + centers + depth/seg.

Numpy/PIL re-derivation of the reference's joint transform suite
(reference: src/datasets/transforms_depth.py): every geometric op moves the
image, the line endpoints, the per-polygon centers AND the aux depth/seg
maps together. Kept semantics:

- crop removes lines fully outside and clamps partially-outside lines along
  their slope (transforms_depth.py:95-129); polygon centers are recomputed
  from the surviving lines, or from the shapely intersection of the crop
  rectangle with the original polygon when <=3 lines survive (:140-172).
- hflip swaps endpoint order so the left point stays first (:206-221);
  vflip re-orders only vertical lines (:234-250).
- resize scales lines/centers by the actual PIL ratio; aux maps use NEAREST
  (:319-372).
- ColorJitter(0.4) applies brightness/contrast/saturation/hue in a random
  order (:548-600); Normalize divides coords by (w, h) into [0, 1]
  (:631-659) after ImageNet-style channel normalization with the GW-Depth
  stats (src/datasets/coco.py:76-78).

TPU deviation (by design, not accident): the reference feeds variable-size
images into NestedTensor padding; XLA needs static shapes, so the pipeline
ends with `fit_canvas` — scale down (if needed) to fit the fixed train/eval
canvas, then zero-pad bottom-right and emit a validity mask.

All functions take/return a `Sample` of numpy arrays; images are uint8 HWC
until `normalize`.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance

# GW-Depth channel stats (reference: src/datasets/coco.py:77)
MEAN = np.array([0.538, 0.494, 0.453], np.float32)
STD = np.array([0.257, 0.263, 0.273], np.float32)


@dataclasses.dataclass
class Sample:
    """image: PIL (until normalize) | float32 HWC; depth: (H, W) float32
    (millimeters until final /1000); seg: (H, W) uint8/int; lines: (N, 4)
    float [x1 y1 x2 y2] pixels; centers: (N, 2) float pixels; poly_ids:
    (N,) int."""
    image: object
    depth: np.ndarray
    seg: np.ndarray
    lines: np.ndarray
    centers: np.ndarray
    poly_ids: np.ndarray

    def copy(self) -> "Sample":
        return Sample(self.image, self.depth.copy(), self.seg.copy(),
                      self.lines.copy(), self.centers.copy(),
                      self.poly_ids.copy())


def centroid(points: Sequence[Sequence[float]]) -> Tuple[float, float]:
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return sum(xs) / len(xs), sum(ys) / len(ys)


def polygon_points(lines: np.ndarray) -> List[List[float]]:
    """Vertices from the closed line loop: first line's two endpoints plus
    every later line's second endpoint (reference:
    glassrgbd_norhint.py:193-194)."""
    pts = [list(lines[0][:2]), list(lines[0][2:4])]
    pts += [list(l[2:4]) for l in lines[1:]]
    return pts


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------

def hflip(s: Sample) -> Sample:
    s = s.copy()
    w = s.image.size[0]
    s.image = s.image.transpose(Image.FLIP_LEFT_RIGHT)
    s.depth = s.depth[:, ::-1].copy()
    s.seg = s.seg[:, ::-1].copy()
    if len(s.lines):
        # swap endpoints and mirror x (transforms_depth.py:215)
        s.lines = s.lines[:, [2, 3, 0, 1]] * np.array([-1, 1, -1, 1]) \
            + np.array([w, 0, w, 0])
        s.centers = s.centers * np.array([-1, 1]) + np.array([w, 0])
    return s


def vflip(s: Sample) -> Sample:
    s = s.copy()
    h = s.image.size[1]
    s.image = s.image.transpose(Image.FLIP_TOP_BOTTOM)
    s.depth = s.depth[::-1].copy()
    s.seg = s.seg[::-1].copy()
    if len(s.lines):
        lines = s.lines * np.array([1, -1, 1, -1]) + np.array([0, h, 0, h])
        vert = lines[:, 0] == lines[:, 2]
        lines[vert] = lines[vert][:, [2, 3, 0, 1]]
        s.lines = lines
        s.centers = s.centers * np.array([1, -1]) + np.array([0, h])
    return s


def _get_resize_hw(wh: Tuple[int, int], size, max_size=None) -> Tuple[int, int]:
    """(reference: transforms_depth.py:321-346)."""
    if isinstance(size, (list, tuple)):
        return size[1], size[0]
    w, h = wh
    if max_size is not None:
        mn, mx = float(min(w, h)), float(max(w, h))
        if mx / mn * size > max_size:
            size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


def _pil_nearest_idx(n_in: int, n_out: int) -> np.ndarray:
    """Source indices PIL NEAREST resize picks for each output position.

    Pillow routes NEAREST through ImagingScaleAffine (Geometry.c): the
    source coordinate starts at scale*0.5 and is advanced by sequential
    double ADDITION per pixel, then truncated. np.add.accumulate replays
    the same fl-add chain bit-for-bit (verified in
    tests/test_native_loader.py against PIL across sizes/dtypes)."""
    a = n_in / n_out
    steps = np.full(n_out, a, np.float64)
    steps[0] = a * 0.5
    return np.clip(np.add.accumulate(steps).astype(np.int64), 0, n_in - 1)


def resize(s: Sample, size, max_size=None) -> Sample:
    s = s.copy()
    oh, ow = _get_resize_hw(s.image.size, size, max_size)
    w0, h0 = s.image.size

    from gwdepth_tpu import native
    fast = not os.environ.get("GWDEPTH_NO_NATIVE")
    img = None
    if fast and native.available() and s.image.mode == "RGB":
        # PIL-bit-exact native bilinear (tests/test_native_loader.py)
        img = native.resize_bilinear_rgb8(np.asarray(s.image), oh, ow)
    s.image = (Image.fromarray(img) if img is not None
               else s.image.resize((ow, oh), Image.BILINEAR))
    rw, rh = ow / w0, oh / h0
    if len(s.lines):
        s.lines = s.lines * np.array([rw, rh, rw, rh])
        s.centers = s.centers * np.array([rw, rh])
    if fast:
        # numpy replay of PIL NEAREST (bit-exact, see _pil_nearest_idx)
        yi = _pil_nearest_idx(h0, oh)
        xi = _pil_nearest_idx(w0, ow)
        s.depth = np.ascontiguousarray(s.depth[yi][:, xi])
        s.seg = np.ascontiguousarray(s.seg[yi][:, xi])
    else:
        s.depth = np.asarray(
            Image.fromarray(s.depth).resize((ow, oh), Image.NEAREST))
        s.seg = np.asarray(
            Image.fromarray(s.seg).resize((ow, oh), Image.NEAREST))
    return s


def crop(s: Sample, top: int, left: int, h: int, w: int) -> Sample:
    """(reference: transforms_depth.py:59-203)."""
    s = s.copy()
    i, j = top, left
    s.image = s.image.crop((j, i, j + w, i + h))
    s.depth = s.depth[i:i + h, j:j + w]
    s.seg = s.seg[i:i + h, j:j + w]
    if not len(s.lines):
        return s

    src_lines = s.lines.copy()
    src_ids = s.poly_ids.copy()
    lines = s.lines - np.array([j, i, j, i], np.float64)
    rm_x = ((lines[:, 0] < 0) & (lines[:, 2] < 0)) | \
           ((lines[:, 0] > w) & (lines[:, 2] > w))
    rm_y = ((lines[:, 1] < 0) & (lines[:, 3] < 0)) | \
           ((lines[:, 1] > h) & (lines[:, 3] > h))
    keep = ~(rm_x | rm_y)
    lines = lines[keep]

    eps = 1e-12
    clamped = np.zeros_like(lines)
    for n, (x1, y1, x2, y2) in enumerate(lines):
        slope = (y2 - y1) / (x2 - x1 + eps)
        if x1 < 0:
            x1 = 0.0
            y1 = y2 + (x1 - x2) * slope
        if y1 < 0:
            y1 = 0.0
            x1 = x2 - (y2 - y1) / slope
        if x2 > w:
            x2 = float(w)
            y2 = y1 + (x2 - x1) * slope
        if y2 > h:
            y2 = float(h)
            x2 = x1 + (y2 - y1) / slope
        if x2 < 0:
            x2 = 0.0
            y2 = y1 + (x2 - x1) * slope
        if y2 < 0:
            y2 = 0.0
            x2 = x1 - (y1 - y2) / slope
        if x1 > w:
            x1 = float(w)
            y1 = y2 + (x1 - x2) * slope
        if y1 > h:
            y1 = float(h)
            x1 = x2 + (y1 - y2) / slope
        clamped[n] = [x1, y1, x2, y2]
    clamped[:, 0::2] = clamped[:, 0::2].clip(0, w)
    clamped[:, 1::2] = clamped[:, 1::2].clip(0, h)

    ids = s.poly_ids[keep]
    centers = np.zeros((keep.sum(), 2))
    # the reference detects a prior hflip by checking the endpoint ordering
    # of the first two lines (transforms_depth.py:139-141)
    hflipped = (len(src_lines) > 1
                and src_lines[0, 0] == src_lines[1, 2]
                and src_lines[0, 1] == src_lines[1, 3])

    def loop_points(ls):
        ls = ls.reshape(-1, 2, 2)[:, ::-1].reshape(-1, 4) if hflipped else ls
        return polygon_points(ls)

    for pid in np.unique(ids):
        sel = ids == pid
        py_lines = clamped[sel]
        if sel.sum() > 3:
            centers[sel] = centroid(loop_points(py_lines))
        else:
            # intersect the crop rect with the ORIGINAL polygon
            # (transforms_depth.py:155-172)
            new_c = None
            try:
                from shapely.geometry import Polygon
                rect = Polygon([(j, i), (j, i + h - 1),
                                (j + w - 1, i + h - 1), (j + w - 1, i)])
                poly = Polygon(loop_points(src_lines[src_ids == pid]))
                inter = rect.intersection(poly)
                if inter.geom_type == "Polygon" and not inter.is_empty \
                        and len(inter.exterior.coords) > 1:
                    cx, cy = centroid(list(inter.exterior.coords))
                    new_c = np.clip([cx - j, cy - i], 0, [w, h])
            except Exception:
                new_c = None
            centers[sel] = (new_c if new_c is not None
                            else centroid(loop_points(py_lines)))

    s.lines = clamped
    s.centers = centers
    s.poly_ids = ids
    return s


# ---------------------------------------------------------------------------
# photometric ops
# ---------------------------------------------------------------------------

def adjust_hue(img: Image.Image, factor: float,
               shift: int = None) -> Image.Image:
    """torchvision-equivalent hue rotation via the HSV channel. `shift`
    (integer uint8 steps) takes precedence over `factor` when given."""
    if img.mode != "RGB":
        return img
    if shift is None:
        shift = int(factor * 255)
    h, sat, v = img.convert("HSV").split()
    np_h = np.asarray(h, np.uint8)
    np_h = (np_h.astype(np.int16) + shift) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    return Image.merge("HSV", (h, sat, v)).convert("RGB")


def color_jitter(img: Image.Image, rng: random.Random,
                 strength: float = 0.4) -> Image.Image:
    """Brightness/contrast/saturation/hue, random order, factors
    U(1-s, 1+s) (hue U(-s, s)) — reference ColorJitter(0.4)
    (transforms_depth.py:548-600, coco.py:96).

    Runs the fused native kernel when built (bit-exact with the PIL chain
    below, tests/test_native_loader.py); the factor draw order is identical
    on both paths so seeded pipelines agree everywhere."""
    ops = list(range(4))
    rng.shuffle(ops)
    factors = []
    for op in ops:
        f = rng.uniform(1 - strength, 1 + strength)
        factors.append(int(rng.uniform(-strength, strength) * 255)
                       if op == 3 else f)

    from gwdepth_tpu import native
    if native.available() and img.mode == "RGB":
        out = native.color_jitter(np.asarray(img), ops, factors)
        if out is not None:
            return Image.fromarray(out)

    for op, f in zip(ops, factors):
        if op == 0:
            img = ImageEnhance.Brightness(img).enhance(f)
        elif op == 1:
            img = ImageEnhance.Contrast(img).enhance(f)
        elif op == 2:
            img = ImageEnhance.Color(img).enhance(f)
        else:
            img = adjust_hue(img, 0.0, shift=f)
    return img


def normalize(s: Sample) -> Sample:
    """to float, channel-normalize, coords -> [0, 1]
    (transforms_depth.py:631-659)."""
    s = s.copy()
    from gwdepth_tpu import native
    img = None
    if native.available() and getattr(s.image, "mode", None) == "RGB":
        # fused single-pass (u8/255 - mean)/std — float32 op-for-op with
        # the numpy expression below (tests/test_native_loader.py)
        u8 = np.asarray(s.image)
        img = native.normalize_pad(u8, u8.shape[:2], MEAN, STD)
    if img is None:
        img = np.asarray(s.image, np.float32) / 255.0
        img = (img - MEAN) / STD
    h, w = img.shape[:2]
    s.image = img
    if len(s.lines):
        s.lines = s.lines / np.array([w, h, w, h], np.float64)
        s.centers = s.centers / np.array([w, h], np.float64)
    return s


# ---------------------------------------------------------------------------
# canvas fitting (TPU static-shape contract)
# ---------------------------------------------------------------------------

def fit_canvas(s: Sample, canvas_hw: Tuple[int, int]) -> Sample:
    """Scale down (only) so the image fits the canvas. Call BEFORE
    normalize. Padding happens at collate time."""
    w, h = s.image.size
    ch, cw = canvas_hw
    scale = min(ch / h, cw / w, 1.0)
    if scale < 1.0:
        return resize(s, (max(1, int(w * scale)), max(1, int(h * scale))))
    return s


# ---------------------------------------------------------------------------
# composed pipelines (reference: src/datasets/coco.py:74-117)
# ---------------------------------------------------------------------------

TRAIN_SCALES = (480, 512, 544, 576, 608, 640, 672, 680, 690, 704,
                736, 768, 788, 800)


def train_transform(s: Sample, rng: random.Random,
                    canvas_hw: Tuple[int, int],
                    max_size: int = 1024) -> Sample:
    if rng.random() < 0.5:
        s = hflip(s) if rng.random() < 0.5 else s
    else:
        s = vflip(s) if rng.random() < 0.5 else s

    if rng.random() < 0.5:
        s = resize(s, rng.choice(TRAIN_SCALES), max_size)
    else:
        s = resize(s, rng.choice((400, 500, 600)))
        w, h = s.image.size
        cw = rng.randint(384, min(w, 600))
        ch = rng.randint(384, min(h, 600))
        top = rng.randint(0, h - ch)
        left = rng.randint(0, w - cw)
        s = crop(s, top, left, ch, cw)
        s = resize(s, rng.choice(TRAIN_SCALES), max_size)

    s.image = color_jitter(s.image, rng)
    s = fit_canvas(s, canvas_hw)
    return normalize(s)


def eval_transform(s: Sample, canvas_hw: Tuple[int, int],
                   test_size: int = 1024, max_size: int = 1024,
                   strict_protocol: bool = True) -> Sample:
    """Eval protocol: long side resized to `test_size`
    (reference: src/datasets/coco.py:84-91), fitted onto the static canvas.

    The reference imposes no orientation constraint, so a PORTRAIT image
    resized to 1024-tall would silently shrink below protocol on a
    768x1024 canvas; `strict_protocol` turns that silent violation into a
    loud error (pick --eval_h/--eval_w that hold the resized image).
    GW-Depth itself is all-landscape (1280x720 captures), so real data
    never trips this. predict.py passes strict_protocol=False: arbitrary
    inference inputs may be any orientation, and best-effort fitting is
    the desired behavior there."""
    s = resize(s, test_size, max_size)
    if strict_protocol:
        w, h = s.image.size
        ch, cw = canvas_hw
        # flag only ORIENTATION-induced violations: a small canvas with a
        # matching orientation (tiny/toy configs) is a deliberate scale-down,
        # but a portrait image on a landscape canvas silently breaks the
        # protocol no matter how large the canvas is
        if (h > ch or w > cw) and (h > w) != (ch > cw):
            raise ValueError(
                f"eval canvas (h, w)={canvas_hw} cannot hold the "
                f"protocol-resized image (h, w)=({h}, {w}) — portrait "
                f"input? Use an eval canvas that fits the "
                f"long-side-{test_size} resize, e.g. --eval_h {h} "
                f"--eval_w {w} (reference protocol: coco.py:84-91)")
    s = fit_canvas(s, canvas_hw)
    return normalize(s)
