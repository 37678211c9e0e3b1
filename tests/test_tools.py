"""Offline toolchain tests: pinhole project/deproject roundtrip, planar
polygon depth completion recovers the plane, reflection hint sampling."""

import numpy as np

from gwdepth_tpu.tools import (
    Intrinsics, deproject, project, interpolate_side_points,
    complete_polygon_depth, complete_depth,
    reflection_difference, sample_reflection_points)

INTR = Intrinsics(fx=900.0, fy=900.0, ppx=640.0, ppy=360.0,
                  width=1280, height=720)


def test_project_deproject_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 1280, (50, 2))
    d = rng.uniform(0.5, 8.0, 50)
    pts = deproject(px, d, INTR)
    back = project(pts, INTR)
    np.testing.assert_allclose(back, px, atol=1e-6)
    np.testing.assert_allclose(pts[:, 2], d)


def test_side_interpolation_step():
    p1 = np.array([0.0, 0.0, 1.0])
    p2 = np.array([0.0, 0.0, 1.06])   # 60mm apart
    seg = interpolate_side_points(p1, p2, step_mm=6.0)
    # reference placement: inner samples at 1, 7, ..., 55 mm (10 of them)
    # plus both endpoints (inline_points_interpolation :397-420)
    assert len(seg) == 12
    np.testing.assert_allclose(seg[1], [0.0, 0.0, 1.001])
    np.testing.assert_allclose(seg[0], p1)
    np.testing.assert_allclose(seg[-1], p2)


def test_complete_polygon_recovers_plane():
    """Vertices on a fronto-parallel plane at 2m, hole inside -> filled
    region ~2000mm everywhere."""
    h, w = 120, 160
    raw = np.zeros((h, w), np.float32)
    verts = np.array([[30, 20], [130, 20], [130, 100], [30, 100]], float)
    vx, vy = verts[:, 0].astype(int), verts[:, 1].astype(int)
    raw[vy, vx] = 2000.0
    out = complete_polygon_depth(raw, verts, INTR, step_mm=6.0)
    interior = out[40:80, 60:110]
    assert (interior > 0).mean() > 0.95
    vals = interior[interior > 0]
    np.testing.assert_allclose(vals, 2000.0, rtol=0.02)


def test_complete_polygon_slanted_plane():
    """Left edge at 2m, right edge at 3m -> interior interpolates between."""
    h, w = 120, 160
    raw = np.zeros((h, w), np.float32)
    verts = np.array([[20, 20], [140, 20], [140, 100], [20, 100]], float)
    depths = np.array([2000.0, 3000.0, 3000.0, 2000.0])
    out = complete_polygon_depth(raw, verts, INTR, step_mm=6.0,
                                 vertex_depth_mm=depths)
    mid_left = out[60, 30]
    mid_right = out[60, 130]
    assert 1900 < mid_left < 2400
    assert 2600 < mid_right < 3100
    assert mid_right > mid_left + 300


def test_complete_depth_label_driver():
    h, w = 80, 80
    raw = np.zeros((h, w), np.float32)
    raw[10, 10] = raw[10, 60] = raw[60, 60] = raw[60, 10] = 1500.0
    label = {"shapes": [{"points": [[10, 10], [60, 10], [60, 60], [10, 60]],
                         "poly_id": 0}]}
    out = complete_depth(raw, label, INTR)
    assert (out[20:50, 20:50] > 0).mean() > 0.9


def test_reflection_pipeline():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    rr = img.copy()
    rr[5:15, 5:15] = np.clip(rr[5:15, 5:15].astype(int) - 120, 0, 255)
    diff = reflection_difference(img, rr)
    assert diff.dtype == np.uint8 and diff[8, 8].max() > 50
    hints = sample_reflection_points(diff, hint_center_num=5)
    pts = np.array(hints["rhint_points"])
    assert len(pts) >= 1
    assert (pts[:, 0] >= 4).all() and (pts[:, 0] <= 15).all()


# ---------------------------------------------------------------------------
# raw-capture / labeling prep (reference: depth_interpolation/
# raw_preprocess.py, read_binfile.py)
# ---------------------------------------------------------------------------

def test_read_raw_depth_bin_roundtrip(tmp_path):
    from gwdepth_tpu.tools.raw_capture import read_raw_depth
    rng = np.random.default_rng(0)
    depth = rng.integers(0, 8000, (12, 16)).astype("<u2")
    p = tmp_path / "d.bin"
    depth.tofile(p)
    got = read_raw_depth(16, 12, str(p))
    np.testing.assert_array_equal(got, depth)


def test_crop_by_labelme(tmp_path):
    from PIL import Image
    from gwdepth_tpu.tools.raw_capture import crop_by_labelme
    import json as _json
    img = np.zeros((20, 30, 3), np.uint8)
    img[5:11, 8:16] = 200
    Image.fromarray(img).save(tmp_path / "a.png")
    depth = np.arange(20 * 30, dtype=np.uint16).reshape(20, 30)
    np.save(tmp_path / "a.npy", depth)
    label = {"shapes": [
        {"label": "crop", "shape_type": "rectangle",
         "points": [[8, 5], [15, 10]]},
        {"label": "glass", "shape_type": "polygon", "points": [[0, 0]]},
    ]}
    (tmp_path / "a.json").write_text(_json.dumps(label))
    out = tmp_path / "out"
    saved = crop_by_labelme(str(tmp_path / "a.json"), str(tmp_path / "a.png"),
                            str(tmp_path / "a.npy"), str(out))
    assert len(saved) == 1
    cropped = np.asarray(Image.open(saved[0]))
    # inclusive bottom-right corner (reference: raw_preprocess.py:75-76)
    assert cropped.shape == (6, 8, 3)
    assert (cropped == 200).all()
    d = np.load(out / "a.npy")
    np.testing.assert_array_equal(d, depth[5:11, 8:16])


def test_polygon_labels_to_mask(tmp_path):
    import json as _json
    from gwdepth_tpu.tools.raw_capture import polygon_labels_to_mask
    label = {"shapes": [{"label": "glass", "shape_type": "polygon",
                         "points": [[2, 2], [12, 2], [12, 9], [2, 9]]}]}
    p = tmp_path / "l.json"
    p.write_text(_json.dumps(label))
    m = polygon_labels_to_mask(str(p), width=16, height=12)
    assert m.shape == (12, 16) and m.dtype == np.uint8
    assert m[5, 7] == 1 and m[0, 0] == 0 and m[11, 15] == 0


def test_split_train_val(tmp_path):
    from gwdepth_tpu.tools.raw_capture import split_train_val
    imgs = tmp_path / "images"
    imgs.mkdir()
    for i in range(12):
        (imgs / f"im{i:03d}.png").write_bytes(b"")
    t1, v1 = split_train_val(str(imgs), str(tmp_path / "train.txt"),
                             str(tmp_path / "val.txt"), val_ratio=0.25)
    assert (t1, v1) == (9, 3)
    train = (tmp_path / "train.txt").read_text().split()
    val = (tmp_path / "val.txt").read_text().split()
    assert len(set(train) | set(val)) == 12
    assert not set(train) & set(val)
    # deterministic under the same seed
    t2 = (tmp_path / "t2.txt"); v2 = (tmp_path / "v2.txt")
    split_train_val(str(imgs), str(t2), str(v2), val_ratio=0.25)
    assert t2.read_text().split() == train


def test_capture_frames_requires_hardware(tmp_path):
    import pytest as _pytest
    from gwdepth_tpu.tools.raw_capture import capture_frames
    try:
        import pyrealsense2  # noqa: F401
        _pytest.skip("pyrealsense2 present")
    except ImportError:
        pass
    with _pytest.raises(RuntimeError, match="pyrealsense2"):
        capture_frames(str(tmp_path))


def test_sne_normals_matches_torch_oracle():
    """Jittable SNE vs a torch restatement of the reference estimator
    (src/models/sne_model.py:6-90), on a smooth synthetic depth ramp."""
    import jax.numpy as jnp
    from gwdepth_tpu.tools.sne import sne_normals, _DIFF
    torch = __import__("pytest").importorskip("torch")
    import torch.nn.functional as TF

    H, W = 24, 32
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    depth = 2.0 + 0.01 * xx + 0.02 * yy + 0.001 * rng.normal(size=(H, W))
    depth = depth.astype(np.float32)
    cam = np.array([[600.0, 0, W / 2], [0, 610.0, H / 2], [0, 0, 1]],
                   np.float32)

    got = np.asarray(sne_normals(jnp.asarray(depth), jnp.asarray(cam)))

    with torch.no_grad():
        d = torch.from_numpy(depth)
        camt = torch.from_numpy(cam)
        v, u = torch.meshgrid(torch.arange(H), torch.arange(W),
                              indexing="ij")
        v, u = v.float(), u.float()
        Z = d.clone()
        Y = Z * (v - camt[1, 2]) / camt[0, 0]
        X = Z * (u - camt[0, 2]) / camt[0, 0]
        Z[Y <= 0] = 0
        Y[Y <= 0] = 0
        D = 1.0 / Z
        conv = lambda t, k: TF.conv2d(t.view(1, 1, H, W),
                                      torch.from_numpy(k).view(1, 1, 3, 3),
                                      padding=1)[0, 0]
        gx = np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], np.float32)
        gy = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32)
        nx_t = conv(D, gx) * camt[0, 0]
        ny_t = conv(D, gy) * camt[1, 1]
        phi = torch.atan(ny_t / nx_t) + np.pi
        a, b = torch.cos(phi), torch.sin(phi)
        sx = torch.zeros(H, W); sy = torch.zeros(H, W); sz = torch.zeros(H, W)
        for i in range(8):
            X_d = conv(X, _DIFF[i]); Y_d = conv(Y, _DIFF[i])
            Z_d = conv(Z, _DIFF[i])
            nz_i = (nx_t * X_d + ny_t * Y_d) / Z_d
            norm = torch.sqrt(nx_t ** 2 + ny_t ** 2 + nz_i ** 2)
            for s, t in ((sx, nx_t / norm), (sy, ny_t / norm),
                         (sz, nz_i / norm)):
                t = t.clone(); t[torch.isnan(t)] = 0
                s += t
        theta = -torch.atan((sx * a + sy * b) / sz)
        nx = torch.sin(theta) * torch.cos(phi)
        ny = torch.sin(theta) * torch.sin(phi)
        nz = torch.cos(theta)
        nx[torch.isnan(nz)] = 0; ny[torch.isnan(nz)] = 0
        nz[torch.isnan(nz)] = -1
        sign = torch.ones(H, W); sign[ny > 0] = -1
        want = torch.stack([nx * sign, ny * sign, nz * sign]).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # unit norm where defined
    n = np.linalg.norm(got, axis=0)
    assert np.isfinite(got).all()
    assert (np.abs(n[2:-2, 2:-2] - 1.0) < 1e-3).all()


def test_synthetic_dataset_generator(tmp_path):
    """The generator's output must load through the real dataset layer:
    metric depth with holes, binary seg, >=4 lines per panel with centers,
    and panels strictly in front of the background."""
    import json

    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.data.dataset import GlassRGBDDataset
    from gwdepth_tpu.tools.synthetic import generate_dataset

    root = str(tmp_path)
    names = generate_dataset(root, n_train=2, n_val=1,
                             height=120, width=160, seed=3)
    assert len(names) == 3

    cfg = GWDepthConfig(
        eval_hw=(96, 128), train_hw=(96, 128), with_center=True,
        data_path=f"{root}/rgb", gt_depth_path=f"{root}/depth",
        gt_seg_path=f"{root}/seg", gt_line_path=f"{root}/lines",
        filenames_file_train=f"{root}/train.txt",
        filenames_file_eval=f"{root}/val.txt",
        glassrgbd_images_json=f"{root}/glassrgbd_images.json")
    ds = GlassRGBDDataset(cfg, split="val")
    assert len(ds) == 1 and len(ds.id_to_img) == 3
    s, name = ds.load_raw(0)
    depth_m = s.depth / 1000.0
    valid = s.depth > 0
    assert valid.mean() > 0.9                      # holes are sparse
    assert 0.5 < depth_m[valid].min() < 4.0        # a panel in front
    assert depth_m[valid].max() > 4.0              # background behind
    assert set(np.unique(s.seg)) <= {0, 255}
    n_panels = len(json.load(open(f"{root}/lines/{name}.json"))["shapes"])
    assert len(s.lines) == 4 * n_panels            # 4 border lines each
    assert s.centers.shape == (len(s.lines), 2)
    # every line endpoint inside the image
    assert (s.lines[:, 0::2] <= 160).all() and (s.lines >= 0).all()
