"""GT-free inference CLI (gwdepth_tpu/predict.py): eval-protocol
preprocessing, jitted forward, original-resolution outputs."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    from gwdepth_tpu import predict
    d = tmp_path_factory.mktemp("pred")
    imgs = d / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for n, size in (("a", (120, 90)), ("b", (80, 100))):
        Image.fromarray(rng.integers(0, 255, (size[1], size[0], 3))
                        .astype(np.uint8)).save(imgs / f"{n}.png")
    out = d / "out"
    predict.main(["--images", str(imgs), "--output_dir", str(out),
                  "--tiny", "--save_vis", "--score", "0.0"])
    return out


def test_predict_outputs_original_resolution(outputs):
    depth = np.load(outputs / "a_depth.npy")
    assert depth.shape == (90, 120) and depth.dtype == np.float32
    assert np.isfinite(depth).all() and (depth >= 0).all()
    dp = np.asarray(Image.open(outputs / "a_depth.png"))
    assert dp.dtype == np.uint16 and dp.shape == (90, 120)
    # png is millimeters of the npy meters
    np.testing.assert_allclose(dp, (depth * 1000).astype(np.uint16))
    seg = np.asarray(Image.open(outputs / "b_seg.png"))
    assert seg.shape == (100, 80) and set(np.unique(seg)) <= {0, 255}


def test_predict_lines_json_in_original_pixels(outputs):
    rec = json.loads((outputs / "a_lines.json").read_text())
    assert rec["image"] == "a.png"
    ln = np.asarray(rec["lines"], np.float64)
    assert ln.ndim == 2 and ln.shape[1] == 4      # score 0.0 keeps all
    assert len(rec["scores"]) == len(ln)
    assert (ln >= -1).all() and (ln[:, 0::2] <= 121).all() \
        and (ln[:, 1::2] <= 91).all()
    assert (outputs / "a_vis.png").exists()


def test_predict_batched_matches_single(tmp_path):
    """--batch N produces the same outputs as batch 1 (tail padded by
    repetition, per-image post unchanged)."""
    from gwdepth_tpu import predict
    rng = np.random.default_rng(2)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for n in ("p", "q", "r"):
        Image.fromarray(rng.integers(0, 255, (60, 70, 3))
                        .astype(np.uint8)).save(imgs / f"{n}.png")
    out1 = tmp_path / "o1"
    outb = tmp_path / "ob"
    predict.main(["--images", str(imgs), "--output_dir", str(out1),
                  "--tiny", "--score", "0.5"])
    predict.main(["--images", str(imgs), "--output_dir", str(outb),
                  "--tiny", "--score", "0.5", "--batch", "2"])
    for n in ("p", "q", "r"):
        a = np.load(out1 / f"{n}_depth.npy")
        b = np.load(outb / f"{n}_depth.npy")
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_predict_mesh_serving_matches_single(tmp_path):
    """--mesh N shards the serving batch over the device mesh (data-
    parallel inference); outputs match the unsharded run."""
    import jax
    from gwdepth_tpu import predict
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    rng = np.random.default_rng(3)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for n in ("p", "q", "r"):
        Image.fromarray(rng.integers(0, 255, (60, 70, 3))
                        .astype(np.uint8)).save(imgs / f"{n}.png")
    out1 = tmp_path / "o1"
    outm = tmp_path / "om"
    predict.main(["--images", str(imgs), "--output_dir", str(out1),
                  "--tiny", "--score", "0.5"])
    predict.main(["--images", str(imgs), "--output_dir", str(outm),
                  "--tiny", "--score", "0.5", "--batch", "4", "--mesh", "4"])
    for n in ("p", "q", "r"):
        a = np.load(out1 / f"{n}_depth.npy")
        b = np.load(outm / f"{n}_depth.npy")
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
