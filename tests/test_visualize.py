"""Visualization smoke tests (PIL-based, file outputs)."""

import numpy as np

from gwdepth_tpu.utils.visualize import (
    inv_preprocess, colorize_depth, show_labels, save_dense_pred,
    vis_pred_lines)
from gwdepth_tpu.data.transforms import MEAN, STD


def test_inv_preprocess_roundtrip():
    raw = np.random.default_rng(0).integers(0, 255, (8, 8, 3)).astype(np.uint8)
    norm = (raw.astype(np.float32) / 255 - MEAN) / STD
    back = inv_preprocess(norm)
    assert np.abs(back.astype(int) - raw.astype(int)).max() <= 1


def test_colorize_depth_shape():
    d = np.linspace(0, 10, 64).reshape(8, 8)
    rgb = colorize_depth(d)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8


def test_show_and_save(tmp_path):
    img = np.zeros((32, 48, 3), np.float32)
    lines = np.array([[0.1, 0.1, 0.9, 0.9, 0.5, 0.5]])
    out = show_labels(img, lines, str(tmp_path / "x" / "labels.png"))
    assert out.shape == (32, 48, 3)
    assert (tmp_path / "x" / "labels.png").exists()

    save_dense_pred(np.ones((32, 48)), np.ones((32, 48)) * 2,
                    np.ones((32, 48), int), np.zeros((32, 48), int),
                    img, str(tmp_path / "dense.png"))
    assert (tmp_path / "dense.png").exists()

    vis_pred_lines(np.array([[1, 1, 40, 30]]), np.array([0.9]),
                   np.array([[2, 2, 44, 28]]), img,
                   str(tmp_path / "lines.png"))
    assert (tmp_path / "lines.png").exists()
