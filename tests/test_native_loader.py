"""Native loader fast path: bit-exact parity with the PIL reference ops.

The C++ library (gwdepth_tpu/native/loader.cpp) replaces the host input
pipeline's two hot stages — PNG decode and ColorJitter — plus the
normalize pass. Each test asserts EXACT equality against the PIL
implementation the transforms were golden-tested against (reference
behavior: src/datasets/glassrgbd_norhint.py loads,
src/datasets/transforms_depth.py:548-600 ColorJitter).
"""

import os
import random

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from gwdepth_tpu import native
from gwdepth_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _rand_rgb(rng, h=97, w=131):
    return rng.integers(0, 256, (h, w, 3), np.uint8)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def test_decode_rgb8(tmp_path):
    rng = np.random.default_rng(0)
    img = _rand_rgb(rng)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out = native.decode_png(p, rgb=True)
    assert out.dtype == np.uint8 and (out == img).all()


def test_decode_rgba_matches_pil_convert(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 50, 4), np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img, "RGBA").save(p)
    out = native.decode_png(p, rgb=True)
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert (out == ref).all()


def test_decode_gray16_raw(tmp_path):
    rng = np.random.default_rng(2)
    dep = rng.integers(0, 65535, (60, 70)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(dep).save(p)
    out = native.decode_png(p, rgb=False)
    ref = np.asarray(Image.open(p))
    assert out.dtype == np.uint16
    assert (out.astype(np.int64) == ref.astype(np.int64)).all()


def test_decode_gray8_and_palette(tmp_path):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (30, 40), np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(g).save(p)
    assert (native.decode_png(p, rgb=False) == g).all()

    pal_idx = rng.integers(0, 5, (30, 40), np.uint8)
    pim = Image.fromarray(pal_idx, "P")
    pim.putpalette(list(rng.integers(0, 256, 768)))
    pp = str(tmp_path / "p.png")
    pim.save(pp)
    # raw mode: palette INDICES (what np.asarray(Image.open(...)) gives)
    assert (native.decode_png(pp, rgb=False)
            == np.asarray(Image.open(pp))).all()
    # rgb mode: palette lookup like PIL convert("RGB")
    assert (native.decode_png(pp, rgb=True)
            == np.asarray(Image.open(pp).convert("RGB"))).all()


def test_decode_gray_to_rgb(tmp_path):
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (25, 35), np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(g).save(p)
    out = native.decode_png(p, rgb=True)
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert (out == ref).all()


def test_decode_missing_file_returns_none(tmp_path):
    assert native.decode_png(str(tmp_path / "nope.png"), rgb=True) is None


# ---------------------------------------------------------------------------
# color jitter
# ---------------------------------------------------------------------------

def _pil_jitter(img, ops, factors):
    im = Image.fromarray(img)
    for op, f in zip(ops, factors):
        if op == 0:
            im = ImageEnhance.Brightness(im).enhance(f)
        elif op == 1:
            im = ImageEnhance.Contrast(im).enhance(f)
        elif op == 2:
            im = ImageEnhance.Color(im).enhance(f)
        else:
            im = T.adjust_hue(im, 0.0, shift=int(f))
    return np.asarray(im)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jitter_exact_random_orders(seed):
    rng = np.random.default_rng(seed)
    pr = random.Random(seed)
    img = _rand_rgb(rng)
    ops = [0, 1, 2, 3]
    pr.shuffle(ops)
    factors = [int(pr.uniform(-0.4, 0.4) * 255) if op == 3
               else pr.uniform(0.6, 1.4) for op in ops]
    out = native.color_jitter(img, ops, factors)
    assert (out == _pil_jitter(img, ops, factors)).all()


def test_jitter_extreme_factors_exact():
    rng = np.random.default_rng(9)
    img = _rand_rgb(rng, 31, 47)
    for ops, facs in [([0], [1.9]), ([1], [0.05]), ([2], [1.99]),
                      ([3], [-102]), ([3], [127]), ([0, 0], [1.5, 1.5])]:
        out = native.color_jitter(img, ops, facs)
        assert (out == _pil_jitter(img, ops, facs)).all(), (ops, facs)


def test_transform_color_jitter_native_vs_pil_identical(monkeypatch):
    """train-path color_jitter produces identical bytes with and without
    the native library (same rng -> same factors -> same pixels)."""
    rng = np.random.default_rng(5)
    img = Image.fromarray(_rand_rgb(rng))
    a = np.asarray(T.color_jitter(img.copy(), random.Random(42)))
    monkeypatch.setattr(native, "available", lambda: False)
    b = np.asarray(T.color_jitter(img.copy(), random.Random(42)))
    assert (a == b).all()


# ---------------------------------------------------------------------------
# normalize
# ---------------------------------------------------------------------------

def test_normalize_pad_exact():
    rng = np.random.default_rng(6)
    img = _rand_rgb(rng, 50, 60)
    out = native.normalize_pad(img, (64, 80), T.MEAN, T.STD)
    ref = np.zeros((64, 80, 3), np.float32)
    ref[:50, :60] = (np.asarray(img, np.float32) / 255.0 - T.MEAN) / T.STD
    assert out.dtype == np.float32 and (out == ref).all()


def test_normalize_transform_native_vs_numpy(monkeypatch):
    rng = np.random.default_rng(7)
    img = Image.fromarray(_rand_rgb(rng, 33, 44))
    mk = lambda: T.Sample(img, np.zeros((33, 44), np.float32),
                          np.zeros((33, 44), np.uint8),
                          np.asarray([[1.0, 2, 3, 4]]),
                          np.asarray([[2.0, 3]]), np.asarray([0]))
    a = T.normalize(mk()).image
    monkeypatch.setattr(native, "available", lambda: False)
    b = T.normalize(mk()).image
    assert (a == b).all()


# ---------------------------------------------------------------------------
# dataset decode integration
# ---------------------------------------------------------------------------

def test_dataset_open_helpers(tmp_path, monkeypatch):
    from gwdepth_tpu.data import dataset as D
    rng = np.random.default_rng(8)
    img = _rand_rgb(rng, 20, 30)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    assert (np.asarray(D._open_rgb(p)) == img).all()
    dep = rng.integers(0, 9000, (20, 30)).astype(np.uint16)
    pd = str(tmp_path / "d.png")
    Image.fromarray(dep).save(pd)
    assert (D._open_array(pd).astype(np.int64) == dep).all()
    # fallback path gives the same bytes
    monkeypatch.setattr(native, "available", lambda: False)
    assert (np.asarray(D._open_rgb(p)) == img).all()
    assert (D._open_array(pd).astype(np.int64) == dep).all()


# ---------------------------------------------------------------------------
# resize (bilinear native, nearest numpy replay)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_resize_bilinear_exact_fuzz(seed):
    """Native bilinear == PIL BILINEAR byte-for-byte across random
    up/down/mixed scalings (Pillow Resample.c replica)."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    for _ in range(25):
        h, w = (int(v) for v in rng.integers(4, 90, 2))
        oh, ow = (int(v) for v in rng.integers(3, 120, 2))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh),
                                                     Image.BILINEAR))
        got = native.resize_bilinear_rgb8(img, oh, ow)
        assert got is not None
        np.testing.assert_array_equal(ref, got, err_msg=f"{(h,w)}->{(oh,ow)}")


def test_resize_bilinear_protocol_sizes():
    """Bit-exact at the shapes the pipeline actually uses (720x1280
    captures -> train scales / eval long-side-1024), incl. identity."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for (h, w), (oh, ow) in [((720, 1280), (768, 1024)),
                             ((720, 1280), (576, 1024)),
                             ((360, 640), (768, 1024)),
                             ((64, 96), (64, 96))]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh),
                                                     Image.BILINEAR))
        got = native.resize_bilinear_rgb8(img, oh, ow)
        np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_nearest_index_replay_matches_pil(dtype):
    """_pil_nearest_idx replays PIL NEAREST (ImagingScaleAffine sequential
    double accumulation) exactly for the depth (F) and seg (L) maps."""
    rng = np.random.default_rng(11)
    for _ in range(40):
        h, w = (int(v) for v in rng.integers(3, 90, 2))
        oh, ow = (int(v) for v in rng.integers(2, 130, 2))
        arr = (rng.uniform(0, 10, (h, w)).astype(np.float32)
               if dtype is np.float32
               else rng.integers(0, 2, (h, w)).astype(np.uint8))
        ref = np.asarray(Image.fromarray(arr).resize((ow, oh),
                                                     Image.NEAREST))
        got = arr[T._pil_nearest_idx(h, oh)][:, T._pil_nearest_idx(w, ow)]
        np.testing.assert_array_equal(ref, got, err_msg=f"{(h,w)}->{(oh,ow)}")


def test_transform_resize_native_vs_pil_identical(monkeypatch):
    """T.resize produces identical samples through the native and PIL
    paths (image, depth, seg, scaled lines/centers)."""
    rng = np.random.default_rng(13)
    img = Image.fromarray(_rand_rgb(rng, 48, 64))
    dep = rng.uniform(0, 10, (48, 64)).astype(np.float32)
    seg = rng.integers(0, 2, (48, 64)).astype(np.uint8)
    mk = lambda: T.Sample(img, dep.copy(), seg.copy(),
                          np.asarray([[1.0, 2, 30, 40]]),
                          np.asarray([[15.0, 20]]), np.asarray([0]))
    a = T.resize(mk(), (100, 72))
    monkeypatch.setenv("GWDEPTH_NO_NATIVE", "1")
    b = T.resize(mk(), (100, 72))
    assert (np.asarray(a.image) == np.asarray(b.image)).all()
    np.testing.assert_array_equal(a.depth, b.depth)
    np.testing.assert_array_equal(a.seg, b.seg)
    np.testing.assert_array_equal(a.lines, b.lines)
    np.testing.assert_array_equal(a.centers, b.centers)
