"""ctypes binding for the native loader fast path (loader.cpp).

The C++ library is built lazily on first use with the host g++ (one
~2-second compile, cached next to the source; rebuilt when loader.cpp
changes). Every entry point degrades gracefully: if the toolchain or
libpng is unavailable, or a decode fails, callers fall back to the PIL
implementations — the native path is an accelerator, never a dependency.

Set GWDEPTH_NO_NATIVE=1 to force the PIL paths (used by the parity tests
to compare both).
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading
import time
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "_gwnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

# per-thread decode scratch (large enough for 1280x1024 RGBA16; grown on
# demand when a bigger file shows up)
_scratch = threading.local()


def _build() -> bool:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    # pid-unique scratch: two processes racing the build must not write
    # through one shared tmp path (A's os.replace would publish a file B's
    # still-running g++ keeps writing into — a corrupt .so with a fresh
    # mtime that every later process silently fails to load).  A SIGKILLed
    # build skips the except-cleanup and orphans its tmp forever, so sweep
    # stale siblings first (unlinking an open file is safe on POSIX — a
    # concurrent builder's g++ keeps its own fd).
    for stale in glob.glob(f"{_SO}.*.tmp"):
        try:
            if time.time() - os.path.getmtime(stale) > 600:
                os.unlink(stale)
        except OSError:
            pass
    tmp = f"{_SO}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC,
             "-lpng", "-lz"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("GWDEPTH_NO_NATIVE"):
        return None
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        try:
            if _build():
                so = ctypes.CDLL(_SO)
                so.gw_png_decode.restype = ctypes.c_int
                so.gw_png_decode.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                    ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                so.gw_color_jitter.restype = ctypes.c_int
                so.gw_color_jitter.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float)]
                so.gw_resize_bilinear_rgb8.restype = ctypes.c_int
                so.gw_resize_bilinear_rgb8.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
                so.gw_normalize_pad.restype = ctypes.c_int
                so.gw_normalize_pad.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
                _lib = so
        except Exception:
            _lib = None
        _tried = True
    return _lib


def available() -> bool:
    return lib() is not None


def decode_png(path: str, rgb: bool = True) -> Optional[np.ndarray]:
    """Decode a PNG. rgb=True mirrors PIL `.convert("RGB")` (uint8 HWC);
    rgb=False mirrors `np.asarray(Image.open(path))` for gray8 / gray16 /
    palette-index / multi-channel files. None on any failure."""
    so = lib()
    if so is None:
        return None
    buf = getattr(_scratch, "buf", None)
    if buf is None:
        buf = _scratch.buf = ctypes.create_string_buffer(1280 * 1024 * 8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    isz = ctypes.c_int()
    for _ in range(2):
        rc = so.gw_png_decode(path.encode(), int(rgb), buf, len(buf),
                              ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(ch), ctypes.byref(isz))
        if rc == 1:  # scratch too small: grow and retry once
            buf = _scratch.buf = ctypes.create_string_buffer(
                h.value * w.value * ch.value * isz.value)
            continue
        break
    if rc != 0:
        return None
    dtype = np.uint16 if isz.value == 2 else np.uint8
    n = h.value * w.value * ch.value
    arr = np.frombuffer(buf, dtype=dtype, count=n).copy()
    shape = ((h.value, w.value) if ch.value == 1
             else (h.value, w.value, ch.value))
    return arr.reshape(shape)


def color_jitter(img: np.ndarray, ops: Sequence[int],
                 factors: Sequence[float]) -> Optional[np.ndarray]:
    """Fused brightness/contrast/saturation/hue on uint8 HWC RGB.
    ops: sequence of {0,1,2,3} in application order; factors aligned with
    ops (hue entries carry the integer uint8 shift). Returns a new array,
    or None when the native library is unavailable."""
    so = lib()
    if so is None:
        return None
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    out = np.ascontiguousarray(img).copy()
    ops_c = (ctypes.c_int * len(ops))(*ops)
    fac_c = (ctypes.c_float * len(factors))(*[float(f) for f in factors])
    rc = so.gw_color_jitter(
        out.ctypes.data_as(ctypes.c_char_p), out.shape[0], out.shape[1],
        len(ops), ops_c, fac_c)
    return out if rc == 0 else None


def resize_bilinear_rgb8(img: np.ndarray, oh: int, ow: int
                         ) -> Optional[np.ndarray]:
    """PIL `Image.resize((ow, oh), BILINEAR)` on uint8 HWC RGB, bit-exact
    (Pillow Resample.c replica). None when the native library is
    unavailable or the call fails."""
    so = lib()
    if so is None:
        return None
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    img = np.ascontiguousarray(img)
    out = np.empty((oh, ow, 3), np.uint8)
    rc = so.gw_resize_bilinear_rgb8(
        img.ctypes.data_as(ctypes.c_char_p), img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.c_char_p), oh, ow)
    return out if rc == 0 else None


def normalize_pad(img: np.ndarray, canvas_hw: Tuple[int, int],
                  mean: np.ndarray, std: np.ndarray) -> Optional[np.ndarray]:
    """(img/255 - mean)/std onto a zero-padded (ch, cw, 3) float32 canvas."""
    so = lib()
    if so is None:
        return None
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    img = np.ascontiguousarray(img)
    ch, cw = canvas_hw
    if img.shape[0] > ch or img.shape[1] > cw:
        # the C side would write past the canvas buffer (it also rejects
        # this, but never hand it an out-of-bounds job in the first place)
        raise ValueError(f"image {img.shape[:2]} exceeds canvas {canvas_hw}")
    out = np.empty((ch, cw, 3), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    rc = so.gw_normalize_pad(
        img.ctypes.data_as(ctypes.c_char_p), img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ch, cw,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None
