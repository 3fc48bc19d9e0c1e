"""Native (C++) data-path kernels, loaded via ctypes.

Builds ``arflow_io.cpp`` with g++ on first use (cached next to the source);
falls back cleanly when the toolchain or libpng is unavailable —
``available()`` gates every caller (the PIL/numpy paths remain the default
fallback everywhere).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "arflow_io.cpp")
_SO = os.path.join(_HERE, "arflow_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        # Needed to if-convert + vectorize the hue kernel (speculated FP
        # division); nothing here relies on errno or FP traps.
        "-fno-trapping-math", "-fno-math-errno",
        _SRC, "-o", _SO, "-lpng", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i32p = ctypes.POINTER(ctypes.c_int)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.arf_png_info.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
        lib.png_decode_f32.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int]
        lib.png_decode_kitti_flow.argtypes = [ctypes.c_char_p, f32p]
        lib.arf_ppm_info.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
        lib.ppm_decode_f32.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int]
        lib.arf_flo_info.argtypes = [ctypes.c_char_p, i32p, i32p]
        lib.flo_decode.argtypes = [ctypes.c_char_p, f32p]
        lib.resize_bilinear_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.hue_shift_f32.argtypes = [
            f32p, f32p, ctypes.c_longlong, ctypes.c_float,
        ]
        lib.hue_shift_f32.restype = None
        for fn in ("arf_png_info", "png_decode_f32", "png_decode_kitti_flow",
                   "arf_ppm_info", "ppm_decode_f32", "arf_flo_info", "flo_decode"):
            getattr(lib, fn).restype = ctypes.c_int
        lib.resize_bilinear_f32.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_shape(path: str):
    """(H, W, C) of a PNG/PPM/PGM without decoding it."""
    lib = _load()
    assert lib is not None
    path_b = str(path).encode()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    lower = str(path).lower()
    if lower.endswith(".png"):
        info = lib.arf_png_info
    elif lower.endswith((".ppm", ".pgm", ".pnm")):
        info = lib.arf_ppm_info
    else:
        raise ValueError(f"unsupported extension: {path}")
    if info(path_b, ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        raise IOError(f"image info failed: {path}")
    return h.value, w.value, c.value


def load_image(path: str, channels: int = 3, out: np.ndarray | None = None
               ) -> np.ndarray:
    """Decode PNG/PPM/PGM to float32 [0,1] (H, W, channels).

    ``out`` may be a preallocated C-contiguous (H, W, channels) float32
    buffer (e.g. a slice of a stacked frame array) to decode into — avoids
    one full-image copy per frame on the training input path.
    """
    lib = _load()
    assert lib is not None
    h, w, _ = image_shape(path)
    if out is None:
        out = np.empty((h, w, channels), np.float32)
    else:
        assert out.shape == (h, w, channels) and out.dtype == np.float32
        assert out.flags.c_contiguous
    path_b = str(path).encode()
    lower = str(path).lower()
    if lower.endswith(".png"):
        if lib.png_decode_f32(path_b, _fp(out), channels):
            raise IOError(f"png_decode failed: {path}")
    else:
        if lib.ppm_decode_f32(path_b, _fp(out), channels):
            raise IOError(f"ppm_decode failed: {path}")
    return out


def supports(path: str) -> bool:
    return str(path).lower().endswith((".png", ".ppm", ".pgm", ".pnm"))


def read_flo(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.arf_flo_info(str(path).encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"flo_info failed: {path}")
    out = np.empty((h.value, w.value, 2), np.float32)
    if lib.flo_decode(str(path).encode(), _fp(out)):
        raise IOError(f"flo_decode failed: {path}")
    return out


def read_kitti_png(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.arf_png_info(str(path).encode(), ctypes.byref(h), ctypes.byref(w),
                    ctypes.byref(c)):
        raise IOError(f"png_info failed: {path}")
    out = np.empty((h.value, w.value, 3), np.float32)
    if lib.png_decode_kitti_flow(str(path).encode(), _fp(out)):
        raise IOError(f"kitti flow decode failed: {path}")
    return out


def hue_shift(img: np.ndarray, delta: float) -> np.ndarray:
    """HSV hue rotation of an (..., 3) float32 RGB array by ``delta`` turns.

    Bit-matches the numpy path in ``arflow_tpu/data/transforms.py`` (the
    ColorJitter hue op); this is the input-pipeline hot spot on 1-core hosts.
    """
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    assert img.shape[-1] == 3, img.shape
    out = np.empty_like(img)
    lib.hue_shift_f32(
        _fp(img), _fp(out), ctypes.c_longlong(img.size // 3),
        ctypes.c_float(delta),
    )
    return out


def resize_bilinear(img: np.ndarray, out_hw) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(_fp(img), h, w, c, _fp(out), oh, ow)
    return out
