"""ctypes bindings for the native host-side data kernels (csrc/pseg_native.cpp).

Compiled on first import with g++ (cached as a .so next to the package);
`lib` is None when no toolchain is available and callers fall back to
cv2/numpy implementations (see data/rasterize.py)."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile

import numpy as np

__all__ = ["lib"]

_SRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                "csrc", "pseg_native.cpp")
_SO = osp.join(osp.dirname(osp.abspath(__file__)), "_pseg_native.so")


def _build() -> str | None:
    if not osp.exists(_SRC):
        return _SO if osp.exists(_SO) else None
    if osp.exists(_SO) and os.stat(_SO).st_mtime >= os.stat(_SRC).st_mtime:
        return _SO
    with tempfile.NamedTemporaryFile(suffix=".so", delete=False) as tmp:
        tmp_path = tmp.name
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
           _SRC, "-o", tmp_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, _SO)
        return _SO
    except Exception:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return _SO if osp.exists(_SO) else None


class _NativeLib:
    def __init__(self, so_path: str):
        self._c = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i = ctypes.c_int
        self._c.fill_polygon.argtypes = [u8p, i, i, f32p, i, ctypes.c_uint8]
        self._c.map_colors.argtypes = [u8p, i, i, u8p, i, u8p]
        self._c.resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        self._c.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]

    @staticmethod
    def _u8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def fill_polygon(self, mask: np.ndarray, pts: np.ndarray, value: int):
        mask = np.ascontiguousarray(mask, dtype=np.uint8)
        pts = np.ascontiguousarray(pts, dtype=np.float32).reshape(-1, 2)
        self._c.fill_polygon(
            self._u8(mask), mask.shape[0], mask.shape[1],
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pts), value & 0xFF)
        return mask

    def map_colors(self, color_img: np.ndarray, colormap: np.ndarray):
        color_img = np.ascontiguousarray(color_img, dtype=np.uint8)
        colormap = np.ascontiguousarray(colormap, dtype=np.uint8)
        out = np.zeros(color_img.shape[:2], dtype=np.uint8)
        self._c.map_colors(self._u8(color_img), color_img.shape[0],
                           color_img.shape[1], self._u8(colormap),
                           len(colormap), self._u8(out))
        return out

    def resize_u8(self, img: np.ndarray, out_hw, nearest: bool = False):
        img = np.ascontiguousarray(img, dtype=np.uint8)
        squeeze = img.ndim == 2
        if squeeze:
            img = img[..., None]
        h, w, c = img.shape
        oh, ow = out_hw
        out = np.empty((oh, ow, c), dtype=np.uint8)
        fn = (self._c.resize_nearest_u8 if nearest
              else self._c.resize_bilinear_u8)
        fn(self._u8(img), h, w, c, self._u8(out), oh, ow)
        return out[..., 0] if squeeze else out


def _load():
    so = _build()
    if so is None:
        return None
    try:
        return _NativeLib(so)
    except OSError:
        return None


lib = _load()
