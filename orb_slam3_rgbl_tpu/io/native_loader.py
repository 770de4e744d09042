"""ctypes bindings for the native KITTI prefetcher
(``native/kitti_loader.cc``). Builds the shared library on first use
(make), falls back to the pure-Python ``io.kitti`` loader if the
toolchain is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libkitti_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kl_open.restype = ctypes.c_void_p
    lib.kl_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.kl_count.restype = ctypes.c_int
    lib.kl_count.argtypes = [ctypes.c_void_p]
    lib.kl_image_height.restype = ctypes.c_int
    lib.kl_image_height.argtypes = [ctypes.c_void_p]
    lib.kl_image_width.restype = ctypes.c_int
    lib.kl_image_width.argtypes = [ctypes.c_void_p]
    lib.kl_next.restype = ctypes.c_int
    lib.kl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.kl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeKittiSequence:
    """Drop-in, prefetching replacement for ``io.kitti.KittiSequence``:
    iterate with ``next_frame()`` — IO/decode runs on native threads ahead
    of consumption."""

    def __init__(self, seq_dir: str, camera: str = "image_2",
                 max_points: int = 131072, queue_depth: int = 4, n_threads: int = 2):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.kl_open(seq_dir.encode(), camera.encode(), max_points, queue_depth, n_threads)
        self.n = lib.kl_count(self._h)
        self.height = lib.kl_image_height(self._h)
        self.width = lib.kl_image_width(self._h)
        self.max_points = max_points

    def __len__(self):
        return self.n

    def next_frame(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, float]]:
        img = np.empty((self.height, self.width), np.float32)
        cloud = np.empty((self.max_points, 4), np.float32)
        mask = np.empty(self.max_points, np.uint8)
        t = ctypes.c_double()
        rc = self._lib.kl_next(
            self._h,
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self.height, self.width,
            cloud.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(t),
        )
        if rc != 0:
            return None
        return img, cloud, mask.astype(bool), float(t.value)

    def close(self):
        if self._h:
            self._lib.kl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
