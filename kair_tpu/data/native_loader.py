"""Python binding for the native C++ patch loader
(kair_tpu/cpp/patch_loader.cpp) — the data-pipeline hot path (decode, crop,
8-mode augment, uint8→float, AWGN synthesis) off the GIL with a std::thread
pool; the TPU-framework counterpart of torch DataLoader worker processes.

Builds the shared library on first use (g++ -shared, libpng/libjpeg);
falls back with a clear error if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")
_SO_PATH = os.path.abspath(os.path.join(_CPP_DIR, "libpatch_loader.so"))
_lib = None


def _build() -> str:
    src = os.path.join(_CPP_DIR, "patch_loader.cpp")
    cmd = ["g++", "-O3", "-fPIC", "-std=c++17", "-Wall", "-pthread",
           "-shared", "-o", _SO_PATH, src, "-lpng", "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) <
            os.path.getmtime(os.path.join(_CPP_DIR, "patch_loader.cpp"))):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_num_images.restype = ctypes.c_int
    lib.loader_num_images.argtypes = [ctypes.c_void_p]
    lib.loader_image_shape.restype = ctypes.c_int
    lib.loader_image_shape.argtypes = [ctypes.c_void_p, ctypes.c_int] + \
        [ctypes.POINTER(ctypes.c_int)] * 3
    lib.loader_sample_awgn_batch.restype = ctypes.c_int
    lib.loader_sample_awgn_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_augment.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def native_augment(patch: np.ndarray, mode: int) -> np.ndarray:
    """Run the native 8-mode augmentation table on an (ps, ps, C) uint8
    patch — exposed for parity tests against utils_image.augment_img."""
    lib = _load_lib()
    patch = np.ascontiguousarray(patch, np.uint8)
    ps, ps2, c = patch.shape
    assert ps == ps2
    out = np.empty_like(patch)
    lib.loader_augment(patch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       ps, c, mode,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


class NativePatchLoader:
    """RAM-cached native loader for AWGN denoising training batches."""

    def __init__(self, paths: Sequence[str], n_channels: int = 1,
                 n_threads: int = 8):
        lib = _load_lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.loader_create(arr, len(paths), n_channels, n_threads)
        if not self._handle:
            raise RuntimeError(f"native loader failed to decode {len(paths)} "
                               "images (unsupported format or bad path)")
        self._lib = lib
        self.n_channels = n_channels
        self.n_images = lib.loader_num_images(self._handle)

    def image_shape(self, idx: int) -> Tuple[int, int, int]:
        h = ctypes.c_int(); w = ctypes.c_int(); c = ctypes.c_int()
        rc = self._lib.loader_image_shape(self._handle, idx,
                                          ctypes.byref(h), ctypes.byref(w),
                                          ctypes.byref(c))
        if rc != 0:
            raise IndexError(idx)
        return h.value, w.value, c.value

    def sample_awgn_batch(self, batch: int, patch_size: int, sigma: float,
                          seed: int):
        """→ dict(L, H) of float32 NHWC arrays (the dataset_dncnn train
        protocol, dataset_dncnn.py:44-75)."""
        shape = (batch, patch_size, patch_size, self.n_channels)
        out_l = np.empty(shape, np.float32)
        out_h = np.empty(shape, np.float32)
        rc = self._lib.loader_sample_awgn_batch(
            self._handle, batch, patch_size, float(sigma),
            ctypes.c_uint64(seed),
            out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("patch size larger than an image in the cache")
        return {"L": out_l, "H": out_h}

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None
