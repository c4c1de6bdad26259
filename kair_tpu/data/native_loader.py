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
    lib.loader_sample_awgn_range_batch.restype = ctypes.c_int
    lib.loader_sample_awgn_range_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_augment.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.pair_loader_create.restype = ctypes.c_void_p
    lib.pair_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pair_loader_create_bicubic.restype = ctypes.c_void_p
    lib.pair_loader_create_bicubic.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.bicubic_downscale_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.pair_loader_num.restype = ctypes.c_int
    lib.pair_loader_num.argtypes = [ctypes.c_void_p]
    lib.pair_loader_sample_sr_batch.restype = ctypes.c_int
    lib.pair_loader_sample_sr_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.pair_loader_destroy.argtypes = [ctypes.c_void_p]
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

    def sample_awgn_range_batch(self, batch: int, patch_size: int,
                                sigma_min: float, sigma_max: float,
                                seed: int):
        """→ (dict(L, H), levels (batch,) already /255) with per-item
        sigma ~ U[sigma_min, sigma_max] — the fdncnn/ffdnet train
        degradation (dataset_fdncnn.py / dataset_ffdnet.py)."""
        shape = (batch, patch_size, patch_size, self.n_channels)
        out_l = np.empty(shape, np.float32)
        out_h = np.empty(shape, np.float32)
        levels = np.empty((batch,), np.float32)
        rc = self._lib.loader_sample_awgn_range_batch(
            self._handle, batch, patch_size, float(sigma_min),
            float(sigma_max), ctypes.c_uint64(seed),
            out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            levels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("patch size larger than an image in the cache")
        return {"L": out_l, "H": out_h}, levels

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None


def native_bicubic_downscale(img: np.ndarray, sf: int) -> np.ndarray:
    """MATLAB-bicubic downscale of an HWC uint8 image by 1/sf via the C++
    kernel — exposed for parity tests against utils.image.imresize_np."""
    lib = _load_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((-(-h // sf), -(-w // sf), c), np.float32)
    lib.bicubic_downscale_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, sf,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class NativePairLoader:
    """RAM-cached native loader for paired-SR training batches — either
    pre-generated LR files, or the on-the-fly MATLAB-bicubic branch
    (dataset_sr.py:66: modcrop H, downscale once at cache build, then
    crop + shared-mode augment per batch)."""

    def __init__(self, paths_l: Optional[Sequence[str]],
                 paths_h: Sequence[str], n_channels: int = 3,
                 n_threads: int = 8, bicubic_sf: Optional[int] = None):
        lib = _load_lib()
        arr_h = (ctypes.c_char_p * len(paths_h))(*[p.encode() for p in paths_h])
        if bicubic_sf is not None:
            assert paths_l is None
            self._handle = lib.pair_loader_create_bicubic(
                arr_h, len(paths_h), n_channels, int(bicubic_sf), n_threads)
        else:
            assert paths_l is not None and len(paths_l) == len(paths_h)
            arr_l = (ctypes.c_char_p * len(paths_l))(
                *[p.encode() for p in paths_l])
            self._handle = lib.pair_loader_create(arr_l, arr_h, len(paths_l),
                                                  n_channels, n_threads)
        if not self._handle:
            raise RuntimeError(f"native pair loader failed to decode "
                               f"{len(paths_h)} pairs")
        self._lib = lib
        self.n_channels = n_channels
        self.n_pairs = lib.pair_loader_num(self._handle)

    def sample_sr_batch(self, batch: int, l_patch: int, sf: int, seed: int):
        """→ dict(L, H) float32 NHWC; H is (l_patch·sf)² — aligned crops,
        shared augment mode (datasets.py DatasetSR.get_example)."""
        out_l = np.empty((batch, l_patch, l_patch, self.n_channels),
                         np.float32)
        out_h = np.empty((batch, l_patch * sf, l_patch * sf,
                          self.n_channels), np.float32)
        rc = self._lib.pair_loader_sample_sr_batch(
            self._handle, batch, l_patch, sf, ctypes.c_uint64(seed),
            out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("patch larger than an image, or an H file "
                               "smaller than sf x its L file")
        return {"L": out_l, "H": out_h}

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.pair_loader_destroy(self._handle)
            self._handle = None


class NativeEpochLoader:
    """Drop-in replacement for :class:`kair_tpu.data.base.Loader` on
    supported train sets: batches come straight from the C++ thread pool
    (decode-once RAM cache, crop/augment/degrade off the GIL) instead of
    the per-example Python path. Same epoch() protocol the train loop
    iterates (cli/train.py) — the TPU-host counterpart of the reference's
    num_workers>0 torch DataLoader (main_train_psnr.py:116-145).

    Supported protocols; callers fall back to the Python Loader otherwise:
    * ``dncnn`` with fixed scalar sigma (dataset_dncnn.py:44-75)
    * ``fdncnn``/``ffdnet`` with sigma ~ U[min,max] and the noise-level
      conditioning (H x W map channel / scalar C) built batch-side
    * ``sr``/``plain`` with pre-generated LR files, OR — when no
      dataroot_L exists — the on-the-fly MATLAB-bicubic branch
      (dataset_sr.py:66): modcrop + antialiased downscale in C++ at
      cache build, crop/augment per batch (parity:
      tests/test_native_loader.py vs utils.image.imresize_np)
    """

    def __init__(self, ds_opt: dict, batch_size: int, seed: int = 0):
        from kair_tpu.utils import image as im

        def listing(root):
            return list(root) if isinstance(root, (list, tuple)) \
                else im.get_image_paths(root)

        kind = (ds_opt.get("dataset_type") or "dncnn").lower()
        threads = ds_opt.get("dataloader_num_workers") or 8
        self.batch_size = batch_size
        self.seed = seed
        if kind == "dncnn":
            sigma = ds_opt.get("sigma")
            if isinstance(sigma, (list, tuple)):
                raise ValueError("native loader supports fixed sigma only")
            paths = listing(ds_opt["dataroot_H"])
            self._native = NativePatchLoader(
                paths, n_channels=ds_opt.get("n_channels") or 1,
                n_threads=threads)
            self.patch_size = ds_opt.get("H_size") or 64
            self.sigma = float(sigma or 25)
            self.n_images = self._native.n_images
            self._sample = lambda s: self._native.sample_awgn_batch(
                self.batch_size, self.patch_size, self.sigma, seed=s)
        elif kind in ("fdncnn", "ffdnet"):
            sigma = ds_opt.get("sigma") or [0, 75]
            if not isinstance(sigma, (list, tuple)):
                sigma = [sigma, sigma]
            smin, smax = float(sigma[0]), float(sigma[1])
            paths = listing(ds_opt["dataroot_H"])
            self._native = NativePatchLoader(
                paths, n_channels=ds_opt.get("n_channels") or 3,
                n_threads=threads)
            self.patch_size = ds_opt.get("H_size") or 64
            self.n_images = self._native.n_images

            def sample(s, _k=kind):
                b, levels = self._native.sample_awgn_range_batch(
                    self.batch_size, self.patch_size, smin, smax, seed=s)
                if _k == "ffdnet":       # scalar C (b,1,1,1): datasets.py:133
                    b["C"] = levels.reshape(-1, 1, 1, 1)
                else:                    # map channel in L: datasets.py:96-97
                    m = np.broadcast_to(
                        levels[:, None, None, None],
                        b["L"].shape[:3] + (1,)).astype(np.float32)
                    b["L"] = np.concatenate([b["L"], m], axis=-1)
                return b

            self._sample = sample
        elif kind in ("sr", "plain"):
            paths_h = listing(ds_opt["dataroot_H"])
            self.sf = (ds_opt.get("scale") or 4) if kind == "sr" else 1
            self.patch_size = ds_opt.get("H_size") or (96 if kind == "sr"
                                                       else 64)
            if self.patch_size % self.sf:
                raise ValueError(f"H_size {self.patch_size} not divisible "
                                 f"by scale {self.sf}")
            l_patch = self.patch_size // self.sf
            if ds_opt.get("dataroot_L"):
                paths_l = listing(ds_opt["dataroot_L"])
                self._native = NativePairLoader(
                    paths_l, paths_h,
                    n_channels=ds_opt.get("n_channels") or 3,
                    n_threads=threads)
            elif kind == "sr":
                # on-the-fly MATLAB bicubic, downscaled once at cache build
                self._native = NativePairLoader(
                    None, paths_h, n_channels=ds_opt.get("n_channels") or 3,
                    n_threads=threads, bicubic_sf=self.sf)
            else:
                raise ValueError("native plain loader needs dataroot_L")
            self.n_images = self._native.n_pairs
            self._sample = lambda s: self._native.sample_sr_batch(
                self.batch_size, l_patch, self.sf, seed=s)
        else:
            raise ValueError(f"no native protocol for dataset_type {kind!r}")

    def __len__(self) -> int:
        return max(1, self.n_images // self.batch_size)

    def epoch(self, epoch: int = 0):
        for i in range(len(self)):
            yield self._sample((self.seed + epoch) * 1_000_003 + i)
