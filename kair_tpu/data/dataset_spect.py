"""SPECT bone-scan datasets (fork reference: data/dataset_spect.py:11-135,
data/dataset_spectpatch.py:10-183).

Raw ``.dat`` float32 files of shape (2, 1024, 256): anterior + posterior
views; the posterior is left-right flipped and stacked as a second channel.
Joint crop + 8-mode augmentation, then log/anscombe/linear normalisation.

DatasetSPECTPatch pre-extracts a RAM-cached patch bank and resamples it
per epoch (`update_data`), mirroring dataset_spectpatch.py:60.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from kair_tpu.data.base import Dataset
from kair_tpu.utils.spect import normalize_spect


def _list_dat(root: str) -> List[str]:
    out = []
    for dirpath, _, fnames in sorted(os.walk(root)):
        for f in sorted(fnames):
            if f.endswith(".dat"):
                out.append(os.path.join(dirpath, f))
    assert out, f"{root} has no .dat files"
    return out


def read_spect_dat(path: str) -> np.ndarray:
    """(2,1024,256) anterior/posterior → (1024,256,2) HWC with flipped
    posterior (reference dataset_spect.py:65-83)."""
    data = np.fromfile(path, dtype=np.float32).reshape(2, 1024, 256)
    anterior = data[0]
    posterior_flipped = np.fliplr(data[1])
    return np.stack([anterior, posterior_flipped], axis=2)


class DatasetSPECT(Dataset):
    def __init__(self, opt: dict):
        self.opt = opt
        self.patch_size = opt.get("H_size") or 64
        norm = opt.get("normalization") or {}
        self.norm_type = norm.get("type", "log") if isinstance(norm, dict) else "log"
        self.max_pixel = norm.get("max_pixel", 150) if isinstance(norm, dict) else 150
        self.phase = opt.get("phase") or "train"
        paths_h = _list_dat(opt["dataroot_H"])
        paths_l = _list_dat(opt["dataroot_L"])
        assert len(paths_h) == len(paths_l)
        s = opt.get("start_index") or 0
        e = opt.get("end_index") or len(paths_h)
        self.paths_H = paths_h[s:e]
        self.paths_L = paths_l[s:e]

    def __len__(self):
        return len(self.paths_H)

    def get_example(self, index, rng):
        from kair_tpu.utils import image as im

        img_h = read_spect_dat(self.paths_H[index])
        img_l = read_spect_dat(self.paths_L[index])
        if self.phase == "train":
            hh, ww = img_h.shape[:2]
            rh = int(rng.integers(0, max(0, hh - self.patch_size) + 1))
            rw = int(rng.integers(0, max(0, ww - self.patch_size) + 1))
            img_h = img_h[rh: rh + self.patch_size, rw: rw + self.patch_size]
            img_l = img_l[rh: rh + self.patch_size, rw: rw + self.patch_size]
            mode = int(rng.integers(0, 8))
            img_h = im.augment_img(img_h, mode)
            img_l = im.augment_img(img_l, mode)
        img_h = normalize_spect(img_h, self.norm_type, self.max_pixel)
        img_l = normalize_spect(img_l, self.norm_type, self.max_pixel)
        ex = {"L": np.ascontiguousarray(img_l, np.float32),
              "H": np.ascontiguousarray(img_h, np.float32)}
        if self.phase != "train":
            ex["L_path"] = self.paths_L[index]
            ex["H_path"] = self.paths_H[index]
        return ex


class DatasetSPECTPatch(Dataset):
    """RAM-cached patch bank with per-epoch resampling
    (fork reference dataset_spectpatch.py:10-183)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.patch_size = opt.get("H_size") or 64
        self.num_patches_per_image = opt.get("num_patches_per_image") or 32
        norm = opt.get("normalization") or {}
        self.norm_type = norm.get("type", "log") if isinstance(norm, dict) else "log"
        self.max_pixel = norm.get("max_pixel", 150) if isinstance(norm, dict) else 150
        self.phase = opt.get("phase") or "train"
        paths_h = _list_dat(opt["dataroot_H"])
        paths_l = _list_dat(opt["dataroot_L"])
        assert len(paths_h) == len(paths_l)
        s = opt.get("start_index") or 0
        e = opt.get("end_index") or len(paths_h)
        self.paths_H = paths_h[s:e]
        self.paths_L = paths_l[s:e]
        self._bank_h: List[np.ndarray] = []
        self._bank_l: List[np.ndarray] = []
        self.update_data(np.random.default_rng(opt.get("seed") or 0))

    def update_data(self, rng: np.random.Generator) -> None:
        """Resample the patch bank (reference dataset_spectpatch.py:60)."""
        self._bank_h.clear()
        self._bank_l.clear()
        ps = self.patch_size
        for ph, plo in zip(self.paths_H, self.paths_L):
            img_h = read_spect_dat(ph)
            img_l = read_spect_dat(plo)
            hh, ww = img_h.shape[:2]
            for _ in range(self.num_patches_per_image):
                rh = int(rng.integers(0, max(0, hh - ps) + 1))
                rw = int(rng.integers(0, max(0, ww - ps) + 1))
                self._bank_h.append(img_h[rh: rh + ps, rw: rw + ps].copy())
                self._bank_l.append(img_l[rh: rh + ps, rw: rw + ps].copy())

    def __len__(self):
        return len(self._bank_h)

    def get_example(self, index, rng):
        from kair_tpu.utils import image as im

        img_h, img_l = self._bank_h[index], self._bank_l[index]
        mode = int(rng.integers(0, 8))
        img_h = im.augment_img(img_h, mode)
        img_l = im.augment_img(img_l, mode)
        return {"L": np.ascontiguousarray(
                    normalize_spect(img_l, self.norm_type, self.max_pixel), np.float32),
                "H": np.ascontiguousarray(
                    normalize_spect(img_h, self.norm_type, self.max_pixel), np.float32)}
