"""Video datasets for recurrent training/testing
(reference: data/dataset_video_train.py:11-453, dataset_video_test.py:11-425).

Disk backend: REDS/Vimeo-style frame folders, meta_info txt
("clip frame_num (h,w,c) [start_frame]"), temporal interval + reverse
augmentation, paired LQ/HR random crop, hflip/rot augmentation
(utils_video.paired_random_crop :240 / augment :173 semantics).
LMDB is not available in this environment (no `lmdb` module); the disk
backend covers the same data with the same keys.

Frames are returned as (D, H, W, C) float32 — the Loader stacks batches to
(B, D, H, W, C) NDHWC for VRT/RVRT.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from kair_tpu.data.base import Dataset
from kair_tpu.utils import image as im


def _read_frame(path: str) -> np.ndarray:
    return im.uint2single(im.imread_uint(str(path), 3))


def paired_random_crop(img_gts: List[np.ndarray], img_lqs: List[np.ndarray],
                       gt_patch_size: int, scale: int,
                       rng: np.random.Generator):
    """reference utils/utils_video.py:240-300."""
    lq_patch_size = gt_patch_size // scale
    h_lq, w_lq = img_lqs[0].shape[:2]
    top = int(rng.integers(0, h_lq - lq_patch_size + 1))
    left = int(rng.integers(0, w_lq - lq_patch_size + 1))
    img_lqs = [v[top: top + lq_patch_size, left: left + lq_patch_size] for v in img_lqs]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [v[top_gt: top_gt + gt_patch_size, left_gt: left_gt + gt_patch_size]
               for v in img_gts]
    return img_gts, img_lqs


def augment_frames(frames: List[np.ndarray], hflip: bool, rot: bool,
                   rng: np.random.Generator) -> List[np.ndarray]:
    """hflip OR vflip+rot90 joint augmentation (reference utils_video.py:173-237)."""
    do_h = hflip and rng.random() < 0.5
    do_v = rot and rng.random() < 0.5
    do_r = rot and rng.random() < 0.5

    def aug(img):
        if do_h:
            img = img[:, ::-1, :]
        if do_v:
            img = img[::-1, :, :]
        if do_r:
            img = img.transpose(1, 0, 2)
        return img

    return [aug(f) for f in frames]


class VideoRecurrentTrainDataset(Dataset):
    """reference dataset_video_train.py:11-182 (disk backend)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale") or 4
        self.gt_size = opt.get("gt_size") or 256
        self.gt_root = Path(opt["dataroot_gt"])
        self.lq_root = Path(opt["dataroot_lq"])
        self.filename_tmpl = opt.get("filename_tmpl") or "08d"
        self.filename_ext = opt.get("filename_ext") or "png"
        self.num_frame = opt.get("num_frame") or 6
        self.interval_list = opt.get("interval_list") or [1]
        self.random_reverse = bool(opt.get("random_reverse") or False)
        self.use_hflip = bool(opt.get("use_hflip", True))
        self.use_rot = bool(opt.get("use_rot", True))

        self.keys: List[str] = []
        self.total_frames: Dict[str, int] = {}
        self.start_frames: Dict[str, int] = {}
        meta = opt.get("meta_info_file")
        if meta and os.path.exists(meta):
            with open(meta) as f:
                for line in f:
                    parts = line.split()
                    folder, n = parts[0], int(parts[1])
                    start = int(parts[3]) if len(parts) > 3 else 0
                    self.total_frames[folder] = n
                    self.start_frames[folder] = start
                    self.keys.extend(f"{folder}/{i:{self.filename_tmpl}}"
                                     for i in range(start, start + n))
        else:
            # scan folders directly
            for clip in sorted(os.listdir(self.gt_root)):
                frames = sorted(os.listdir(self.gt_root / clip))
                self.total_frames[clip] = len(frames)
                self.start_frames[clip] = 0
                self.keys.extend(f"{clip}/{os.path.splitext(f)[0]}" for f in frames)

        # exclude validation partition (reference :64-76)
        val_partition = []
        if opt.get("name") == "REDS":
            if opt.get("val_partition") == "REDS4":
                val_partition = ["000", "011", "015", "020"]
            elif opt.get("val_partition") == "official":
                val_partition = [f"{v:03d}" for v in range(240, 270)]
        if opt.get("test_mode"):
            self.keys = [k for k in self.keys if k.split("/")[0] in val_partition]
        else:
            self.keys = [k for k in self.keys if k.split("/")[0] not in val_partition]

    def __len__(self):
        return len(self.keys)

    def get_example(self, index: int, rng: np.random.Generator):
        key = self.keys[index]
        clip_name, frame_name = key.split("/")
        start = self.start_frames[clip_name]
        total = self.total_frames[clip_name]
        interval = int(rng.choice(self.interval_list))

        start_idx = int(frame_name)
        endmost = start + total - self.num_frame * interval
        start_idx = min(start_idx, max(start, endmost))
        indices = list(range(start_idx, start_idx + self.num_frame * interval,
                             interval))
        if self.random_reverse and rng.random() < 0.5:
            indices.reverse()

        lqs, gts = [], []
        for i in indices:
            name = f"{i:{self.filename_tmpl}}.{self.filename_ext}"
            lqs.append(_read_frame(self.lq_root / clip_name / name))
            gts.append(_read_frame(self.gt_root / clip_name / name))

        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale, rng)
        frames = augment_frames(gts + lqs, self.use_hflip, self.use_rot, rng)
        gts, lqs = frames[: self.num_frame], frames[self.num_frame:]
        return {"L": np.ascontiguousarray(np.stack(lqs), np.float32),
                "H": np.ascontiguousarray(np.stack(gts), np.float32),
                "key": key}


class VideoRecurrentTestDataset(Dataset):
    """Whole-clip test dataset (reference dataset_video_test.py:11-130)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = Path(opt["dataroot_gt"])
        self.lq_root = Path(opt["dataroot_lq"])
        self.folders = sorted(os.listdir(self.lq_root))

    def __len__(self):
        return len(self.folders)

    def get_example(self, index: int, rng):
        folder = self.folders[index]
        names = sorted(os.listdir(self.lq_root / folder))
        lqs = np.stack([_read_frame(self.lq_root / folder / n) for n in names])
        gts = np.stack([_read_frame(self.gt_root / folder / n) for n in names])
        return {"L": lqs.astype(np.float32), "H": gts.astype(np.float32),
                "folder": folder}
