"""Video datasets for recurrent training/testing
(reference: data/dataset_video_train.py:11-453, dataset_video_test.py:11-425).

Backends: 'disk' (REDS/Vimeo-style frame folders), 'framepack' (packed
mmap store, kair_tpu.data.framepack — the TPU-native replacement for the
reference's lmdb backend, same keys), or 'lmdb' when the module exists.
meta_info txt ("clip frame_num (h,w,c) [start_frame]"), temporal interval
+ reverse augmentation, paired LQ/HR random crop, hflip/rot augmentation
(utils_video.paired_random_crop :240 / augment :173 semantics).

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


class _FrameSource:
    """Resolves frames from disk paths or packed stores according to the
    opt['io_backend'] dict (reference dataset_video_train.py:100-110: lmdb
    backends get db_paths=[lq_root, gt_root] and client_keys=['lq','gt']).
    Here 'framepack' (kair_tpu.data.framepack) replaces 'lmdb'."""

    def __init__(self, opt: dict, lq_root, gt_root):
        io = dict(opt.get("io_backend") or {"type": "disk"})
        self.type = io.pop("type", "disk")
        if self.type != "disk":
            io.setdefault("db_paths", [str(lq_root), str(gt_root)])
            io.setdefault("client_keys", ["lq", "gt"])
            if not opt.get("meta_info_file"):
                raise ValueError(
                    f"io_backend '{self.type}' requires meta_info_file "
                    "(packed stores cannot be folder-scanned)")
        self.io_kwargs = io
        self.client = None

    def read(self, root, rel_path: str, key: str, client_key: str):
        """rel_path: disk path below root; key: packed-store key."""
        if self.type == "disk":
            return _read_frame(str(root / rel_path))
        if self.client is None:  # lazy, like reference :118-120
            from kair_tpu.data.framepack import FileClient
            self.client = FileClient(self.type, **self.io_kwargs)
        from kair_tpu.data.framepack import imfrombytes
        return imfrombytes(self.client.get(key, client_key), float32=True)


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

        self.source = _FrameSource(opt, self.lq_root, self.gt_root)
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
            name = f"{clip_name}/{i:{self.filename_tmpl}}.{self.filename_ext}"
            key_i = f"{clip_name}/{i:{self.filename_tmpl}}"
            lqs.append(self.source.read(self.lq_root, name, key_i, "lq"))
            gts.append(self.source.read(self.gt_root, name, key_i, "gt"))

        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale, rng)
        frames = augment_frames(gts + lqs, self.use_hflip, self.use_rot, rng)
        gts, lqs = frames[: self.num_frame], frames[self.num_frame:]
        return {"L": np.ascontiguousarray(np.stack(lqs), np.float32),
                "H": np.ascontiguousarray(np.stack(gts), np.float32),
                "key": key}


class VideoRecurrentTrainNonblindDenoisingDataset(VideoRecurrentTrainDataset):
    """GT-only clips + uniform-σ AWGN with a σ-map channel appended to L
    (reference dataset_video_train.py:184-259). Crop scale is 1 (:237)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.sigma_min = (opt.get("sigma_min") or 0) / 255.0
        self.sigma_max = (opt.get("sigma_max") or 50) / 255.0

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

        gts = []
        for i in indices:
            name = f"{clip_name}/{i:{self.filename_tmpl}}.{self.filename_ext}"
            key_i = f"{clip_name}/{i:{self.filename_tmpl}}"
            gts.append(self.source.read(self.gt_root, name, key_i, "gt"))

        gts, _ = paired_random_crop(gts, gts, self.gt_size, 1, rng)
        gts = augment_frames(gts, self.use_hflip, self.use_rot, rng)
        gts_arr = np.ascontiguousarray(np.stack(gts), np.float32)

        # noise is added in the data pipeline (reference :245-251)
        sigma = rng.uniform(self.sigma_min, self.sigma_max)
        lqs = gts_arr + rng.normal(0.0, sigma, gts_arr.shape).astype(np.float32)
        t, h, w, _ = lqs.shape
        sigma_map = np.full((t, h, w, 1), sigma, np.float32)
        return {"L": np.concatenate([lqs, sigma_map], axis=-1).astype(np.float32),
                "H": gts_arr, "key": key}


class VideoRecurrentTrainVimeoDataset(Dataset):
    """Vimeo90K septuplet training set (reference dataset_video_train.py:262-388).

    Keys come from meta_info ("00001/0001 7 (256,448,3)"); the neighbor list
    is the centred window im{...} (:321), optionally strided by
    temporal_scale; mirror_sequence doubles 7→14 frames, pad_sequence
    repeats the last frame 7→8 (:375-380).
    """

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale") or 4
        self.gt_size = opt.get("gt_size") or 256
        self.gt_root = Path(opt["dataroot_gt"])
        self.lq_root = Path(opt["dataroot_lq"])
        self.temporal_scale = opt.get("temporal_scale") or 1
        self.num_frame = opt.get("num_frame") or 7
        self.random_reverse = bool(opt.get("random_reverse") or False)
        self.use_hflip = bool(opt.get("use_hflip", True))
        self.use_rot = bool(opt.get("use_rot", True))
        self.mirror_sequence = bool(opt.get("mirror_sequence") or False)
        self.pad_sequence = bool(opt.get("pad_sequence") or False)

        self.source = _FrameSource(opt, self.lq_root, self.gt_root)
        meta = opt.get("meta_info_file")
        if meta and os.path.exists(meta):
            with open(meta) as f:
                self.keys = [line.split(" ")[0] for line in f if line.strip()]
        else:
            self.keys = [f"{clip}/{seq}"
                         for clip in sorted(os.listdir(self.gt_root))
                         for seq in sorted(os.listdir(self.gt_root / clip))]

        # centred neighbor window (reference :321)
        self.neighbor_list = [i + (9 - self.num_frame) // 2
                              for i in range(self.num_frame)][::self.temporal_scale]

    def __len__(self):
        return len(self.keys)

    def _read_pair(self, key: str, neighbors: List[int]):
        clip, seq = key.split("/")
        lqs = [self.source.read(self.lq_root, f"{clip}/{seq}/im{n}.png",
                                f"{clip}/{seq}/im{n}", "lq")
               for n in neighbors]
        gts = [self.source.read(self.gt_root, f"{clip}/{seq}/im{n}.png",
                                f"{clip}/{seq}/im{n}", "gt")
               for n in neighbors]
        return lqs, gts

    def get_example(self, index: int, rng: np.random.Generator):
        neighbors = list(self.neighbor_list)
        if self.random_reverse and rng.random() < 0.5:
            neighbors.reverse()
        key = self.keys[index]
        lqs, gts = self._read_pair(key, neighbors)

        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale, rng)
        n = len(lqs)
        frames = augment_frames(lqs + gts, self.use_hflip, self.use_rot, rng)
        lqs = np.ascontiguousarray(np.stack(frames[:n]), np.float32)
        gts = np.ascontiguousarray(np.stack(frames[n:]), np.float32)

        if self.mirror_sequence:
            lqs = np.concatenate([lqs, lqs[::-1]], axis=0)
            gts = np.concatenate([gts, gts[::-1]], axis=0)
        elif self.pad_sequence:
            lqs = np.concatenate([lqs, lqs[-1:]], axis=0)
            gts = np.concatenate([gts, gts[-1:]], axis=0)
        return {"L": lqs, "H": gts, "key": key}


def color_jitter_frames(frames: np.ndarray, strength: float,
                        rng: np.random.Generator) -> np.ndarray:
    """Joint brightness/contrast/saturation/hue jitter over a (T,H,W,3)
    stack, matching torchvision ColorJitter semantics (factor ~ U[1-s,1+s],
    hue shift ~ U[-s,s], random op order). The reference applies one jitter
    to the whole stacked clip (dataset_video_train.py:443-444)."""
    ops = list(rng.permutation(4))
    b = rng.uniform(max(0.0, 1 - strength), 1 + strength)
    c = rng.uniform(max(0.0, 1 - strength), 1 + strength)
    s = rng.uniform(max(0.0, 1 - strength), 1 + strength)
    h = rng.uniform(-strength, strength)
    x = frames
    lum = np.asarray([0.299, 0.587, 0.114], np.float32)
    for op in ops:
        if op == 0:
            x = x * b
        elif op == 1:
            mean = (x @ lum).mean(axis=(-2, -1), keepdims=True)[..., None]
            x = (x - mean) * c + mean
        elif op == 2:
            gray = (x @ lum)[..., None]
            x = (x - gray) * s + gray
        else:
            # hue rotation in YIQ space (equivalent to HSV hue shift)
            theta = 2 * np.pi * h
            u, w = np.cos(theta), np.sin(theta)
            t_yiq = np.asarray([[0.299, 0.587, 0.114],
                                [0.596, -0.274, -0.322],
                                [0.211, -0.523, 0.312]], np.float32)
            r = np.asarray([[1, 0, 0], [0, u, -w], [0, w, u]], np.float32)
            m = (np.linalg.inv(t_yiq) @ r @ t_yiq).astype(np.float32)
            x = x @ m.T
        x = np.clip(x, 0.0, 1.0)
    return x.astype(np.float32)


class VideoRecurrentTrainVimeoVFIDataset(VideoRecurrentTrainVimeoDataset):
    """Frame-interpolation variant: L = neighbor frames, H = centre frame
    im4 (reference dataset_video_train.py:390-453); optional joint color
    jitter (:396-398, strength 0.05)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.color_jitter = bool(opt.get("color_jitter") or False)

    def get_example(self, index: int, rng: np.random.Generator):
        neighbors = list(self.neighbor_list)
        if self.random_reverse and rng.random() < 0.5:
            neighbors.reverse()
        key = self.keys[index]
        clip, seq = key.split("/")
        lqs = [self.source.read(self.lq_root, f"{clip}/{seq}/im{n}.png",
                                f"{clip}/{seq}/im{n}", "lq")
               for n in neighbors]
        gts = [self.source.read(self.gt_root, f"{clip}/{seq}/im4.png",
                                f"{clip}/{seq}/im4", "gt")]

        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale, rng)
        frames = augment_frames(lqs + gts, self.use_hflip, self.use_rot, rng)
        stack = np.ascontiguousarray(np.stack(frames), np.float32)
        if self.color_jitter:
            stack = color_jitter_frames(stack, 0.05, rng)
        return {"L": stack[:-1], "H": stack[-1:], "key": key}


class VideoRecurrentTestDataset(Dataset):
    """Whole-clip test dataset (reference dataset_video_test.py:11-130).

    With `sigma` set (non-blind denoising, :102-113), L = H + seeded AWGN
    with a constant σ-map channel appended. Supports meta_info folder lists
    and optional in-RAM caching (:53-93).
    """

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = Path(opt["dataroot_gt"])
        self.lq_root = Path(opt["dataroot_lq"])
        self.sigma = (opt.get("sigma") or 0) / 255.0
        self.cache_data = bool(opt.get("cache_data") or False)
        meta = opt.get("meta_info_file")
        if meta and os.path.exists(meta):
            with open(meta) as f:
                self.folders = [line.split(" ")[0].strip() for line in f
                                if line.strip()]
        else:
            self.folders = sorted(os.listdir(self.lq_root))
        self._cache: Dict[str, Any] = {}

    def __len__(self):
        return len(self.folders)

    def _load(self, folder: str):
        names = sorted(os.listdir(self.lq_root / folder))
        lqs = np.stack([_read_frame(self.lq_root / folder / n) for n in names])
        gts = np.stack([_read_frame(self.gt_root / folder / n) for n in names])
        return lqs.astype(np.float32), gts.astype(np.float32)

    def get_example(self, index: int, rng):
        folder = self.folders[index]
        if self.cache_data and folder in self._cache:
            lqs, gts = self._cache[folder]
        else:
            lqs, gts = self._load(folder)
            if self.cache_data:
                self._cache[folder] = (lqs, gts)
        if self.sigma:
            # seeded noise like reference torch.manual_seed(0) (:108-113);
            # RNG stream differs (numpy vs torch) but is deterministic.
            noise_rng = np.random.default_rng(0)
            lqs = gts + noise_rng.normal(0.0, self.sigma, gts.shape).astype(
                np.float32)
            t, h, w, _ = lqs.shape
            sigma_map = np.full((t, h, w, 1), self.sigma, np.float32)
            lqs = np.concatenate([lqs, sigma_map], axis=-1).astype(np.float32)
        return {"L": lqs, "H": gts, "folder": folder}


class SingleVideoRecurrentTestDataset(Dataset):
    """LQ-only whole-clip test dataset (reference dataset_video_test.py:133-226)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.lq_root = Path(opt["dataroot_lq"])
        meta = opt.get("meta_info_file")
        if meta and os.path.exists(meta):
            with open(meta) as f:
                self.folders = [line.split(" ")[0].strip() for line in f
                                if line.strip()]
        else:
            self.folders = sorted(os.listdir(self.lq_root))

    def __len__(self):
        return len(self.folders)

    def get_example(self, index: int, rng):
        folder = self.folders[index]
        names = sorted(os.listdir(self.lq_root / folder))
        lqs = np.stack([_read_frame(self.lq_root / folder / n) for n in names])
        return {"L": lqs.astype(np.float32), "folder": folder}


class VideoTestVimeo90KDataset(Dataset):
    """Vimeo90K-test: 7 LQ frames in, centre GT frame im4 out
    (reference dataset_video_test.py:229-297)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = Path(opt["dataroot_gt"])
        self.lq_root = Path(opt["dataroot_lq"])
        self.temporal_scale = opt.get("temporal_scale") or 1
        self.num_frame = opt.get("num_frame") or 7
        self.pad_sequence = bool(opt.get("pad_sequence") or False)
        self.mirror_sequence = bool(opt.get("mirror_sequence") or False)
        neighbor_list = [i + (9 - self.num_frame) // 2
                         for i in range(self.num_frame)][::self.temporal_scale]
        self.neighbor_list = neighbor_list
        meta = opt["meta_info_file"]
        with open(meta) as f:
            self.subfolders = [line.split(" ")[0].strip() for line in f
                               if line.strip()]

    def __len__(self):
        return len(self.subfolders)

    def get_example(self, index: int, rng):
        sub = self.subfolders[index]
        lqs = np.stack([_read_frame(self.lq_root / sub / f"im{n}.png")
                        for n in self.neighbor_list]).astype(np.float32)
        gt = _read_frame(self.gt_root / sub / "im4.png")[None].astype(np.float32)
        if self.pad_sequence:
            lqs = np.concatenate([lqs, lqs[-1:]], axis=0)
        if self.mirror_sequence:
            lqs = np.concatenate([lqs, lqs[::-1]], axis=0)
        return {"L": lqs, "H": gt, "folder": sub, "border": 0}


def _center_crop(img: np.ndarray, size) -> np.ndarray:
    th, tw = size
    h, w = img.shape[:2]
    top, left = (h - th) // 2, (w - tw) // 2
    return img[top: top + th, left: left + tw]


class VFI_DAVIS(Dataset):
    """DAVIS frame-interpolation test septuplets: L = 4 even frames, H =
    the skipped centre frame, centre-cropped to 480×840
    (reference dataset_video_test.py:300-343)."""

    crop = (480, 840)

    def __init__(self, data_root: str, ext: str = "png"):
        self.data_root = data_root
        self.images_sets: List[List[str]] = []
        self._build_sets()

    def _build_sets(self):
        for label_id in sorted(os.listdir(self.data_root)):
            imgs = sorted(os.listdir(os.path.join(self.data_root, label_id)))
            imgs = [os.path.join(self.data_root, label_id, p) for p in imgs]
            # frames start..start+6 step 2 give 4 inputs; GT = start+3
            # (reference :313-316)
            for start in range(0, len(imgs) - 6, 2):
                add = imgs[start: start + 7: 2]
                add = add[:2] + [imgs[start + 3]] + add[2:]
                self.images_sets.append(add)

    def __len__(self):
        return len(self.images_sets)

    def get_example(self, index: int, rng):
        paths = self.images_sets[index]
        imgs = [_center_crop(_read_frame(p), self.crop) for p in paths]
        arr = np.stack(imgs).astype(np.float32)
        return {"L": np.concatenate([arr[:2], arr[3:]], axis=0),
                "H": arr[2:3], "folder": str(index),
                "gt_path": ["vfi_result.png"]}


class VFI_UCF101(Dataset):
    """UCF101 frame-interpolation triplet dirs (frame0..3 + framet),
    centre-cropped to 224×224 (reference dataset_video_test.py:346-377)."""

    crop = (224, 224)

    def __init__(self, data_root: str, ext: str = "png"):
        self.data_root = data_root
        self.file_list = sorted(os.listdir(data_root))

    def __len__(self):
        return len(self.file_list)

    def get_example(self, index: int, rng):
        d = os.path.join(self.data_root, self.file_list[index])
        names = ["frame0.png", "frame1.png", "frame2.png", "frame3.png",
                 "framet.png"]
        imgs = [_center_crop(_read_frame(os.path.join(d, n)), self.crop)
                for n in names]
        arr = np.stack(imgs).astype(np.float32)
        return {"L": arr[:-1], "H": arr[-1:],
                "folder": self.file_list[index],
                "gt_path": ["vfi_result.png"]}


class VFI_Vid4(Dataset):
    """Vid4 frame-interpolation test with edge replication padding
    (reference dataset_video_test.py:380-425): clips are padded front/back
    so every odd frame becomes a GT target of its even neighbours."""

    def __init__(self, data_root: str, ext: str = "png"):
        self.data_root = data_root
        self.images_sets: List[List[str]] = []
        self.data_info: Dict[str, List[Any]] = {
            "lq_path": [], "gt_path": [], "folder": []}
        for label_id in sorted(os.listdir(data_root)):
            imgs = sorted(os.listdir(os.path.join(data_root, label_id)))
            imgs = [os.path.join(data_root, label_id, p) for p in imgs]
            if len(imgs) % 2 == 0:
                imgs.append(imgs[-1])
            # pad: [img1, None, img0..imgN, None, imgN-1] (reference :397-401)
            imgs.insert(0, None)
            imgs.insert(0, imgs[1])
            imgs.append(None)
            imgs.append(imgs[-2])
            for start in range(0, len(imgs) - 6, 2):
                add = imgs[start: start + 7: 2]
                self.data_info["lq_path"].append(
                    [os.path.basename(p) for p in add])
                self.data_info["gt_path"].append(
                    os.path.basename(imgs[start + 3]))
                self.data_info["folder"].append(label_id)
                add = add[:2] + [imgs[start + 3]] + add[2:]
                self.images_sets.append(add)

    def __len__(self):
        return len(self.images_sets)

    def get_example(self, index: int, rng):
        paths = self.images_sets[index]
        imgs = [_read_frame(p) for p in paths]
        arr = np.stack(imgs).astype(np.float32)
        return {"L": np.concatenate([arr[:2], arr[3:]], axis=0),
                "H": arr[2:3],
                "folder": self.data_info["folder"][index],
                "lq_path": self.data_info["lq_path"][index],
                "gt_path": [self.data_info["gt_path"][index]]}
