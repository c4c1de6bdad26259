"""Packed-frame store (lmdb-equivalent) + FileClient + dataset wiring."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("frames")
    for clip in ("000", "001"):
        d = root / clip
        d.mkdir()
        rng = np.random.RandomState(int(clip))
        for i in range(8):
            cv2.imwrite(str(d / f"{i:08d}.png"),
                        (rng.rand(24, 24, 3) * 255).astype(np.uint8))
    return root


@pytest.fixture(scope="module")
def pack(img_tree, tmp_path_factory):
    from kair_tpu.cli.make_framepack import main

    out = tmp_path_factory.mktemp("packs") / "frames.fpk"
    main(["--data_path", str(img_tree), "--pack_path", str(out),
          "--n_thread", "3"])
    return out


def test_pack_roundtrip_bytes_equal_disk(img_tree, pack):
    """Pack blobs decode to the exact pixels of the source files."""
    import cv2
    from kair_tpu.data.framepack import FramePackReader, imfrombytes

    r = FramePackReader(str(pack))
    assert len(r) == 16
    for clip, i in (("000", 0), ("001", 7), ("000", 3)):
        key = f"{clip}/{i:08d}"
        assert key in r
        got = imfrombytes(r.get(key))
        ref = cv2.imread(str(img_tree / clip / f"{i:08d}.png"))[:, :, ::-1]
        assert np.array_equal(got, ref)


def test_pack_meta_info_format(pack):
    """meta_info.txt lines match the reference lmdb format
    (utils_lmdb.py:121): 'key.png (h,w,c) level'."""
    lines = open(os.path.join(pack, "meta_info.txt")).read().splitlines()
    assert len(lines) == 16
    assert lines[0] == "000/00000000.png (24,24,3) 1"


def test_maker_refuses_overwrite(pack, tmp_path):
    from kair_tpu.data.framepack import FramePackMaker

    with pytest.raises(FileExistsError):
        FramePackMaker(str(pack))
    with pytest.raises(ValueError):
        FramePackMaker(str(tmp_path / "not_a_pack"))


def test_file_client(pack, img_tree):
    from kair_tpu.data.framepack import FileClient

    fc = FileClient("framepack", db_paths=[str(pack)], client_keys=["gt"])
    blob = fc.get("000/00000002", "gt")
    assert isinstance(blob, bytes) and blob[:4] == b"\x89PNG"
    disk = FileClient("disk")
    raw = disk.get(str(img_tree / "000" / "00000002.png"))
    assert raw[:4] == b"\x89PNG"
    with pytest.raises(ValueError):
        FileClient("memcached")
    with pytest.raises(ImportError):
        FileClient("lmdb", db_paths=[str(pack)])  # no lmdb module here


def test_video_dataset_framepack_backend_matches_disk(img_tree, pack,
                                                      tmp_path):
    """The same clip read through 'framepack' and 'disk' backends yields
    identical examples (keys per reference dataset_video_train.py:148)."""
    from kair_tpu.data.dataset_video import VideoRecurrentTrainDataset

    meta = tmp_path / "meta.txt"
    meta.write_text("000 8 (24,24,3) 0\n001 8 (24,24,3) 0\n")
    base = {"meta_info_file": str(meta), "scale": 1, "gt_size": 16,
            "num_frame": 3, "interval_list": [1], "random_reverse": False}
    ds_disk = VideoRecurrentTrainDataset(dict(
        base, dataroot_gt=str(img_tree), dataroot_lq=str(img_tree)))
    ds_pack = VideoRecurrentTrainDataset(dict(
        base, dataroot_gt=str(pack), dataroot_lq=str(pack),
        io_backend={"type": "framepack"}))
    a = ds_disk.get_example(2, np.random.default_rng(5))
    b = ds_pack.get_example(2, np.random.default_rng(5))
    assert np.array_equal(a["L"], b["L"])
    assert np.array_equal(a["H"], b["H"])


def test_packed_backend_requires_meta(img_tree, pack):
    from kair_tpu.data.dataset_video import VideoRecurrentTrainDataset

    with pytest.raises(ValueError, match="meta_info_file"):
        VideoRecurrentTrainDataset({
            "dataroot_gt": str(pack), "dataroot_lq": str(pack),
            "num_frame": 3, "io_backend": {"type": "framepack"}})
