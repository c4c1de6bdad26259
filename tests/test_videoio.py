"""Video IO utilities."""

import os

import numpy as np
import pytest


def test_frames_video_roundtrip(tmp_path):
    import cv2
    from kair_tpu.utils.videoio import VideoReader, images2video, video2images

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        img = cv2.GaussianBlur((rng.rand(64, 80, 3) * 255).astype(np.uint8),
                               (0, 0), 3)
        cv2.imwrite(str(frames_dir / f"{i:08d}.png"), img)

    video_path = str(tmp_path / "clip.mp4")
    n = images2video(str(frames_dir), video_path, fps=10)
    assert n == 8 and os.path.exists(video_path)

    vr = VideoReader(video_path)
    assert len(vr) == 8
    assert vr.width == 80 and vr.height == 64
    f3 = vr.get_frame(3)
    assert f3.shape == (64, 80, 3)
    f1 = vr.get_frame(1)  # backwards seek path
    assert f1.shape == (64, 80, 3)

    out_dir = str(tmp_path / "out")
    assert video2images(video_path, out_dir) == 8


def test_add_video_compression():
    from kair_tpu.utils.videoio import add_video_compression

    rng = np.random.RandomState(1)
    imgs = [np.clip(rng.rand(64, 64, 3), 0, 1).astype(np.float32)
            for _ in range(4)]
    try:
        out = add_video_compression(imgs, rng=np.random.default_rng(0))
    except RuntimeError as e:
        pytest.skip(f"no mp4 codec: {e}")
    assert len(out) == 4
    assert out[0].shape == (64, 64, 3)
    # lossy: not identical, but correlated
    diff = np.abs(out[0] - imgs[0]).mean()
    assert 0 < diff < 0.5
