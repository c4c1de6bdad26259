"""Video datasets + tiled video inference + video trainer tests."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("video")
    for kind, size in (("GT", 64), ("LQ", 16)):
        for clip in ("000", "001"):
            d = root / kind / clip
            d.mkdir(parents=True)
            rng = np.random.RandomState(hash(clip) % 100)
            for i in range(10):
                img = cv2.GaussianBlur(
                    (rng.rand(size, size, 3) * 255).astype(np.uint8), (0, 0), 2)
                cv2.imwrite(str(d / f"{i:08d}.png"), img)
    return root


def test_video_train_dataset(video_root):
    from kair_tpu.data.dataset_video import VideoRecurrentTrainDataset

    ds = VideoRecurrentTrainDataset({
        "dataroot_gt": str(video_root / "GT"),
        "dataroot_lq": str(video_root / "LQ"),
        "scale": 4, "gt_size": 32, "num_frame": 4,
        "interval_list": [1], "random_reverse": True})
    assert len(ds) == 20
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (4, 8, 8, 3)
    assert ex["H"].shape == (4, 32, 32, 3)


def test_video_test_dataset(video_root):
    from kair_tpu.data.dataset_video import VideoRecurrentTestDataset

    ds = VideoRecurrentTestDataset({
        "dataroot_gt": str(video_root / "GT"),
        "dataroot_lq": str(video_root / "LQ")})
    assert len(ds) == 2
    ex = ds.get_example(0, None)
    assert ex["L"].shape == (10, 16, 16, 3)
    assert ex["H"].shape == (10, 64, 64, 3)


def test_tiled_video_inference_matches_monolithic():
    """Temporal+spatial tiling of a LINEAR (halo-free) upscaler is exact,
    validating the accumulation/blending logic."""
    from kair_tpu.eval.video_test import test_video, test_video_ensembled
    import jax.numpy as jnp
    from kair_tpu.ops.blocks import upsample_nearest

    def fn(x):  # per-pixel x4 upsample — linear, window-independent
        b, d, h, w, c = x.shape
        y = upsample_nearest(x.reshape(b * d, h, w, c), 4)
        return jnp.asarray(y.reshape(b, d, h * 4, w * 4, c) * 2.0)

    lq = np.random.RandomState(0).rand(1, 10, 24, 24, 3).astype(np.float32)
    want = np.asarray(fn(lq))
    got = test_video(fn, lq, sf=4, window_size=(2, 8, 8),
                     num_frame_testing=4, num_frame_overlapping=2,
                     size_patch_testing=16, patch_overlap=8)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # ensembled wrapper shape checks
    got2 = test_video_ensembled(fn, lq, sf=4, pad_seq=True, flip_seq=True,
                                window_size=(2, 8, 8))
    assert got2.shape == want.shape


@pytest.mark.slow
def test_video_trainer_flow_freeze():
    """fix_keys params must not move before fix_iter and move after."""
    import jax
    from kair_tpu.train.video import VideoTrainer

    opt = {"netG": {"net_type": "spynet", "return_levels": [5]},
           "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                     "G_scheduler_milestones": [100000],
                     "fix_iter": 2, "fix_keys": ["basic0"], "fix_lr_mul": 0.5,
                     "E_decay": 0}}
    trainer = VideoTrainer(opt)

    rng = np.random.RandomState(0)
    ref = rng.rand(2, 64, 64, 3).astype(np.float32)
    supp = rng.rand(2, 64, 64, 3).astype(np.float32)
    variables = trainer.model.init(jax.random.PRNGKey(0), ref, supp)
    params = variables["params"]

    import optax
    from kair_tpu.train.trainer import TrainState

    state = TrainState(step=np.int32(0), params=params,
                       opt_state=trainer.tx.init(params))

    def loss_fn(p):
        out = trainer.model.apply({"params": p}, ref, supp)
        return jax.numpy.mean(out ** 2)

    import jax.numpy as jnp

    p0_flow = np.asarray(params["basic0"]["conv0"]["conv"]["kernel"]).copy()
    p0_norm = np.asarray(params["basic1"]["conv0"]["conv"]["kernel"]).copy()

    p, opt_state = params, state.opt_state
    for step in range(4):
        grads = jax.grad(loss_fn)(p)
        updates, opt_state = trainer.tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        flow_moved = not np.allclose(
            np.asarray(p["basic0"]["conv0"]["conv"]["kernel"]), p0_flow)
        norm_moved = not np.allclose(
            np.asarray(p["basic1"]["conv0"]["conv"]["kernel"]), p0_norm)
        if step < 2:
            assert not flow_moved, f"flow params moved at step {step}"
        assert norm_moved, "normal params should always move"
    assert flow_moved, "flow params should move after fix_iter"


@pytest.fixture(scope="module")
def vimeo_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vimeo")
    seqs = [("00001", "0001"), ("00001", "0002"), ("00002", "0001")]
    for kind, size in (("GT", 32), ("LQ", 8)):
        for clip, seq in seqs:
            d = root / kind / clip / seq
            d.mkdir(parents=True)
            rng = np.random.RandomState(1)
            for i in range(1, 8):
                cv2.imwrite(str(d / f"im{i}.png"),
                            (rng.rand(size, size, 3) * 255).astype(np.uint8))
    meta = root / "meta.txt"
    meta.write_text("".join(f"{c}/{s} 7 (32,32,3)\n" for c, s in seqs))
    return root


def test_video_train_nonblind_denoising(video_root):
    from kair_tpu.data.dataset_video import (
        VideoRecurrentTrainNonblindDenoisingDataset)

    ds = VideoRecurrentTrainNonblindDenoisingDataset({
        "dataroot_gt": str(video_root / "GT"),
        "dataroot_lq": str(video_root / "GT"),
        "scale": 1, "gt_size": 32, "num_frame": 4,
        "sigma_min": 10, "sigma_max": 10})
    ex = ds.get_example(0, np.random.default_rng(0))
    # L = noisy GT + sigma-map channel; crop is at GT scale (reference :237)
    assert ex["L"].shape == (4, 32, 32, 4)
    assert ex["H"].shape == (4, 32, 32, 3)
    sigma_map = ex["L"][..., 3]
    assert np.allclose(sigma_map, 10 / 255.0)
    noise = ex["L"][..., :3] - ex["H"]
    assert 0.5 * 10 / 255 < noise.std() < 2.0 * 10 / 255


def test_video_train_vimeo(vimeo_root):
    from kair_tpu.data.dataset_video import VideoRecurrentTrainVimeoDataset

    ds = VideoRecurrentTrainVimeoDataset({
        "dataroot_gt": str(vimeo_root / "GT"),
        "dataroot_lq": str(vimeo_root / "LQ"),
        "meta_info_file": str(vimeo_root / "meta.txt"),
        "scale": 4, "gt_size": 16, "num_frame": 7, "random_reverse": False})
    assert len(ds) == 3
    assert ds.neighbor_list == [1, 2, 3, 4, 5, 6, 7]
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (7, 4, 4, 3)
    assert ex["H"].shape == (7, 16, 16, 3)

    # pad_sequence: 7 -> 8 with last frame repeated (reference :378-380)
    ds_pad = VideoRecurrentTrainVimeoDataset({
        "dataroot_gt": str(vimeo_root / "GT"),
        "dataroot_lq": str(vimeo_root / "LQ"),
        "meta_info_file": str(vimeo_root / "meta.txt"),
        "scale": 4, "gt_size": 16, "num_frame": 7, "random_reverse": False,
        "pad_sequence": True})
    ex = ds_pad.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (8, 4, 4, 3)
    assert np.array_equal(ex["L"][7], ex["L"][6])

    # mirror_sequence: 7 -> 14 reversed copy (reference :375-377)
    ds_mir = VideoRecurrentTrainVimeoDataset({
        "dataroot_gt": str(vimeo_root / "GT"),
        "dataroot_lq": str(vimeo_root / "LQ"),
        "meta_info_file": str(vimeo_root / "meta.txt"),
        "scale": 4, "gt_size": 16, "num_frame": 7, "random_reverse": False,
        "mirror_sequence": True})
    ex = ds_mir.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (14, 4, 4, 3)
    assert np.array_equal(ex["L"][13], ex["L"][0])


def test_video_train_vimeo_vfi(vimeo_root):
    from kair_tpu.data.dataset_video import VideoRecurrentTrainVimeoVFIDataset

    ds = VideoRecurrentTrainVimeoVFIDataset({
        "dataroot_gt": str(vimeo_root / "GT"),
        "dataroot_lq": str(vimeo_root / "GT"),
        "meta_info_file": str(vimeo_root / "meta.txt"),
        "scale": 1, "gt_size": 16, "num_frame": 6, "random_reverse": False,
        "color_jitter": True})
    # num_frame=6 -> neighbors im1..im6; GT is always im4 (reference :426-431)
    assert ds.neighbor_list == [1, 2, 3, 4, 5, 6]
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (6, 16, 16, 3)
    assert ex["H"].shape == (1, 16, 16, 3)
    assert ex["L"].min() >= 0 and ex["L"].max() <= 1


def test_color_jitter_identity_and_determinism():
    from kair_tpu.data.dataset_video import color_jitter_frames

    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    # strength 0 -> all factors are exactly 1 / hue shift 0 -> identity
    y = color_jitter_frames(x, 0.0, np.random.default_rng(0))
    assert np.allclose(y, x, atol=1e-5)
    a = color_jitter_frames(x, 0.05, np.random.default_rng(3))
    b = color_jitter_frames(x, 0.05, np.random.default_rng(3))
    assert np.array_equal(a, b)
    assert not np.allclose(a, x)


def test_video_test_sigma_and_cache(video_root):
    from kair_tpu.data.dataset_video import VideoRecurrentTestDataset

    ds = VideoRecurrentTestDataset({
        "dataroot_gt": str(video_root / "GT"),
        "dataroot_lq": str(video_root / "GT"),
        "sigma": 25, "cache_data": True})
    ex1 = ds.get_example(0, None)
    ex2 = ds.get_example(0, None)
    assert ex1["L"].shape == (10, 64, 64, 4)
    assert np.allclose(ex1["L"][..., 3], 25 / 255.0)
    # seeded noise -> bitwise-reproducible across calls (reference :108)
    assert np.array_equal(ex1["L"], ex2["L"])


def test_single_video_test_dataset(video_root):
    from kair_tpu.data.dataset_video import SingleVideoRecurrentTestDataset

    ds = SingleVideoRecurrentTestDataset(
        {"dataroot_lq": str(video_root / "LQ")})
    assert len(ds) == 2
    ex = ds.get_example(1, None)
    assert ex["L"].shape == (10, 16, 16, 3)
    assert "H" not in ex
    assert ex["folder"] == "001"


def test_video_test_vimeo90k(vimeo_root):
    from kair_tpu.data.dataset_video import VideoTestVimeo90KDataset

    ds = VideoTestVimeo90KDataset({
        "dataroot_gt": str(vimeo_root / "GT"),
        "dataroot_lq": str(vimeo_root / "LQ"),
        "meta_info_file": str(vimeo_root / "meta.txt"),
        "num_frame": 7, "pad_sequence": True})
    assert len(ds) == 3
    ex = ds.get_example(0, None)
    assert ex["L"].shape == (8, 8, 8, 3)       # 7 LQ frames + pad
    assert ex["H"].shape == (1, 32, 32, 3)     # centre GT frame im4


@pytest.fixture(scope="module")
def vfi_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vfi")
    # DAVIS/Vid4-style: clip folders of numbered frames
    for clip in ("bear", "bus"):
        d = root / "clips" / clip
        d.mkdir(parents=True)
        for i in range(9):
            img = np.full((16, 16, 3), i * 20, np.uint8)
            cv2.imwrite(str(d / f"{i:05d}.png"), img)
    # UCF101-style: triplet dirs with fixed names
    for trip in ("t0", "t1"):
        d = root / "ucf" / trip
        d.mkdir(parents=True)
        for name in ("frame0", "frame1", "frame2", "frame3", "framet"):
            cv2.imwrite(str(d / f"{name}.png"),
                        np.full((12, 12, 3), 100, np.uint8))
    return root


def test_vfi_davis(vfi_root):
    from kair_tpu.data.dataset_video import VFI_DAVIS

    ds = VFI_DAVIS(str(vfi_root / "clips"))
    ds.crop = (12, 12)
    # per clip: start ∈ {0, 2} -> 2 sets; 2 clips -> 4
    assert len(ds) == 4
    ex = ds.get_example(0, None)
    assert ex["L"].shape == (4, 12, 12, 3)
    assert ex["H"].shape == (1, 12, 12, 3)
    # GT is the frame between inputs 1 and 2 (odd index start+3)
    lq_means = ex["L"].mean(axis=(1, 2, 3)) * 255
    gt_mean = ex["H"].mean() * 255
    assert lq_means[1] < gt_mean < lq_means[2]


def test_vfi_ucf101(vfi_root):
    from kair_tpu.data.dataset_video import VFI_UCF101

    ds = VFI_UCF101(str(vfi_root / "ucf"))
    ds.crop = (8, 8)
    assert len(ds) == 2
    ex = ds.get_example(0, None)
    assert ex["L"].shape == (4, 8, 8, 3)
    assert ex["H"].shape == (1, 8, 8, 3)
    assert ex["folder"] == "t0"


def test_vfi_vid4(vfi_root):
    from kair_tpu.data.dataset_video import VFI_Vid4

    ds = VFI_Vid4(str(vfi_root / "clips"))
    assert len(ds) > 0
    for i in range(len(ds)):
        ex = ds.get_example(i, None)
        assert ex["L"].shape == (4, 16, 16, 3)
        assert ex["H"].shape == (1, 16, 16, 3)
        assert len(ex["lq_path"]) == 4


def test_video_dataset_registry_routes_new_types(video_root):
    from kair_tpu.data.datasets import define_dataset

    ds = define_dataset({
        "dataset_type": "VideoRecurrentTrainNonblindDenoisingDataset",
        "dataroot_gt": str(video_root / "GT"),
        "dataroot_lq": str(video_root / "GT"),
        "scale": 1, "gt_size": 32, "num_frame": 2,
        "sigma_min": 0, "sigma_max": 50})
    assert len(ds) == 20
    ds2 = define_dataset({
        "dataset_type": "SingleVideoRecurrentTestDataset",
        "dataroot_lq": str(video_root / "LQ")})
    assert len(ds2) == 2


def _tiny_rvrt():
    from kair_tpu.models.rvrt import RVRT

    return RVRT(upscale=4, clip_size=2, window_size=(2, 4, 4),
                num_blocks=(1, 1, 1), depths=(1, 1, 1),
                embed_dims=(16, 16, 16), num_heads=(2, 2, 2),
                inputconv_groups=(1, 1, 1, 1, 1, 1),
                deformable_groups=2, attention_heads=2,
                attention_window=(3, 3))


@pytest.mark.slow
def test_rvrt_streamed_matches_full():
    """Chunked long-video path (host feature cache, O(clip) device
    residency) == monolithic forward (reference cpu_cache semantics,
    network_rvrt.py:1115-1155)."""
    import jax
    from kair_tpu.eval.rvrt_stream import rvrt_forward_streamed

    model = _tiny_rvrt()
    rng = np.random.RandomState(0)
    lqs = rng.rand(1, 4, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), lqs[:, :4])
    want = np.asarray(model.apply(variables, lqs))
    got = rvrt_forward_streamed(model, variables, lqs)
    assert got.shape == want.shape == (1, 4, 256, 256, 3)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_rvrt_streamed_long_sequence():
    """30+ frames through the chunked path — the regime the reference's
    CPU cache exists for — still matches the monolithic forward."""
    import jax
    from kair_tpu.eval.rvrt_stream import rvrt_forward_streamed

    model = _tiny_rvrt()
    rng = np.random.RandomState(1)
    lqs = rng.rand(1, 32, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), lqs[:, :4])
    want = np.asarray(model.apply(variables, lqs))
    got = rvrt_forward_streamed(model, variables, lqs)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
