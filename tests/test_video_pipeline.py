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
