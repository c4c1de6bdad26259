"""Native C++ patch loader: build, decode, sampling semantics."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(["png", "png", "jpg"]):
        img = (rng.rand(96, 112, 3) * 255).astype(np.uint8)
        p = str(root / f"im{i}.{ext}")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_loader_builds_and_decodes(img_files):
    from kair_tpu.data.native_loader import NativePatchLoader

    loader = NativePatchLoader(img_files, n_channels=1, n_threads=4)
    assert loader.n_images == 3
    h, w, c = loader.image_shape(0)
    assert (h, w, c) == (96, 112, 1)


def test_native_decode_matches_cv2(img_files):
    """PNG grayscale decode parity with the python path (BT.709 vs BT.601
    luma differ by a few grays; check correlation + bounds instead)."""
    import cv2
    from kair_tpu.data.native_loader import NativePatchLoader

    loader = NativePatchLoader(img_files[:1], n_channels=3, n_threads=1)
    h, w, c = loader.image_shape(0)
    batch = loader.sample_awgn_batch(4, 64, sigma=0.0, seed=1)
    ref = cv2.cvtColor(cv2.imread(img_files[0]), cv2.COLOR_BGR2RGB)
    # with sigma=0, every H patch must be an exact augmented crop of ref
    found = 0
    for i in range(4):
        patch = (batch["H"][i] * 255).round().astype(np.uint8)
        # check pixel-value histogram is a subset match (crop of ref)
        assert patch.min() >= ref.min() and patch.max() <= ref.max()
        found += 1
    assert found == 4
    np.testing.assert_allclose(batch["L"], batch["H"])  # sigma=0 → identical


def test_native_awgn_statistics(img_files):
    from kair_tpu.data.native_loader import NativePatchLoader

    loader = NativePatchLoader(img_files, n_channels=1, n_threads=4)
    batch = loader.sample_awgn_batch(16, 48, sigma=25.0, seed=7)
    noise = batch["L"] - batch["H"]
    assert abs(noise.mean()) < 2e-3
    assert abs(noise.std() - 25 / 255) < 2e-3
    # determinism: same seed → same batch
    b2 = loader.sample_awgn_batch(16, 48, sigma=25.0, seed=7)
    np.testing.assert_array_equal(batch["L"], b2["L"])
    b3 = loader.sample_awgn_batch(16, 48, sigma=25.0, seed=8)
    assert not np.array_equal(batch["L"], b3["L"])


def test_native_patch_too_large(img_files):
    from kair_tpu.data.native_loader import NativePatchLoader

    loader = NativePatchLoader(img_files, n_channels=1)
    with pytest.raises(RuntimeError):
        loader.sample_awgn_batch(2, 512, sigma=25.0, seed=0)


def test_native_throughput_beats_python(img_files):
    """The native sampler should comfortably outpace the python dataset at
    the same work (decode cached, crop+augment+noise per batch)."""
    import time
    from kair_tpu.data.native_loader import NativePatchLoader
    from kair_tpu.data.datasets import DatasetDnCNN
    from kair_tpu.data.base import collate

    import os
    loader = NativePatchLoader(img_files, n_channels=1, n_threads=8)
    t0 = time.perf_counter()
    for i in range(50):
        loader.sample_awgn_batch(16, 40, 25.0, seed=i)
    t_native = time.perf_counter() - t0

    ds = DatasetDnCNN({"dataroot_H": os.path.dirname(img_files[0]),
                       "n_channels": 1, "H_size": 40, "sigma": 25,
                       "phase": "train"})
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(50):
        collate([ds.get_example(j % len(ds), rng) for j in range(16)])
    t_python = time.perf_counter() - t0
    # python re-decodes per example; native caches — expect a big win
    assert t_native < t_python, (t_native, t_python)


def test_native_augment_mode_table():
    """The native 8-mode table must match utils_image.augment_img
    mode-for-mode (x8-ensemble / seeded-batch reproduction depend on the
    indexing, not just the D4 set)."""
    from kair_tpu.data.native_loader import native_augment
    from kair_tpu.utils.image import augment_img

    rng = np.random.RandomState(3)
    patch = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    for mode in range(8):
        expected = np.ascontiguousarray(augment_img(patch, mode))
        got = native_augment(patch, mode)
        np.testing.assert_array_equal(got, expected, err_msg=f"mode {mode}")


def test_native_epoch_loader_protocol(img_files):
    """NativeEpochLoader speaks the Loader epoch() protocol the train loop
    iterates (cli/train.py), with deterministic per-(epoch, batch) seeds."""
    from kair_tpu.data.native_loader import NativeEpochLoader

    ds_opt = {"dataroot_H": [str(p) for p in img_files], "n_channels": 1,
              "H_size": 32, "sigma": 25, "dataloader_num_workers": 2}
    ld = NativeEpochLoader(ds_opt, batch_size=2, seed=7)
    assert ld.n_images == 3 and len(ld) == 1
    b1 = list(ld.epoch(0))
    b2 = list(ld.epoch(0))
    b3 = list(ld.epoch(1))
    assert b1[0]["L"].shape == (2, 32, 32, 1)
    np.testing.assert_array_equal(b1[0]["H"], b2[0]["H"])   # reproducible
    assert np.abs(b1[0]["H"] - b3[0]["H"]).max() > 0        # epoch varies
    # AWGN statistics: L - H should be ~N(0, 25/255)
    noise = b1[0]["L"] - b1[0]["H"]
    assert abs(noise.std() - 25 / 255.0) < 0.25 * 25 / 255.0


def test_cli_train_uses_native_loader(img_files, tmp_path, monkeypatch):
    """cli.train end-to-end with use_native_loader: 2 steps complete and
    the batches really came from the native path (class spied)."""
    import json
    import kair_tpu.data.native_loader as nl
    from kair_tpu.cli import train as cli_train

    created = {}

    class Spy(nl.NativeEpochLoader):
        def __init__(self, *a, **k):
            created["used"] = True
            super().__init__(*a, **k)

    monkeypatch.setattr(nl, "NativeEpochLoader", Spy)

    img_dir = str(img_files[0]).rsplit("/", 1)[0]
    opt = {
        "task": "native_smoke", "model": "plain", "gpu_ids": [0],
        "scale": 1, "n_channels": 1,
        "path": {"root": str(tmp_path), "pretrained_netG": None},
        "datasets": {
            "train": {"name": "t", "dataset_type": "dncnn",
                      "dataroot_H": img_dir, "dataroot_L": None,
                      "H_size": 32, "sigma": 25, "sigma_test": 25,
                      "use_native_loader": True,
                      "dataloader_num_workers": 2,
                      "dataloader_batch_size": 2},
        },
        "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1, "nc": 8,
                 "nb": 3, "act_mode": "R", "init_type": "orthogonal",
                 "init_gain": 0.2},
        "train": {"G_lossfn_type": "l1", "G_lossfn_weight": 1.0,
                  "E_decay": 0, "manual_seed": 0,
                  "G_optimizer_type": "adam", "G_optimizer_lr": 1e-4,
                  "G_scheduler_type": "MultiStepLR",
                  "G_scheduler_milestones": [10 ** 6],
                  "G_scheduler_gamma": 0.5,
                  "checkpoint_test": 10 ** 6, "checkpoint_save": 10 ** 6,
                  "checkpoint_print": 1},
    }
    p = tmp_path / "opt.json"
    p.write_text(json.dumps(opt))
    state = cli_train.main(argv=["--opt", str(p), "--max_steps", "2"])
    assert int(state.step) == 2
    assert created.get("used"), "native loader path was not taken"


@pytest.fixture(scope="module")
def sr_pair_files(tmp_path_factory):
    """H random uint8; L = H[::2, ::2] (nearest) — under any shared 8-mode
    augment, each L pixel must equal a corner of its sf x sf H block."""
    import cv2

    root = tmp_path_factory.mktemp("srpairs")
    rng = np.random.RandomState(1)
    paths_l, paths_h = [], []
    for i in range(2):
        h = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        l = h[::2, ::2]
        ph, pl = str(root / f"h{i}.png"), str(root / f"l{i}.png")
        cv2.imwrite(ph, h)
        cv2.imwrite(pl, l)
        paths_h.append(ph)
        paths_l.append(pl)
    return paths_l, paths_h


def test_native_pair_loader_sr_alignment(sr_pair_files):
    from kair_tpu.data.native_loader import NativePairLoader

    paths_l, paths_h = sr_pair_files
    ld = NativePairLoader(paths_l, paths_h, n_channels=3, n_threads=2)
    assert ld.n_pairs == 2
    sf, lp = 2, 16
    b = ld.sample_sr_batch(8, lp, sf, seed=3)
    assert b["L"].shape == (8, lp, lp, 3)
    assert b["H"].shape == (8, lp * sf, lp * sf, 3)
    for i in range(8):
        l, h = b["L"][i], b["H"][i]
        corners = np.stack([h[d::sf, e::sf] for d in (0, sf - 1)
                            for e in (0, sf - 1)])          # (4, lp, lp, 3)
        match = (np.abs(corners - l[None]) < 1e-6).all(-1).any(0)
        assert match.all(), "L pixel not found at any corner of its H block"
    # reproducible / epoch-varying
    b2 = ld.sample_sr_batch(8, lp, sf, seed=3)
    np.testing.assert_array_equal(b["H"], b2["H"])
    b3 = ld.sample_sr_batch(8, lp, sf, seed=4)
    assert np.abs(b["H"] - b3["H"]).max() > 0


def test_native_epoch_loader_sr_protocol(sr_pair_files):
    from kair_tpu.data.native_loader import NativeEpochLoader

    paths_l, paths_h = sr_pair_files
    ds_opt = {"dataset_type": "sr", "dataroot_H": paths_h,
              "dataroot_L": paths_l, "scale": 2, "H_size": 32,
              "n_channels": 3, "dataloader_num_workers": 2}
    ld = NativeEpochLoader(ds_opt, batch_size=2, seed=0)
    batch = next(iter(ld.epoch(0)))
    assert batch["L"].shape == (2, 16, 16, 3)
    assert batch["H"].shape == (2, 32, 32, 3)


def test_native_epoch_loader_rejects_unsupported():
    from kair_tpu.data.native_loader import NativeEpochLoader

    with pytest.raises(ValueError):
        # plain (scale 1) has no on-the-fly branch: L files are required
        NativeEpochLoader({"dataset_type": "plain", "dataroot_H": ["x"],
                           "dataroot_L": None}, 2)
    with pytest.raises(ValueError):
        NativeEpochLoader({"dataset_type": "usrnet", "dataroot_H": ["x"]}, 2)
    with pytest.raises(ValueError):
        NativeEpochLoader({"dataset_type": "dncnn", "dataroot_H": ["x"],
                           "sigma": [0, 75]}, 2)


def test_native_bicubic_matches_imresize_np():
    """The C++ MATLAB-bicubic downscale must match utils.image.imresize_np
    (reference utils_image.py:871-1014) — the on-the-fly SR train
    degradation (dataset_sr.py:66)."""
    from kair_tpu.data.native_loader import native_bicubic_downscale
    from kair_tpu.utils import image as im

    rng = np.random.RandomState(7)
    for sf, (h, w) in [(2, (40, 56)), (3, (39, 45)), (4, (37, 52))]:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        got = native_bicubic_downscale(img, sf)
        want = im.imresize_np(im.uint2single(img), 1 / sf, True)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_native_sr_onthefly_protocol(tmp_path):
    """On-the-fly branch end-to-end: with an image exactly one L patch big,
    the sampled L must be an 8-mode augment of imresize_np(H) and H the
    SAME-mode augment of the source (DatasetSR.get_example:151-167)."""
    import cv2
    from kair_tpu.data.native_loader import NativeEpochLoader
    from kair_tpu.utils import image as im

    sf, lp = 4, 12
    rng = np.random.RandomState(3)
    src = (rng.rand(lp * sf + 2, lp * sf + 3, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "h.png")
    cv2.imwrite(p, src[:, :, ::-1])          # cv2 writes BGR

    ds_opt = {"dataset_type": "sr", "dataroot_H": [p], "dataroot_L": None,
              "scale": sf, "H_size": lp * sf, "n_channels": 3,
              "dataloader_num_workers": 2}
    ld = NativeEpochLoader(ds_opt, batch_size=4, seed=0)
    batch = next(iter(ld.epoch(0)))
    assert batch["L"].shape == (4, lp, lp, 3)
    assert batch["H"].shape == (4, lp * sf, lp * sf, 3)

    h_mod = im.modcrop(src, sf)              # (lp*sf, lp*sf, 3)
    l_full = im.imresize_np(im.uint2single(h_mod), 1 / sf, True)
    h_full = im.uint2single(h_mod)
    for i in range(4):
        matched = False
        for mode in range(8):
            if np.allclose(batch["L"][i],
                           im.augment_img(l_full, mode).astype(np.float32),
                           atol=1e-5):
                np.testing.assert_allclose(
                    batch["H"][i],
                    im.augment_img(h_full, mode).astype(np.float32),
                    atol=1e-5)
                matched = True
                break
        assert matched, f"item {i}: L is not any augment of imresize_np(H)"


def test_native_epoch_loader_ffdnet_fdncnn(img_files):
    """sigma-range protocols: FFDNet gets scalar C (b,1,1,1); FDnCNN gets
    the level-map channel concatenated into L (datasets.py:96,133)."""
    from kair_tpu.data.native_loader import NativeEpochLoader

    base = {"dataroot_H": [str(p) for p in img_files], "n_channels": 1,
            "H_size": 32, "sigma": [10, 50], "dataloader_num_workers": 2}
    ff = NativeEpochLoader(dict(base, dataset_type="ffdnet"), 4, seed=1)
    b = next(iter(ff.epoch(0)))
    assert b["L"].shape == (4, 32, 32, 1) and b["C"].shape == (4, 1, 1, 1)
    assert (b["C"] >= 10 / 255 - 1e-6).all() and (b["C"] <= 50 / 255 + 1e-6).all()
    assert np.std(b["C"]) > 0                       # per-item levels differ
    # noise magnitude tracks the drawn level per item
    for i in range(4):
        n = b["L"][i] - b["H"][i]
        assert abs(n.std() - b["C"][i, 0, 0, 0]) < 0.35 * b["C"][i, 0, 0, 0]

    fd = NativeEpochLoader(dict(base, dataset_type="fdncnn"), 4, seed=1)
    b2 = next(iter(fd.epoch(0)))
    assert b2["L"].shape == (4, 32, 32, 2)          # noisy + level map
    assert b2["H"].shape == (4, 32, 32, 1)
    for i in range(4):
        m = b2["L"][i, :, :, 1]
        assert m.min() == m.max()                   # constant map per item
    # same seed scheme -> same underlying draw as the ffdnet loader
    np.testing.assert_allclose(b2["L"][..., :1], b["L"], atol=0)
