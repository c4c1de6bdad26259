"""SPECT utilities/datasets + model summary tests."""

import numpy as np
import pytest


def test_spect_normalize_roundtrip():
    from kair_tpu.utils.spect import denormalize_spect, normalize_spect

    img = np.random.RandomState(0).rand(16, 16, 2).astype(np.float32) * 150
    for method in ("log", "anscombe", "linear"):
        n = normalize_spect(img, method, 150)
        d = denormalize_spect(n, method, 150)
        np.testing.assert_allclose(d, img, rtol=1e-5, atol=1e-3)


def test_spect_normalize_matches_reference():
    import sys, types
    sys.path.insert(0, "/root/reference")
    for m in ("lpips", "pytorch_fid"):
        sys.modules.setdefault(m, types.ModuleType(m))
    from utils import utils_spect as ref
    from kair_tpu.utils.spect import normalize_spect

    img = np.random.RandomState(1).rand(8, 8) * 150
    for method in ("log", "anscombe", "linear"):
        np.testing.assert_allclose(normalize_spect(img, method, 150),
                                   ref.normalize_spect(img, method, 150),
                                   atol=1e-12)


@pytest.fixture(scope="module")
def spect_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("spect")
    (root / "H").mkdir(); (root / "L").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        h = rng.poisson(30, (2, 1024, 256)).astype(np.float32)
        l = rng.poisson(h / 4).astype(np.float32)
        h.tofile(root / "H" / f"{i}.dat")
        l.tofile(root / "L" / f"{i}.dat")
    return root


def test_spect_dataset(spect_dir):
    from kair_tpu.data.datasets import define_dataset

    opt = {"dataset_type": "spect", "dataroot_H": str(spect_dir / "H"),
           "dataroot_L": str(spect_dir / "L"), "phase": "train", "H_size": 64,
           "normalization": {"type": "log", "max_pixel": 150}}
    ds = define_dataset(opt)
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (64, 64, 2)
    assert ex["H"].shape == (64, 64, 2)
    assert 0 <= ex["H"].min() and ex["H"].max() <= 1.2


def test_spect_patch_dataset(spect_dir):
    from kair_tpu.data.datasets import define_dataset

    opt = {"dataset_type": "spectpatch", "dataroot_H": str(spect_dir / "H"),
           "dataroot_L": str(spect_dir / "L"), "phase": "train", "H_size": 32,
           "num_patches_per_image": 4,
           "normalization": {"type": "anscombe", "max_pixel": 150}}
    ds = define_dataset(opt)
    assert len(ds) == 8  # 2 images x 4 patches
    ex = ds.get_example(3, np.random.default_rng(1))
    assert ex["L"].shape == (32, 32, 2)
    bank0 = ds._bank_h[0].copy()
    ds.update_data(np.random.default_rng(99))
    assert not np.array_equal(ds._bank_h[0], bank0)  # resampled


def test_summary_counts():
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.dncnn import DnCNN
    from kair_tpu.utils.summary import (activation_count, cost_analysis,
                                        count_params, summary_report)

    model = DnCNN(1, 1, 16, 4, "R")
    x = jnp.zeros((1, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x)
    n = count_params(v["params"])
    # convs: 1->16 (160), 16->16 x2 (2320 each), 16->1 (145)
    assert n == 160 + 2320 * 2 + 145
    ca = cost_analysis(lambda a: model.apply(v, a), x)
    # ~9.7 MFLOPs analytic; XLA's count is slightly lower at borders
    assert 5e6 < ca.get("flops", 0) < 2e7
    rep = summary_report(model, v, x)
    assert "params" in rep and "FLOPs" in rep
    assert activation_count(lambda a: model.apply(v, a), x) > 0


def test_anscombe_variance_stabilisation():
    """Anscombe-transformed Poisson variates have ~unit variance across a
    wide intensity range, and the unbiased inverse recovers the mean
    (fork 理论测试/test_anscombe_gaussian.py subject matter)."""
    from kair_tpu.utils.spect import anscombe, inverse_anscombe

    rng = np.random.default_rng(0)
    for lam in (5.0, 20.0, 80.0, 150.0):
        k = rng.poisson(lam, size=200_000)
        v = anscombe(k).var()
        assert abs(v - 1.0) < 0.05, (lam, v)
        # the unbiased inverse maps E[anscombe(k)] back to λ (it corrects
        # the Jensen bias of the sqrt — applied to the denoised/expected
        # transform value, as in Makitalo & Foi)
        lam_hat = float(inverse_anscombe(np.mean(anscombe(k))))
        assert abs(lam_hat - lam) / lam < 0.02, (lam, lam_hat)
        biased = float(inverse_anscombe(np.mean(anscombe(k)),
                                        unbiased=False))
        assert abs(lam_hat - lam) < abs(biased - lam), (lam, lam_hat, biased)


def test_binomial_thinning_is_poisson_dose_reduction():
    """thin(Poisson(λ), p) ≡ Poisson(pλ): mean AND variance must both be
    pλ (a naive scale-by-p would give variance p²λ)."""
    from kair_tpu.utils.spect import binomial_thin

    rng = np.random.default_rng(1)
    lam, p = 40.0, 0.25
    full = rng.poisson(lam, size=500_000).astype(np.float32)
    low = binomial_thin(full, p, rng)
    assert abs(low.mean() - p * lam) / (p * lam) < 0.01
    assert abs(low.var() - p * lam) / (p * lam) < 0.02
    # and the distribution matches a direct Poisson(pλ) draw (chi^2-ish)
    direct = rng.poisson(p * lam, size=500_000)
    for q in (5, 25, 50, 75, 95):
        a, b = np.percentile(low, q), np.percentile(direct, q)
        assert abs(a - b) <= 1.0, (q, a, b)
    import pytest
    with pytest.raises(ValueError):
        binomial_thin(full, 1.5, rng)
