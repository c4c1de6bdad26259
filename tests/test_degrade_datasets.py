"""Degradation synthesis + extended dataset tests."""

import numpy as np
import pytest

from tests.conftest import FIXTURES


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("H")
    rng = np.random.RandomState(0)
    for i in range(3):
        img = cv2.GaussianBlur((rng.rand(380, 400, 3) * 255).astype(np.uint8),
                               (0, 0), 3.0)
        cv2.imwrite(str(root / f"im{i}.png"), img)
    return str(root)


def test_kernel_synthesis_matches_reference():
    """anisotropic_gaussian vs the reference implementation on same params."""
    import sys, types
    sys.path.insert(0, "/root/reference")
    for m in ("lpips", "pytorch_fid"):
        sys.modules.setdefault(m, types.ModuleType(m))
    from utils import utils_sisr as ref
    from kair_tpu.degrade.sisr import anisotropic_gaussian

    for theta, l1, l2 in [(0.3, 4.0, 2.0), (np.pi / 2, 8.0, 1.0), (2.7, 0.5, 0.4)]:
        got = anisotropic_gaussian(15, theta, l1, l2)
        want = ref.anisotropic_Gaussian(15, theta, l1, l2)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_degradations_match_reference():
    import sys, types
    sys.path.insert(0, "/root/reference")
    for m in ("lpips", "pytorch_fid"):
        sys.modules.setdefault(m, types.ModuleType(m))
    from utils import utils_sisr as ref
    from kair_tpu.degrade import sisr

    rng = np.random.RandomState(0)
    x = rng.rand(48, 48, 3)
    k = sisr.anisotropic_gaussian(15, 0.5, 3.0, 1.0)
    np.testing.assert_allclose(sisr.classical_degradation(x, k, 3),
                               ref.classical_degradation(x, k, 3), atol=1e-10)
    # srmd/dpsr use imresize internally; reference's numpy version is broken
    # under modern torch (see make_fixtures_image), so compare only the blur
    # stage via classical_degradation above and shapes here.
    assert sisr.srmd_degradation(x, k, 3).shape == (16, 16, 3)
    assert sisr.dpsr_degradation(x, k, 3).shape == (16, 16, 3)


def test_motion_kernel():
    from kair_tpu.degrade.deblur import blurkernel_synthesis

    rng = np.random.default_rng(0)
    k = blurkernel_synthesis(h=25, rng=rng)
    assert k.shape == (25, 25)
    assert abs(k.sum() - 1.0) < 1e-9
    assert (k >= 0).all()


def test_psf2otf_identity():
    from kair_tpu.degrade.deblur import psf2otf

    delta = np.zeros((5, 5)); delta[2, 2] = 1.0
    otf = psf2otf(delta, (16, 16))
    np.testing.assert_allclose(np.abs(otf), 1.0, atol=1e-10)


def test_bsrgan_pipeline(imgdir):
    from kair_tpu.degrade.blindsr import degradation_bsrgan, degradation_bsrgan_plus
    from kair_tpu.utils import image as im

    img = im.uint2single(im.imread_uint(f"{imgdir}/im0.png", 3))
    rng = np.random.default_rng(0)
    lq, hq = degradation_bsrgan(img, sf=4, lq_patchsize=64, rng=rng)
    assert lq.shape == (64, 64, 3) and hq.shape == (256, 256, 3)
    assert 0 <= lq.min() and lq.max() <= 1
    lq, hq = degradation_bsrgan_plus(img, sf=4, lq_patchsize=48, rng=rng)
    assert lq.shape == (48, 48, 3) and hq.shape == (192, 192, 3)


@pytest.mark.parametrize("ds_type,extra", [
    ("srmd", {"scale": 4, "H_size": 64, "sigma": [0, 50]}),
    ("dpsr", {"scale": 4, "H_size": 64, "sigma": [0, 50]}),
    ("usrnet", {"H_size": 64, "dataloader_batch_size": 2}),
    ("blindsr", {"scale": 4, "lq_patchsize": 32}),
    ("jpeg", {"H_size": 64, "quality_factor": 40}),
])
def test_extended_datasets(imgdir, ds_type, extra):
    from kair_tpu.data.datasets import define_dataset

    opt = {"dataset_type": ds_type, "dataroot_H": imgdir, "phase": "train",
           "n_channels": 3, **extra}
    ds = define_dataset(opt)
    rng = np.random.default_rng(0)
    ex = ds.get_example(0, rng)
    assert "L" in ex and "H" in ex
    assert ex["L"].dtype == np.float32
    if ds_type == "srmd":
        assert ex["L"].shape[-1] == 3 + 15 + 1   # img + PCA + sigma
        assert ex["L"].shape[:2] == (16, 16)
    if ds_type == "dpsr":
        assert ex["L"].shape[-1] == 4
    if ds_type == "usrnet":
        assert ex["k"].shape == (25, 25, 1)
        assert ex["sigma"].shape == (1, 1, 1)
        assert isinstance(ex["sf"], int)
    if ds_type == "jpeg":
        assert ex["L"].shape == ex["H"].shape


def test_usrnet_dataset_eval_mode(imgdir):
    from kair_tpu.data.datasets import define_dataset

    opt = {"dataset_type": "usrnet", "dataroot_H": imgdir, "phase": "test",
           "n_channels": 3, "sf_validation": 3}
    ds = define_dataset(opt)
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["sf"] == 3
    assert ex["H"].shape[0] == ex["L"].shape[0] * 3


def test_vendored_kernel_assets():
    """The framework must not depend on the reference tree at runtime:
    the SRMD PCA basis and kernels_12 are vendored in data/assets/ and
    must match the published .mat values bit-exactly."""
    from kair_tpu.degrade import sisr

    p = sisr.load_srmd_pca()
    assert p.shape == (15, 225) and p.dtype == np.float32
    ks = sisr.load_kernels_12()
    assert ks.shape == (12, 25, 25)
    # every kernel is a plausible normalized PSF
    assert np.all(ks.reshape(12, -1).sum(1) > 0.99)
    import os
    if os.path.exists("/root/reference/kernels/srmd_pca_matlab.mat"):
        from scipy.io import loadmat
        ref_p = np.asarray(
            loadmat("/root/reference/kernels/srmd_pca_matlab.mat")["P"],
            np.float32)
        np.testing.assert_array_equal(p, ref_p)
        cells = loadmat("/root/reference/kernels/kernels_12.mat")["kernels"]
        for i in range(12):
            np.testing.assert_array_equal(ks[i], cells[0, i])
