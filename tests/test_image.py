"""Parity tests for kair_tpu.utils.image against goldens produced by running
the reference implementation (see make_fixtures_image.py)."""

import numpy as np
import pytest

from kair_tpu.utils import image as im
from tests.conftest import FIXTURES

G = np.load(FIXTURES / "image_golden.npz")


@pytest.mark.parametrize("name,scale,aa", [
    ("resize_s025", 0.25, True),
    ("resize_s05", 0.5, True),
    ("resize_s033", 1.0 / 3.0, True),
    ("resize_s2", 2.0, True),
    ("resize_s17", 1.7, True),
    ("resize_s4", 4.0, True),
    ("resize_noaa", 0.5, False),
])
def test_imresize_np_matches_matlab(name, scale, aa):
    got = im.imresize_np(G["img_f"], scale, aa)
    want = G[name]
    assert got.shape == want.shape
    # golden oracle computes in float32; ours is float64 (closer to MATLAB)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("scale", [0.25, 0.5, 2.0, 4.0])
def test_imresize_nhwc_matches_np(scale):
    import jax

    x = G["img_f"].astype(np.float32)[None]
    got = jax.jit(lambda a: im.imresize_nhwc(a, scale))(x)
    want = im.imresize_np(G["img_f"], scale)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-5)


def test_psnr():
    assert abs(im.calculate_psnr(G["img_u3"], G["img_u3b"]) - float(G["psnr_u3"])) < 1e-10
    assert abs(im.calculate_psnr(G["img_u3"], G["img_u3b"], border=4) - float(G["psnr_u3_b4"])) < 1e-10


def test_ssim():
    assert abs(im.calculate_ssim(G["img_u3"], G["img_u3b"]) - float(G["ssim_u3"])) < 1e-8
    assert abs(im.calculate_ssim(G["img_u1"], G["img_u1b"]) - float(G["ssim_u1"])) < 1e-8


def test_psnrb():
    assert abs(im.calculate_psnrb(G["img_u1"], G["img_u1b"]) - float(G["psnrb_u1"])) < 1e-6
    assert abs(im.calculate_psnrb(G["img_u3"], G["img_u3b"]) - float(G["psnrb_u3"])) < 1e-6


@pytest.mark.parametrize("mode", range(8))
def test_augment(mode):
    np.testing.assert_array_equal(im.augment_img(G["img_f"], mode), G[f"aug_{mode}"])


@pytest.mark.parametrize("mode", range(8))
def test_augment_nhwc_matches_numpy(mode):
    x = G["img_f"].astype(np.float32)[None]
    got = np.asarray(im.augment_nhwc(x, mode))[0]
    want = im.augment_img(G["img_f"].astype(np.float32), mode)
    np.testing.assert_allclose(got, want, atol=0)


@pytest.mark.parametrize("mode", range(8))
def test_augment_inverse(mode):
    img = G["img_f"]
    fwd = im.augment_img(img, mode)
    back = im.augment_img(fwd, im.inverse_augment_mode(mode))
    np.testing.assert_array_equal(back, img)


def test_ycbcr():
    np.testing.assert_array_equal(im.rgb2ycbcr(G["img_u3"], only_y=True), G["ycbcr_y_u3"])
    np.testing.assert_allclose(
        im.rgb2ycbcr(G["img_f"].astype(np.float32).copy(), only_y=False),
        G["ycbcr_full_f"], atol=1e-6)
    np.testing.assert_array_equal(im.bgr2ycbcr(G["img_u3"], only_y=True), G["bgr_y_u3"])


def test_uint_roundtrip():
    u = G["img_u3"]
    np.testing.assert_array_equal(im.single2uint(im.uint2single(u)), u)
    np.testing.assert_array_equal(im.nhwc_to_uint(im.uint2nhwc(u)), u)


def test_modcrop_patches():
    img = G["img_f"]
    c = im.modcrop(img, 4)
    assert c.shape[0] % 4 == 0 and c.shape[1] % 4 == 0
    big = np.random.RandomState(1).rand(900, 1000, 3)
    ps = im.patches_from_image(big, p_size=512, p_overlap=64, p_max=800)
    assert all(p.shape[:2] == (512, 512) for p in ps)
