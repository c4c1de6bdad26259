"""Checkpoint-parity test: converted dncnn_25.pth must reproduce the
reference torch output (the de-facto integration test of the reference,
SURVEY.md §4.1) to float precision and the golden PSNR to <=0.01 dB."""

import numpy as np
import pytest

from kair_tpu.ckpt.torch_convert import load_torch_state_dict, convert_dncnn
from kair_tpu.models.dncnn import DnCNN
from kair_tpu.utils import image as im
from tests.conftest import FIXTURES

CKPT = "/root/reference/model_zoo/dncnn_25.pth"
G = np.load(FIXTURES / "dncnn25_golden.npz")


@pytest.fixture(scope="module")
def variables():
    sd = load_torch_state_dict(CKPT)
    return convert_dncnn(sd, nb=17, act_mode="R")


def test_forward_matches_reference(variables):
    import jax

    model = DnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R")
    x = G["img_l"][None, :, :, :]  # NHWC (HxWx1 fixture)
    out = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    out = np.asarray(out)[0, :, :, 0]
    # float parity except for rare ReLU-boundary divergences (a pre-activation
    # within eps of 0 can flip dead/alive between frameworks and amplify);
    # the uint8-domain PSNR test below is the acceptance criterion.
    diff = np.abs(out - G["out_f"])
    assert (diff > 2e-5).mean() < 1e-4, f"{(diff > 2e-5).sum()} outliers"
    assert diff.max() < 0.02


def test_psnr_parity(variables):
    import jax

    model = DnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R")
    x = G["img_l"][None, :, :, :]
    out = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    img_e = im.nhwc_to_uint(out)
    psnr = im.calculate_psnr(img_e, G["img_h"].squeeze())
    ssim = im.calculate_ssim(img_e, G["img_h"].squeeze())
    assert abs(psnr - float(G["psnr"])) <= 0.01
    assert abs(ssim - float(G["ssim"])) <= 1e-3
