"""Golden fixture for DnCNN checkpoint parity: run the REFERENCE torch model
on the shipped dncnn_25.pth (the only in-repo checkpoint) over a real image,
following the main_test_dncnn.py protocol (seeded sigma=25 degradation).

Run once: python tests/make_fixtures_dncnn.py
"""

import os
import sys
import types

sys.path.insert(0, "/root/reference")
for _mod in ("lpips", "pytorch_fid"):
    sys.modules.setdefault(_mod, types.ModuleType(_mod))

import numpy as np
import torch

from models.network_dncnn import DnCNN  # reference network, executed not copied
from utils import utils_image as util

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "dncnn25_golden.npz")


def main():
    model = DnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R")
    model.load_state_dict(torch.load("/root/reference/model_zoo/dncnn_25.pth"), strict=True)
    model.eval()

    # grayscale crop of a real image, protocol of main_test_dncnn.py:147-165
    img_h = util.imread_uint("/root/reference/figs/denoising_01.png", n_channels=1)
    img_h = img_h[:256, :320]  # static shape
    img_l = util.uint2single(img_h)
    np.random.seed(seed=0)
    img_l = img_l + np.random.normal(0, 25 / 255.0, img_l.shape)

    t = util.single2tensor4(img_l)
    with torch.no_grad():
        e = model(t)
    img_e = util.tensor2uint(e)

    psnr = util.calculate_psnr(img_e, img_h.squeeze())
    ssim = util.calculate_ssim(img_e, img_h.squeeze())
    print(f"reference DnCNN sigma25: PSNR {psnr:.4f} SSIM {ssim:.4f}")

    np.savez_compressed(
        OUT,
        img_h=img_h, img_l=img_l.astype(np.float32),
        out_f=e.numpy()[0, 0],  # raw float output for tight comparison
        img_e=img_e, psnr=psnr, ssim=ssim)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
