"""Generate golden fixtures for image-utility parity tests by RUNNING the
reference implementation (/root/reference on PYTHONPATH). The reference code
is executed, never copied. Run once; outputs are committed.

Usage: python tests/make_fixtures_image.py
"""

import os
import sys

sys.path.insert(0, "/root/reference")

import types

import numpy as np

# the reference imports lpips / pytorch_fid at module scope; stub them (not
# needed for the functions exercised here)
for _mod in ("lpips", "pytorch_fid"):
    sys.modules.setdefault(_mod, types.ModuleType(_mod))

from utils import utils_image as ref  # noqa: E402  (reference KAIR utils_image)

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "image_golden.npz")


def main():
    rng = np.random.RandomState(0)
    img_f = rng.rand(37, 53, 3).astype(np.float64)          # float [0,1] HWC
    img_u1 = (rng.rand(41, 47) * 255).astype(np.uint8)       # uint8 gray
    img_u3 = (rng.rand(40, 48, 3) * 255).astype(np.uint8)    # uint8 color
    img_u3b = np.clip(img_u3.astype(np.int32) + rng.randint(-20, 20, img_u3.shape), 0, 255).astype(np.uint8)
    img_u1b = np.clip(img_u1.astype(np.int32) + rng.randint(-20, 20, img_u1.shape), 0, 255).astype(np.uint8)

    out = {
        "img_f": img_f, "img_u1": img_u1, "img_u3": img_u3,
        "img_u3b": img_u3b, "img_u1b": img_u1b,
    }

    # reference imresize_np mixes numpy with torch weights and fails on
    # modern torch; use the torch-tensor variant (identical math,
    # utils_image.py:938-1008) as the golden oracle.
    import torch

    def ref_resize(img_hwc, s, antialiasing=True):
        t = torch.from_numpy(img_hwc.transpose(2, 0, 1)).float()
        r = ref.imresize(t, s, antialiasing)
        return r.numpy().transpose(1, 2, 0)

    for s, name in [(0.25, "s025"), (0.5, "s05"), (1.0 / 3.0, "s033"),
                    (2.0, "s2"), (1.7, "s17"), (4.0, "s4")]:
        out[f"resize_{name}"] = ref_resize(img_f, s, True)
    out["resize_noaa"] = ref_resize(img_f, 0.5, False)

    out["psnr_u3"] = ref.calculate_psnr(img_u3, img_u3b, border=0)
    out["psnr_u3_b4"] = ref.calculate_psnr(img_u3, img_u3b, border=4)
    out["ssim_u3"] = ref.calculate_ssim(img_u3, img_u3b, border=0)
    out["ssim_u1"] = ref.calculate_ssim(img_u1, img_u1b, border=0)
    out["psnrb_u1"] = ref.calculate_psnrb(img_u1, img_u1b, border=0)
    out["psnrb_u3"] = ref.calculate_psnrb(img_u3, img_u3b, border=0)

    for mode in range(8):
        out[f"aug_{mode}"] = ref.augment_img(img_f, mode)

    out["ycbcr_y_u3"] = ref.rgb2ycbcr(img_u3, only_y=True)
    out["ycbcr_full_f"] = ref.rgb2ycbcr(img_f.astype(np.float32).copy(), only_y=False)
    out["bgr_y_u3"] = ref.bgr2ycbcr(img_u3, only_y=True)

    np.savez_compressed(OUT, **out)
    print("wrote", OUT, "keys:", len(out))


if __name__ == "__main__":
    main()
