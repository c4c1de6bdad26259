"""Assemble a small grayscale training corpus for the DnCNN convergence run
from the natural-image content available in this zero-egress image:

  - sklearn's sample photos (china.jpg, flower.jpg — two real photographs)
  - the reference repo's figure PNGs (faces, palace, denoising comparison
    grids — natural crops with some text/whitespace, filtered out below)
  - einstein.png / utils/test.png (classic test images shipped in-repo)

Natural-content tiles are selected by local-variance + gradient screens
(drops flat whitespace and text-heavy figure panels). Held-out images
never enter training: einstein, palace, utils/test.bmp and china are the
eval set for comparing a from-scratch model against the released
dncnn_25.pth (docs/PARITY.md convergence table).

    python scripts/prep_convergence_data.py --out runs/convergence
"""

import argparse
import glob
import os

import numpy as np


def to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        img = img[..., :3]
        # ITU-R BT.601, matching utils/image.py rgb2ycbcr luma
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1]
               + 0.114 * img[..., 2])
    return img.astype(np.float32)


def natural_tiles(gray: np.ndarray, tile: int = 120, stride: int = 100):
    """Yield tiles that look like natural image content: enough local
    variance to not be flat background, not dominated by near-saturated
    white (figure panels), and a gradient distribution that is not
    text-like (text = sparse huge gradients on flat paper)."""
    h, w = gray.shape
    for y in range(0, h - tile + 1, stride):
        for x in range(0, w - tile + 1, stride):
            t = gray[y:y + tile, x:x + tile]
            if t.std() < 12.0:                     # flat / empty
                continue
            if (t > 240).mean() > 0.35:            # mostly white panel
                continue
            gy, gx = np.gradient(t)
            g = np.hypot(gy, gx)
            # text on paper: most pixels near-zero gradient, tiny fraction
            # extreme; natural images have a heavier mid-gradient mass
            mid = ((g > 2) & (g < 30)).mean()
            if mid < 0.25:
                continue
            yield t


HELD_OUT = ("einstein", "palace.png", "test.bmp", "china")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/convergence")
    ap.add_argument("--tile", type=int, default=120)
    args = ap.parse_args()

    import imageio.v2 as iio

    train_dir = os.path.join(args.out, "trainH")
    test_dir = os.path.join(args.out, "testH")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)

    sources = []
    import sklearn.datasets
    skdir = os.path.join(os.path.dirname(sklearn.datasets.__file__), "images")
    sources += sorted(glob.glob(os.path.join(skdir, "*.jpg")))
    sources += sorted(glob.glob("/root/reference/figs/*.png"))
    sources += ["/root/reference/models/einstein.png",
                "/root/reference/utils/test.png",
                "/root/reference/utils/test.bmp"]
    # every other real photograph shipped in site-packages (round-5 corpus
    # widening: the v1 run's 0.85 dB gap is partly data diversity — these
    # add a portrait and several webcam scenes; missing files are skipped)
    import matplotlib
    mpl_dir = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                           "sample_data")
    sources += sorted(glob.glob(os.path.join(mpl_dir, "grace_hopper.jpg")))
    try:
        import pygame
        pg = os.path.dirname(pygame.__file__)
        sources += sorted(
            glob.glob(os.path.join(pg, "docs/generated/_images",
                                   "camera_rgb.jpg"))
            + glob.glob(os.path.join(pg, "docs/generated/_images",
                                     "camera_background.jpg"))
            + glob.glob(os.path.join(pg, "docs/generated/_images",
                                     "intro_*.jpg")))
    except ImportError:
        pass

    n_train = n_test = 0
    for path in sources:
        name = os.path.basename(path)
        try:
            img = iio.imread(path)
        except Exception as e:
            print(f"skip {name}: {e}")
            continue
        gray = to_gray(np.asarray(img, np.float32))
        held = any(h in name for h in HELD_OUT)
        if held:
            # full image (cropped to a multiple of 8 for tiling-free eval)
            h8, w8 = (gray.shape[0] // 8) * 8, (gray.shape[1] // 8) * 8
            out = np.clip(gray[:h8, :w8], 0, 255).round().astype(np.uint8)
            iio.imwrite(os.path.join(test_dir, f"{os.path.splitext(name)[0]}.png"), out)
            n_test += 1
            continue
        for i, t in enumerate(natural_tiles(gray, args.tile)):
            out = np.clip(t, 0, 255).round().astype(np.uint8)
            iio.imwrite(os.path.join(
                train_dir, f"{os.path.splitext(name)[0]}_{i:03d}.png"), out)
            n_train += 1

    print(f"train tiles: {n_train} -> {train_dir}")
    print(f"held-out:    {n_test} -> {test_dir}")
    assert n_train >= 100, "corpus too small — check the screens"


if __name__ == "__main__":
    main()
