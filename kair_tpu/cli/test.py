"""Testing entry point — counterpart of the reference ``main_test_*.py``
scripts (e.g. main_test_dncnn.py:64-199): load a checkpoint (torch .pth via
the converters or a native .ckpt), apply the seeded degradation protocol
over a testset folder, report per-image and average PSNR/SSIM.

    python -m kair_tpu.cli.test --model_name dncnn_25 \
        --model_path model_zoo/dncnn_25.pth --testset_dir testsets/set12 \
        --noise_level_img 25

Supported model_name presets mirror the reference test scripts' hard-coded
network configs (main_test_dncnn.py:90-95, main_test_swinir.py:124-177).
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional, Tuple

import numpy as np


def build_preset(model_name: str, model_path: str, training: bool = False,
                 fuse: bool = False):
    """(model, variables, forward_kind, n_channels) for a released zoo name."""
    import jax.numpy as jnp
    from kair_tpu.ckpt import torch_convert as tc
    from kair_tpu.ckpt.checkpoint import load_pytree

    def load_sd(param_key=None):
        if model_path.endswith(".pth"):
            return tc.load_torch_state_dict(model_path, param_key)
        return None

    if model_name.startswith("dncnn"):
        from kair_tpu.models.dncnn import DnCNN
        n_channels = 3 if "color" in model_name else 1
        nb = 20 if model_name in ("dncnn_gray_blind", "dncnn_color_blind", "dncnn3") else 17
        model = DnCNN(n_channels, n_channels, 64, nb, "R")
        variables = tc.convert_dncnn(load_sd(), nb=nb, act_mode="R")
        return model, variables, "plain", n_channels
    if model_name.startswith("ffdnet"):
        from kair_tpu.models.ffdnet import FFDNet
        color = "color" in model_name
        n_channels = 3 if color else 1
        nc = 96 if color else 64
        nb = 12 if color else 15
        model = FFDNet(n_channels, n_channels, nc, nb, "R")
        variables = tc.convert_ffdnet(load_sd(), nb=nb)
        return model, variables, "ffdnet", n_channels
    if model_name.startswith("drunet"):
        from kair_tpu.models.drunet import UNetRes
        n_channels = 3 if "color" in model_name else 1
        model = UNetRes(n_channels + 1, n_channels, (64, 128, 256, 512), 4)
        variables = tc.convert_unetres(load_sd(), nb=4)
        return model, variables, "drunet", n_channels
    if model_name.startswith("swinir"):
        # classical x4 default (main_test_swinir.py:130-140)
        from kair_tpu.models.swinir import SwinIR, fused_block_params
        model = SwinIR(upscale=4, in_chans=3, embed_dim=180, depths=(6,) * 6,
                       num_heads=(6,) * 6, window_size=8, mlp_ratio=2.0,
                       upsampler="pixelshuffle", fuse_block=fuse)
        sd = load_sd("params")
        variables = tc.convert_swinir(sd, depths=(6,) * 6,
                                      upsampler="pixelshuffle", upscale=4)
        if fuse:
            variables = {"params": fused_block_params(variables["params"])}
        return model, variables, "sr4", 3
    if model_name.startswith("msrresnet"):
        from kair_tpu.models.srresnet import MSRResNet0
        model = MSRResNet0(3, 3, 64, 16, 4, "R", "upconv")
        variables = tc.convert_msrresnet0(load_sd(), nb=16, upscale=4)
        return model, variables, "sr4", 3
    if model_name.startswith("rrdb"):
        from kair_tpu.models.rrdbnet import RRDB
        model = RRDB(3, 3, 64, 23, 32, 4, "L", "upconv")
        variables = tc.convert_rrdb_old(load_sd(), nb=23, upscale=4)
        return model, variables, "sr4", 3
    if model_name.startswith("imdn"):
        from kair_tpu.models.imdn import IMDN
        model = IMDN(3, 3, 64, 8, 4, "L", "pixelshuffle")
        variables = tc.convert_imdn(load_sd(), nb=8)
        return model, variables, "sr4", 3
    if model_name.startswith("srmd"):
        from kair_tpu.models.srresnet import SRMD
        model = SRMD(19, 3, 128, 12, 4, "R", "pixelshuffle")
        variables = tc.convert_srmd(load_sd(), nb=12)
        return model, variables, "srmd", 3
    if model_name.startswith("usrnet"):
        from kair_tpu.models.usrnet import USRNet
        tiny = "tiny" in model_name
        model = USRNet(n_iter=6 if tiny else 8, h_nc=32 if tiny else 64,
                       nc=(16, 32, 64, 64) if tiny else (64, 128, 256, 512),
                       nb=2)
        variables = tc.convert_usrnet(load_sd(), n_iter=6 if tiny else 8, nb=2)
        return model, variables, "usrnet", 3
    if model_name.startswith("ircnn"):
        from kair_tpu.models.dncnn import IRCNN
        n_channels = 3 if "color" in model_name else 1
        model = IRCNN(n_channels, n_channels, 64)
        variables = tc.convert_ircnn(load_sd())
        return model, variables, "plain", n_channels
    raise NotImplementedError(f"model preset [{model_name}]")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="dncnn_25")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--testset_dir", type=str, required=True)
    parser.add_argument("--results", type=str, default=None)
    parser.add_argument("--noise_level_img", type=int, default=25)
    parser.add_argument("--x8", action="store_true")
    parser.add_argument("--border", type=int, default=0)
    parser.add_argument("--fuse", choices=["auto", "on", "off"],
                        default="auto",
                        help="fused Pallas attention blocks (swinir): "
                             "auto = on when a TPU is present")
    args = parser.parse_args(argv)

    import jax
    from kair_tpu.eval.test_modes import test_mode
    from kair_tpu.utils import image as im
    from kair_tpu.utils.logger import setup_logger

    logger = setup_logger("test")
    # Pallas Mosaic kernels lower only on TPU backends ('tpu' natively,
    # 'axon' through the tunnelled PJRT plugin) — NOT on gpu/cpu
    fuse = args.fuse == "on" or (args.fuse == "auto"
                                 and jax.default_backend() in
                                 ("tpu", "axon"))
    model, variables, kind, n_channels = build_preset(
        args.model_name, args.model_path, fuse=fuse)

    fwd = jax.jit(lambda a: model.apply(variables, a))
    if kind == "ffdnet":
        import jax.numpy as jnp
        sigma = args.noise_level_img / 255.0
        fwd = jax.jit(lambda a: model.apply(
            variables, a, jnp.full((a.shape[0], 1, 1, 1), sigma)))

    psnrs, ssims = [], []
    for idx, path in enumerate(im.get_image_paths(args.testset_dir)):
        img_h = im.imread_uint(path, n_channels)
        img_l = im.uint2single(img_h)
        if kind in ("plain", "ffdnet", "drunet"):
            # seeded AWGN (main_test_dncnn.py:151-152)
            np.random.seed(seed=0)
            img_l = img_l + np.random.normal(0, args.noise_level_img / 255.0,
                                             img_l.shape)
            border = args.border
            sf = 1
        elif kind == "srmd":
            # bicubic-degradation protocol with the published PCA basis
            # (main_test_srmd.py semantics)
            from kair_tpu.degrade import sisr as dsisr
            img_h = im.modcrop(img_h, 4)
            img_l = im.imresize_np(im.uint2single(img_h), 1 / 4, True)
            pca = dsisr.load_srmd_pca()
            k = dsisr.anisotropic_gaussian(15, np.pi, 0.1, 0.1)
            m_vec = np.concatenate(
                [dsisr.pca_project(k, pca), [args.noise_level_img / 255.0]])
            m_map = np.broadcast_to(m_vec.astype(np.float32),
                                    img_l.shape[:2] + (m_vec.size,))
            img_l = np.concatenate([img_l.astype(np.float32), m_map], -1)
            border, sf = 4, 4
        elif kind == "usrnet":
            # kernels_12 validation kernel, vendored in-repo
            # (reference dataset_usrnet.py:105-112)
            from scipy import ndimage
            k = dsisr.load_kernels_12()[0]
            k = (k / k.sum()).astype(np.float32)
            sf = 4
            img_h = im.modcrop(img_h, sf)
            img_l = ndimage.convolve(im.uint2single(img_h),
                                     k[:, :, None].astype(np.float64),
                                     mode="wrap")[::sf, ::sf]
            border = sf
        else:
            img_h = im.modcrop(img_h, 4)
            img_l = im.imresize_np(im.uint2single(img_h), 1 / 4, True)
            border = 4
            sf = 4
        if kind == "drunet":
            m = np.full(img_l.shape[:2] + (1,), args.noise_level_img / 255.0,
                        np.float32)
            img_l = np.concatenate([img_l, m], axis=-1)

        x = im.hwc_to_nhwc(img_l.astype(np.float32))
        if kind == "usrnet":
            import jax.numpy as jnp
            sigma = jnp.zeros((1, 1, 1, 1), jnp.float32)
            kk = jnp.asarray(k)[None, :, :, None]
            # pad so H*sf is a multiple of 8 (ResUNet prior)
            ph = (-x.shape[1]) % 2
            pw = (-x.shape[2]) % 2
            if ph or pw:
                x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            e = np.asarray(model.apply(variables, jnp.asarray(x), kk, sf, sigma))
            e = e[:, : img_h.shape[0], : img_h.shape[1]]
        else:
            mode = 3 if args.x8 else 1
            modulo = 8 if kind in ("drunet", "sr4") else 1
            e = test_mode(fwd, x, mode=mode, sf=sf, modulo=modulo)
        img_e = im.nhwc_to_uint(e)

        psnr = im.calculate_psnr(img_e, img_h.squeeze(), border=border)
        ssim = im.calculate_ssim(img_e, img_h.squeeze(), border=border)
        psnrs.append(psnr)
        ssims.append(ssim)
        logger.info(f"{os.path.basename(path):>16s} - PSNR: {psnr:.2f} dB; "
                    f"SSIM: {ssim:.4f}.")
        if args.results:
            os.makedirs(args.results, exist_ok=True)
            im.imsave(img_e, os.path.join(args.results, os.path.basename(path)))

    logger.info(f"Average PSNR/SSIM - {args.model_name} - "
                f"PSNR: {np.mean(psnrs):.2f} dB; SSIM: {np.mean(ssims):.4f}")
    return float(np.mean(psnrs)), float(np.mean(ssims))


if __name__ == "__main__":
    main()
