"""Record key+shape manifests of the released checkpoint zoos.

Zero egress makes downloading the released ``.pth`` files impossible, but
their key sets are fully determined by the reference model classes at the
released configs (every loader is strict: main_test_swinir.py:170-175,
main_test_vrt.py:243, model_base.py:201-216). Instantiating the reference
modules (with the same import stubs the fixture makers use) and dumping
``state_dict`` names+shapes gives an exact manifest to harden our
converters against (VERDICT r3 #8).

Run once:  python tests/make_key_manifests.py
Writes:    tests/fixtures/manifests/<name>.json   {"key": [shape...], ...}
"""

import collections.abc
import json
import os
import sys
import types

sys.path.insert(0, "/root/reference")
for _m in ("lpips", "pytorch_fid", "requests"):
    sys.modules.setdefault(_m, types.ModuleType(_m))

import torch
import torch.nn as tnn
import torch.nn.functional as F

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "manifests")


# --- import stubs (same recipe as make_fixtures_{vrt,rvrt,gpen}.py) ---------

def _install_stubs():
    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")

    class _DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = _DropPath
    layers.to_2tuple = lambda v: (tuple(v)
                                  if isinstance(v, collections.abc.Iterable)
                                  else (v, v))
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", layers)

    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.deform_conv2d = lambda *a, **k: None
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv.ops)

    # models.op.deform_attn: keep the class attribute surface, skip the CUDA
    # build (parameters live in network_rvrt's GuidedDeformAttnPack itself)
    op_mod = types.ModuleType("models.op.deform_attn")
    op_mod.deform_attn = lambda *a, **k: None

    class _DeformAttnPack(tnn.Module):
        def __init__(self, in_channels, out_channels, attention_window=(3, 3),
                     deformable_groups=12, attention_heads=12, clip_size=1,
                     **kwargs):
            super().__init__()
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_h, self.kernel_w = attention_window
            self.attn_size = self.kernel_h * self.kernel_w
            self.deformable_groups = deformable_groups
            self.attention_heads = attention_heads
            self.clip_size = clip_size
            self.stride = 1
            self.padding = self.kernel_h // 2
            self.dilation = 1

    op_mod.DeformAttnPack = _DeformAttnPack
    sys.modules["models.op.deform_attn"] = op_mod
    import models  # noqa: F401  (reference package init)
    sys.modules.setdefault("models.op", types.ModuleType("models.op"))
    sys.modules["models.op"].deform_attn = op_mod

    # flat `op` package for network_faceenhancer
    op = types.ModuleType("op")

    class FusedLeakyReLU(tnn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = tnn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope,
                                    self.scale)

    def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            rest = [1] * (x.ndim - bias.ndim - 1)
            x = x + bias.view(1, bias.shape[0], *rest)
        return F.leaky_relu(x, negative_slope) * scale

    op.FusedLeakyReLU = FusedLeakyReLU
    op.fused_leaky_relu = fused_leaky_relu
    op.upfirdn2d = lambda x, k, up=1, down=1, pad=(0, 0): x
    sys.modules["op"] = op


def _manifest(model: tnn.Module) -> dict:
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def _dump(name: str, model: tnn.Module):
    os.makedirs(OUT, exist_ok=True)
    m = _manifest(model)
    path = os.path.join(OUT, f"{name}.json")
    with open(path, "w") as f:
        json.dump(m, f, indent=0, sort_keys=True)
    print(f"{name}: {len(m)} keys -> {path}")
    del model


def main():
    _install_stubs()

    # ---- SwinIR released configs (main_test_swinir.py:126-175) ----------
    from models.network_swinir import SwinIR as TSwinIR
    _dump("swinir_classical_sr_x4", TSwinIR(
        upscale=4, in_chans=3, img_size=64, window_size=8, img_range=1.,
        depths=[6] * 6, embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
        upsampler="pixelshuffle", resi_connection="1conv"))
    _dump("swinir_lightweight_sr_x4", TSwinIR(
        upscale=4, in_chans=3, img_size=64, window_size=8, img_range=1.,
        depths=[6] * 4, embed_dim=60, num_heads=[6] * 4, mlp_ratio=2,
        upsampler="pixelshuffledirect", resi_connection="1conv"))
    _dump("swinir_real_sr_x4", TSwinIR(
        upscale=4, in_chans=3, img_size=64, window_size=8, img_range=1.,
        depths=[6] * 6, embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
        upsampler="nearest+conv", resi_connection="1conv"))
    _dump("swinir_gray_dn", TSwinIR(
        upscale=1, in_chans=1, img_size=128, window_size=8, img_range=1.,
        depths=[6] * 6, embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
        upsampler="", resi_connection="1conv"))
    _dump("swinir_jpeg_car", TSwinIR(
        upscale=1, in_chans=1, img_size=126, window_size=7, img_range=255.,
        depths=[6] * 6, embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
        upsampler="", resi_connection="1conv"))

    # ---- VRT released configs (main_test_vrt.py:162-236) ----------------
    from models.network_vrt import VRT as TVRT
    _dump("vrt_001_reds_6frames", TVRT(
        upscale=4, img_size=[6, 64, 64], window_size=[6, 8, 8],
        depths=[8] * 7 + [4] * 6, indep_reconsts=[11, 12],
        embed_dims=[120] * 7 + [180] * 6, num_heads=[6] * 13,
        pa_frames=2, deformable_groups=12))
    _dump("vrt_005_deblur_dvd", TVRT(
        upscale=1, img_size=[6, 192, 192], window_size=[6, 8, 8],
        depths=[8] * 7 + [4] * 4, indep_reconsts=[9, 10],
        embed_dims=[96] * 7 + [120] * 4, num_heads=[6] * 11,
        pa_frames=2, deformable_groups=16))
    _dump("vrt_008_denoising_davis", TVRT(
        upscale=1, img_size=[6, 192, 192], window_size=[6, 8, 8],
        depths=[8] * 7 + [4] * 4, indep_reconsts=[9, 10],
        embed_dims=[96] * 7 + [120] * 4, num_heads=[6] * 11,
        pa_frames=2, deformable_groups=16, nonblind_denoising=True))
    _dump("vrt_009_fi_vimeo", TVRT(
        upscale=1, out_chans=3, img_size=[4, 192, 192],
        window_size=[4, 8, 8], depths=[8] * 7 + [4] * 4,
        indep_reconsts=[], embed_dims=[96] * 7 + [120] * 4,
        num_heads=[6] * 11, pa_frames=0))

    # ---- RVRT released configs (main_test_rvrt.py:146-194) --------------
    from models.network_rvrt import RVRT as TRVRT
    _dump("rvrt_001_reds_30frames", TRVRT(
        upscale=4, clip_size=2, img_size=[2, 64, 64], window_size=[2, 8, 8],
        num_blocks=[1, 2, 1], depths=[2, 2, 2], embed_dims=[144] * 3,
        num_heads=[6] * 3, inputconv_groups=[1] * 6, deformable_groups=12,
        attention_heads=12, attention_window=[3, 3]))
    _dump("rvrt_006_denoising_davis", TRVRT(
        upscale=1, clip_size=2, img_size=[2, 64, 64], window_size=[2, 8, 8],
        num_blocks=[1, 2, 1], depths=[2, 2, 2], embed_dims=[192] * 3,
        num_heads=[6] * 3, inputconv_groups=[1, 3, 4, 6, 8, 4],
        deformable_groups=12, attention_heads=12, attention_window=[3, 3],
        nonblind_denoising=True))

    # ---- GPEN-BFR-512 (main_test_face_enhancement.py:53) ----------------
    from models.network_faceenhancer import FullGenerator
    _dump("gpen_bfr_512", FullGenerator(512, 512, 8, 2))

    # ---- SpyNet as VRT consumes it (network_vrt.py SpyNet) --------------
    from models.network_vrt import SpyNet as TSpyNet
    sp = TSpyNet.__new__(TSpyNet)      # skip __init__'s weight download
    tnn.Module.__init__(sp)
    from models.network_vrt import BasicModule
    sp.basic_module = tnn.ModuleList([BasicModule() for _ in range(6)])
    _dump("spynet_sintel_final", sp)

    # ---- simple CNN zoos (import clean, no stubs needed) ----------------
    from models.network_dncnn import DnCNN as TDnCNN
    _dump("dncnn_25", TDnCNN(in_nc=1, out_nc=1, nc=64, nb=17, act_mode="R"))
    _dump("dncnn_color_blind", TDnCNN(in_nc=3, out_nc=3, nc=64, nb=20,
                                      act_mode="R"))
    from models.network_dncnn import FDnCNN as TFDnCNN
    _dump("fdncnn_gray", TFDnCNN(in_nc=2, out_nc=1, nc=64, nb=20,
                                 act_mode="R"))
    from models.network_ffdnet import FFDNet as TFFDNet
    _dump("ffdnet_gray", TFFDNet(in_nc=1, out_nc=1, nc=64, nb=15,
                                 act_mode="R"))
    _dump("ffdnet_color", TFFDNet(in_nc=3, out_nc=3, nc=96, nb=12,
                                  act_mode="R"))
    from models.network_srmd import SRMD as TSRMD
    _dump("srmd_x4", TSRMD(in_nc=19, out_nc=3, nc=128, nb=12, upscale=4,
                           act_mode="R", upsample_mode="pixelshuffle"))
    from models.network_dpsr import MSRResNet_prior as TDPSR
    _dump("dpsr_x4", TDPSR(in_nc=4, out_nc=3, nc=96, nb=16, upscale=4,
                           act_mode="R", upsample_mode="pixelshuffle"))
    from models.network_msrresnet import MSRResNet0 as TMSRResNet0
    _dump("msrresnet_x4", TMSRResNet0(in_nc=3, out_nc=3, nc=64, nb=16,
                                      upscale=4))
    from models.network_rrdb import RRDB as TRRDB
    _dump("esrgan_x4", TRRDB(in_nc=3, out_nc=3, nc=64, nb=23, gc=32,
                             upscale=4, act_mode="L",
                             upsample_mode="upconv"))
    from models.network_imdn import IMDN as TIMDN
    _dump("imdn_x4", TIMDN(in_nc=3, out_nc=3, nc=64, nb=8, upscale=4,
                           act_mode="L", upsample_mode="pixelshuffle"))
    from models.network_unet import UNetRes as TUNetRes
    _dump("drunet_gray", TUNetRes(in_nc=2, out_nc=1, nc=[64, 128, 256, 512],
                                  nb=4, act_mode="R"))
    _dump("drunet_color", TUNetRes(in_nc=4, out_nc=3, nc=[64, 128, 256, 512],
                                   nb=4, act_mode="R"))
    from models.network_usrnet import USRNet as TUSRNet
    _dump("usrnet", TUSRNet(n_iter=8, h_nc=64, in_nc=4, out_nc=3,
                            nc=[64, 128, 256, 512], nb=2, act_mode="R",
                            downsample_mode="strideconv",
                            upsample_mode="convtranspose"))


if __name__ == "__main__":
    main()
