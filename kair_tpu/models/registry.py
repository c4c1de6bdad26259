"""Network registry: opt['netG'] → flax module (reference:
models/select_network.py:16-274 `define_G` and :280-341 `define_D`).

Construction is keyed by the same ``net_type`` strings the reference option
files use, reading the same hyper-parameter keys, so existing KAIR JSON
configs drive this framework unchanged.
"""

from __future__ import annotations

from typing import Any, Optional


def _get(o, key, default=None):
    v = o.get(key)
    return default if v is None else v


def define_g(opt: dict, dtype: Optional[Any] = None):
    """Build the generator module from a parsed option tree
    (reference select_network.py:16-274)."""
    o = opt["netG"]
    t = o["net_type"]

    if t == "dncnn":
        from kair_tpu.models.dncnn import DnCNN
        return DnCNN(_get(o, "in_nc", 1), _get(o, "out_nc", 1), _get(o, "nc", 64),
                     _get(o, "nb", 17), _get(o, "act_mode", "BR"), dtype=dtype)
    if t == "fdncnn":
        from kair_tpu.models.dncnn import FDnCNN
        return FDnCNN(_get(o, "in_nc", 2), _get(o, "out_nc", 1), _get(o, "nc", 64),
                      _get(o, "nb", 20), _get(o, "act_mode", "R"), dtype=dtype)
    if t == "ircnn":
        from kair_tpu.models.dncnn import IRCNN
        return IRCNN(_get(o, "in_nc", 1), _get(o, "out_nc", 1), _get(o, "nc", 64),
                     dtype=dtype)
    if t == "ffdnet":
        from kair_tpu.models.ffdnet import FFDNet
        return FFDNet(_get(o, "in_nc", 1), _get(o, "out_nc", 1), _get(o, "nc", 64),
                      _get(o, "nb", 15), _get(o, "act_mode", "R"), dtype=dtype)
    if t == "srmd":
        from kair_tpu.models.srresnet import SRMD
        return SRMD(_get(o, "in_nc", 19), _get(o, "out_nc", 3), _get(o, "nc", 128),
                    _get(o, "nb", 12), _get(o, "scale", 4), _get(o, "act_mode", "R"),
                    _get(o, "upsample_mode", "pixelshuffle"), dtype=dtype)
    if t == "dpsr":
        from kair_tpu.models.srresnet import MSRResNet0
        return MSRResNet0(_get(o, "in_nc", 4), _get(o, "out_nc", 3), _get(o, "nc", 96),
                          _get(o, "nb", 16), _get(o, "scale", 4), _get(o, "act_mode", "R"),
                          _get(o, "upsample_mode", "pixelshuffle"), dtype=dtype)
    if t == "msrresnet0":
        from kair_tpu.models.srresnet import MSRResNet0
        return MSRResNet0(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nc", 64),
                          _get(o, "nb", 16), _get(o, "scale", 4), _get(o, "act_mode", "R"),
                          _get(o, "upsample_mode", "upconv"), dtype=dtype)
    if t == "msrresnet1":
        from kair_tpu.models.srresnet import MSRResNet1
        return MSRResNet1(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nc", 64),
                          _get(o, "nb", 16), _get(o, "scale", 4), dtype=dtype)
    if t == "rrdb":
        from kair_tpu.models.rrdbnet import RRDB
        return RRDB(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nc", 64),
                    _get(o, "nb", 23), _get(o, "gc", 32), _get(o, "scale", 4),
                    _get(o, "act_mode", "L"), _get(o, "upsample_mode", "upconv"),
                    dtype=dtype)
    if t == "rrdbnet":
        from kair_tpu.models.rrdbnet import RRDBNet
        return RRDBNet(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nf", 64),
                       _get(o, "nb", 23), _get(o, "gc", 32), _get(o, "sf", 4),
                       dtype=dtype)
    if t == "rrdbnet_no_up":
        from kair_tpu.models.rrdbnet import RRDBNetNoUp
        return RRDBNetNoUp(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nf", 64),
                           _get(o, "nb", 23), _get(o, "gc", 32), dtype=dtype)
    if t == "imdn":
        from kair_tpu.models.imdn import IMDN
        return IMDN(_get(o, "in_nc", 3), _get(o, "out_nc", 3), _get(o, "nc", 64),
                    _get(o, "nb", 8), _get(o, "scale", 4), _get(o, "act_mode", "L"),
                    _get(o, "upsample_mode", "pixelshuffle"), dtype=dtype)
    if t == "drunet":
        from kair_tpu.models.drunet import UNetRes
        return UNetRes(_get(o, "in_nc", 3), _get(o, "out_nc", 3),
                       tuple(_get(o, "nc", [64, 128, 256, 512])), _get(o, "nb", 4),
                       _get(o, "act_mode", "R"),
                       _get(o, "downsample_mode", "strideconv"),
                       _get(o, "upsample_mode", "convtranspose"),
                       _get(o, "bias", True), dtype=dtype)
    if t == "usrnet":
        from kair_tpu.models.usrnet import USRNet
        return USRNet(_get(o, "n_iter", 8), _get(o, "h_nc", 64),
                      _get(o, "in_nc", 4), _get(o, "out_nc", 3),
                      tuple(_get(o, "nc", [64, 128, 256, 512])), _get(o, "nb", 2),
                      _get(o, "act_mode", "R"),
                      _get(o, "downsample_mode", "strideconv"),
                      _get(o, "upsample_mode", "convtranspose"), dtype=dtype)
    if t == "swinir":
        from kair_tpu.models.swinir import SwinIR
        return SwinIR(
            img_size=_get(o, "img_size", 64),
            in_chans=_get(o, "in_nc", 3),
            embed_dim=_get(o, "embed_dim", 96),
            depths=tuple(_get(o, "depths", [6, 6, 6, 6])),
            num_heads=tuple(_get(o, "num_heads", [6, 6, 6, 6])),
            window_size=_get(o, "window_size", 7),
            mlp_ratio=_get(o, "mlp_ratio", 4.0),
            upscale=_get(o, "upscale", 1),
            img_range=_get(o, "img_range", 1.0),
            upsampler=_get(o, "upsampler", ""),
            resi_connection=_get(o, "resi_connection", "1conv"),
            use_pallas=bool(_get(o, "use_pallas", False)),
            fuse_block=bool(_get(o, "fuse_block", False)),
            remat=bool(_get(o, "use_checkpoint", False)),
            dtype=dtype)
    if t == "vrt":
        from kair_tpu.models.vrt import VRT
        depths = tuple(_get(o, "depths", [8] * 7 + [4] * 6))
        return VRT(upscale=_get(o, "upscale", 4),
                   in_chans=_get(o, "in_nc", 3), out_chans=_get(o, "out_nc", 3),
                   window_size=tuple(_get(o, "window_size", [6, 8, 8])),
                   depths=depths,
                   embed_dims=tuple(_get(o, "embed_dims", [120] * 7 + [180] * 6)),
                   num_heads=tuple(_get(o, "num_heads", [6] * len(depths))),
                   pa_frames=_get(o, "pa_frames", 2),
                   deformable_groups=_get(o, "deformable_groups", 16),
                   nonblind_denoising=bool(_get(o, "nonblind_denoising", False)),
                   remat=bool(_get(o, "use_checkpoint_attn", False)),
                   fuse_block=bool(_get(o, "fuse_block", False)),
                   deform_impl=_get(o, "deform_impl", "gather"),
                   dtype=dtype)
    if t == "rvrt":
        from kair_tpu.models.rvrt import RVRT
        return RVRT(upscale=_get(o, "upscale", 4),
                    clip_size=_get(o, "clip_size", 2),
                    window_size=tuple(_get(o, "window_size", [2, 8, 8])),
                    num_blocks=tuple(_get(o, "num_blocks", [1, 2, 1])),
                    depths=tuple(_get(o, "depths", [2, 2, 2])),
                    embed_dims=tuple(_get(o, "embed_dims", [144, 144, 144])),
                    num_heads=tuple(_get(o, "num_heads", [6, 6, 6])),
                    inputconv_groups=tuple(_get(o, "inputconv_groups", [1] * 6)),
                    deformable_groups=_get(o, "deformable_groups", 12),
                    attention_heads=_get(o, "attention_heads", 12),
                    attention_window=tuple(_get(o, "attention_window", [3, 3])),
                    nonblind_denoising=bool(_get(o, "nonblind_denoising", False)),
                    remat=bool(_get(o, "use_checkpoint_attn", False)),
                    fuse_block=bool(_get(o, "fuse_block", False)),
                    deform_impl=_get(o, "deform_impl", "gather"),
                    dtype=dtype)
    if t == "spynet":
        from kair_tpu.models.spynet import SpyNet
        return SpyNet(return_levels=tuple(_get(o, "return_levels", [5])),
                      dtype=dtype)
    raise NotImplementedError(f"netG [{t}] is not implemented yet")


def define_d(opt: dict, dtype: Optional[Any] = None):
    """Build the discriminator (reference select_network.py:280-341)."""
    o = opt["netD"]
    t = o["net_type"]
    from kair_tpu.models import discriminator as D

    if t == "discriminator_patchgan":
        return D.PatchGAN(_get(o, "in_nc", 3), _get(o, "base_nc", 64),
                          _get(o, "n_layers", 3), _get(o, "norm_type", "spectral"),
                          dtype=dtype)
    if t == "discriminator_unet":
        return D.UNetDiscriminator(_get(o, "in_nc", 3), _get(o, "base_nc", 64),
                                   dtype=dtype)
    if t == "discriminator_vgg_96":
        return D.VGGStyleDiscriminator(96, _get(o, "in_nc", 3), _get(o, "base_nc", 64),
                                       _get(o, "act_mode", "BL"), dtype=dtype)
    if t == "discriminator_vgg_128":
        return D.VGGStyleDiscriminator(128, _get(o, "in_nc", 3), _get(o, "base_nc", 64),
                                       _get(o, "act_mode", "BL"), dtype=dtype)
    if t == "discriminator_vgg_192":
        return D.VGGStyleDiscriminator(192, _get(o, "in_nc", 3), _get(o, "base_nc", 64),
                                       _get(o, "act_mode", "BL"), dtype=dtype)
    if t == "discriminator_vgg_128_SN":
        return D.VGG128SN(dtype=dtype)
    raise NotImplementedError(f"netD [{t}] is not implemented yet")
