"""Golden fixtures for model-zoo conversion parity: instantiate each
REFERENCE torch network at a small config with a fixed seed, run a forward
pass, and save {state_dict, input, output}. Our converters + flax models
must reproduce the outputs.

Run once: python tests/make_fixtures_models.py
"""

import os
import sys
import types

sys.path.insert(0, "/root/reference")
for _m in ("lpips", "pytorch_fid"):
    sys.modules.setdefault(_m, types.ModuleType(_m))

import numpy as np
import torch

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def dump(name, net, *inputs):
    net.eval()
    with torch.no_grad():
        out = net(*[torch.from_numpy(i) for i in inputs])
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIX, f"model_{name}.npz"),
        out=out.numpy(),
        **{f"in{i}": a for i, a in enumerate(inputs)},
        **{f"sd.{k}": v for k, v in sd.items()})
    print(f"{name}: out {tuple(out.shape)}  params {sum(v.size for v in sd.values())}")


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    x1 = rng.rand(1, 1, 24, 24).astype(np.float32)
    x2 = rng.rand(1, 2, 24, 24).astype(np.float32)
    x3 = rng.rand(1, 3, 24, 24).astype(np.float32)
    x19 = rng.rand(1, 19, 24, 24).astype(np.float32)
    x64 = rng.rand(1, 3, 64, 64).astype(np.float32)
    sigma = np.full((1, 1, 1, 1), 25 / 255.0, np.float32)

    from models.network_dncnn import IRCNN, FDnCNN
    from models.network_ffdnet import FFDNet
    from models.network_msrresnet import MSRResNet0, MSRResNet1
    from models.network_dpsr import MSRResNet_prior
    from models.network_srmd import SRMD
    from models.network_rrdbnet import RRDBNet, RRDBNet_noUp
    from models.network_rrdb import RRDB as RRDB_old
    from models.network_imdn import IMDN
    from models.network_unet import UNetRes

    dump("ircnn", IRCNN(1, 1, 64), x1)
    dump("fdncnn", FDnCNN(2, 1, 64, 8, "R"), x2)
    dump("ffdnet", FFDNet(1, 1, 64, 6, "R"), x1, sigma)
    dump("msrresnet0", MSRResNet0(3, 3, 32, 3, 4, "R", "upconv"), x3)
    dump("msrresnet0_ps", MSRResNet0(3, 3, 32, 2, 4, "R", "pixelshuffle"), x3)
    dump("msrresnet1", MSRResNet1(3, 3, 32, 3, 4), x3)
    dump("dpsr", MSRResNet_prior(4, 3, 32, 3, 4, "R", "upconv"),
         rng.rand(1, 4, 24, 24).astype(np.float32))
    dump("srmd", SRMD(19, 3, 32, 6, 4, "R", "pixelshuffle"), x19)
    dump("rrdbnet", RRDBNet(3, 3, 16, 2, 8, 4), x3)
    dump("rrdbnet_noup", RRDBNet_noUp(3, 3, 16, 2, 8), x3)
    dump("rrdb_old", RRDB_old(3, 3, 16, 2, 8, 4, "L", "upconv"), x3)
    dump("imdn", IMDN(3, 3, 32, 3, 4, "L", "pixelshuffle"), x3)
    dump("unetres", UNetRes(3, 3, [16, 32, 64, 128], 2), x64)


def usrnet_fixture():
    """Separate multi-input fixture for USRNet (x, k, sf, sigma)."""
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    from models.network_usrnet_v1 import USRNet as TorchUSRNet
    net = TorchUSRNet(n_iter=4, h_nc=16, in_nc=4, out_nc=3,
                      nc=[8, 16, 32, 64], nb=2)
    net.eval()
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    k = rng.rand(1, 1, 7, 7).astype(np.float32)
    k /= k.sum()
    sigma = np.full((1, 1, 1, 1), 10 / 255.0, np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x), torch.from_numpy(k), 2,
                  torch.from_numpy(sigma))
    sd = {kk: v.numpy() for kk, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIX, "model_usrnet.npz"),
        out=out.numpy(), x=x, k=k, sigma=sigma,
        **{f"sd.{kk}": v for kk, v in sd.items()})
    print(f"usrnet: out {tuple(out.shape)}")




def _stub_timm():
    import collections.abc
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")

    class _DropPath(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = _DropPath
    layers.to_2tuple = lambda v: tuple(v) if isinstance(
        v, collections.abc.Iterable) else (v, v)
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", layers)


def swinir_fixtures():
    """Random-init reference SwinIR at three head configs (+ ape)."""
    _stub_timm()
    from models.network_swinir import SwinIR as TorchSwinIR
    rng = np.random.RandomState(5)

    cfgs = {
        "swinir_ape": dict(upscale=1, img_size=16, window_size=8,
                           img_range=1.0, depths=[2, 2], embed_dim=24,
                           num_heads=[4, 4], mlp_ratio=2, upsampler="",
                           in_chans=1, ape=True),
        "swinir_dn": dict(upscale=1, img_size=32, window_size=8, img_range=1.0,
                          depths=[2, 2], embed_dim=24, num_heads=[4, 4],
                          mlp_ratio=2, upsampler="", in_chans=1),
        "swinir_light": dict(upscale=4, img_size=16, window_size=8, img_range=1.0,
                             depths=[2, 2], embed_dim=24, num_heads=[4, 4],
                             mlp_ratio=2, upsampler="pixelshuffledirect", in_chans=3),
        "swinir_classical": dict(upscale=4, img_size=16, window_size=8, img_range=1.0,
                                 depths=[2, 2], embed_dim=24, num_heads=[4, 4],
                                 mlp_ratio=2, upsampler="pixelshuffle",
                                 resi_connection="1conv", in_chans=3),
    }
    for name, cfg in cfgs.items():
        torch.manual_seed(7)
        net = TorchSwinIR(**cfg)
        net.eval()
        # H=W=16 or 32, multiples of window 8
        # ape sizes the position embedding by img_size — input must match
        size = cfg["img_size"] if cfg.get("ape") else (
            32 if cfg["upscale"] == 1 else 16)
        x = rng.rand(1, cfg["in_chans"], size, size).astype(np.float32)
        with torch.no_grad():
            out = net(torch.from_numpy(x))
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        np.savez_compressed(
            os.path.join(FIX, f"model_{name}.npz"), out=out.numpy(), in0=x,
            **{f"sd.{k}": v for k, v in sd.items()})
        print(f"{name}: out {tuple(out.shape)}")


if __name__ == "__main__":
    main()
    usrnet_fixture()
    swinir_fixtures()
