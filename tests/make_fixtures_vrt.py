"""Golden fixtures for SpyNet + VRT parity by RUNNING the reference
network_vrt.py with stub modules for the missing timm/torchvision deps.

The torchvision.ops.deform_conv2d stub is a pure-torch implementation
(grid_sample per kernel tap, DCNv2 semantics) validated in
tests/test_video_parity.py against the naive numpy oracle before the VRT
fixture is trusted.

Run once: python tests/make_fixtures_vrt.py
"""

import os
import sys
import types
import collections.abc

sys.path.insert(0, "/root/reference")
for _m in ("lpips", "pytorch_fid", "requests"):
    sys.modules.setdefault(_m, types.ModuleType(_m))

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


# --- stub timm.layers --------------------------------------------------------
timm = types.ModuleType("timm")
layers = types.ModuleType("timm.layers")


class _DropPath(tnn.Module):
    def __init__(self, p=0.0):
        super().__init__()

    def forward(self, x):
        return x


layers.DropPath = _DropPath
layers.to_2tuple = lambda v: tuple(v) if isinstance(v, collections.abc.Iterable) else (v, v)
layers.trunc_normal_ = torch.nn.init.trunc_normal_
timm.layers = layers
sys.modules.setdefault("timm", timm)
sys.modules.setdefault("timm.layers", layers)


# --- stub torchvision.ops.deform_conv2d --------------------------------------
def deform_conv2d_ref(x, offset, weight, bias=None, stride=(1, 1),
                      padding=(1, 1), dilation=(1, 1), mask=None):
    """Pure-torch DCNv2 (torchvision semantics): per-tap bilinear sampling
    via grid_sample(align_corners=True on pixel grid), modulated by mask."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    n, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    K = kh * kw
    dg = offset.shape[1] // (2 * K)
    cg = cin // dg
    ho = (h + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    wo = (w + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1

    gy, gx = torch.meshgrid(
        torch.arange(ho, dtype=x.dtype) * stride[0] - padding[0],
        torch.arange(wo, dtype=x.dtype) * stride[1] - padding[1], indexing="ij")
    off = offset.view(n, dg, K, 2, ho, wo)
    m = mask.view(n, dg, K, ho, wo) if mask is not None else None

    out = torch.zeros(n, cout, ho, wo, dtype=x.dtype)
    for g in range(dg):
        xg = x[:, g * cg:(g + 1) * cg]
        for k in range(K):
            ky, kx = divmod(k, kw)
            fy = gy[None] + ky * dilation[0] + off[:, g, k, 0]
            fx = gx[None] + kx * dilation[1] + off[:, g, k, 1]
            # normalized grid, align_corners=True, zeros padding
            gx_n = 2.0 * fx / max(w - 1, 1) - 1.0
            gy_n = 2.0 * fy / max(h - 1, 1) - 1.0
            # grid_sample border clamp differs from DCN zero-pad at OOB:
            # mask out-of-range manually
            grid = torch.stack([gx_n, gy_n], dim=3)
            s = F.grid_sample(xg, grid, mode="bilinear", padding_mode="zeros",
                              align_corners=True)
            valid = ((fy >= -1) & (fy <= h) & (fx >= -1) & (fx <= w)).to(x.dtype)
            s = s * valid[:, None]
            if m is not None:
                s = s * m[:, g, k][:, None]
            wk = weight[:, g * cg:(g + 1) * cg, ky, kx]     # (cout, cg)
            out += torch.einsum("nchw,oc->nohw", s, wk)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


tv = types.ModuleType("torchvision")
tv_ops = types.ModuleType("torchvision.ops")
tv_ops.deform_conv2d = deform_conv2d_ref
tv.ops = tv_ops
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.ops", tv_ops)


def spynet_fixture():
    from models.network_vrt import SpyNet

    torch.manual_seed(0)
    net = SpyNet(load_path=None, return_levels=[2, 3, 4, 5])
    net.eval()
    rng = np.random.RandomState(0)
    ref = rng.rand(2, 3, 64, 64).astype(np.float32)
    supp = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        flows = net(torch.from_numpy(ref), torch.from_numpy(supp))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIX, "model_spynet.npz"),
        ref=ref, supp=supp,
        **{f"flow{i}": f.numpy() for i, f in enumerate(flows)},
        **{f"sd.{k}": v for k, v in sd.items()})
    print("spynet:", [tuple(f.shape) for f in flows])


def vrt_fixture():
    from models.network_vrt import VRT

    torch.manual_seed(1)
    net = VRT(upscale=4, img_size=[4, 64, 64], window_size=[2, 8, 8],
              depths=[2] * 7 + [2], indep_reconsts=[7],
              embed_dims=[12] * 7 + [16], num_heads=[2] * 8,
              pa_frames=2, deformable_groups=2, spynet_path=None)
    net.eval()
    rng = np.random.RandomState(1)
    x = rng.rand(1, 4, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIX, "model_vrt.npz"), x=x, out=out.numpy(),
        **{f"sd.{k}": v for k, v in sd.items()})
    print("vrt out:", tuple(out.shape),
          "params:", sum(v.size for v in sd.values()))


def vrt_fi_fixture():
    """pa_frames=0 frame-interpolation branch (reference forward :1454-1467)."""
    from models.network_vrt import VRT

    torch.manual_seed(3)
    net = VRT(upscale=1, out_chans=3, img_size=[4, 64, 64],
              window_size=[4, 8, 8], depths=[2] * 7 + [2, 2],
              indep_reconsts=[], embed_dims=[12] * 7 + [16, 16],
              num_heads=[2] * 9, pa_frames=0, spynet_path=None)
    net.eval()
    rng = np.random.RandomState(3)
    x = rng.rand(1, 4, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(
        os.path.join(FIX, "model_vrt_fi.npz"), x=x, out=out.numpy(),
        **{f"sd.{k}": v for k, v in sd.items()})
    print("vrt fi out:", tuple(out.shape),
          "params:", sum(v.size for v in sd.values()))


if __name__ == "__main__":
    spynet_fixture()
    vrt_fixture()
    vrt_fi_fixture()
