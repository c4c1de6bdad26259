"""Golden fixtures for RVRT parity: run the reference network_rvrt.py with a
pure-torch `models.op.deform_attn` stub implementing the CUDA kernel's
documented semantics (deform_attn_cuda_pt110.cpp:64-120): per query pixel,
gather clip*K deformable KV samples (bilinear, per deformable group) and
softmax-attend per head.

Run once: python tests/make_fixtures_rvrt.py
"""

import collections.abc
import os
import sys
import types

sys.path.insert(0, "/root/reference")
for _m in ("lpips", "pytorch_fid", "requests"):
    sys.modules.setdefault(_m, types.ModuleType(_m))

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

# timm + torchvision stubs (as in make_fixtures_vrt)
timm = types.ModuleType("timm"); layers = types.ModuleType("timm.layers")


class _DropPath(tnn.Module):
    def forward(self, x):
        return x


layers.DropPath = _DropPath
layers.to_2tuple = lambda v: tuple(v) if isinstance(v, collections.abc.Iterable) else (v, v)
layers.trunc_normal_ = torch.nn.init.trunc_normal_
timm.layers = layers
sys.modules.setdefault("timm", timm)
sys.modules.setdefault("timm.layers", layers)
tv = types.ModuleType("torchvision"); tv.ops = types.ModuleType("torchvision.ops")
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.ops", tv.ops)


def deform_attn_torch(q, kv, offset, kernel_h, kernel_w, stride, padding,
                      dilation, attention_heads, deformable_groups, clip_size):
    """Pure-torch reimplementation of the CUDA op's math
    (deform_attn_cuda_pt110.cpp:64-120)."""
    B = q.shape[0]
    C2 = kv.shape[2]
    C = C2 // 2
    h, w = kv.shape[3], kv.shape[4]
    heads, dg, K = attention_heads, deformable_groups, kernel_h * kernel_w
    hd = C // heads
    scale = hd ** -0.5
    pad = padding

    off = offset.view(B, clip_size, dg, K, 2, h, w)
    gy, gx = torch.meshgrid(torch.arange(h, dtype=q.dtype),
                            torch.arange(w, dtype=q.dtype), indexing="ij")
    outs = []
    for bi in range(B):
        samples = []             # list over S of (2C, h, w)
        for n in range(clip_size):
            frame = kv[bi // clip_size, (n + bi) % clip_size]     # (2C,h,w)
            fg = frame.view(dg, C2 // dg, h, w)
            for t_ in range(K):
                ty, tx = divmod(t_, kernel_w)
                fy = gy + (ty - pad) + off[bi, n, :, t_, 0]       # (dg,h,w)
                fx = gx + (tx - pad) + off[bi, n, :, t_, 1]
                gxn = 2.0 * fx / max(w - 1, 1) - 1.0
                gyn = 2.0 * fy / max(h - 1, 1) - 1.0
                grid = torch.stack([gxn, gyn], dim=3)             # (dg,h,w,2)
                s = F.grid_sample(fg, grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=True)
                valid = ((fy >= -1) & (fy <= h) & (fx >= -1) & (fx <= w)
                         ).to(q.dtype)[:, None]
                samples.append((s * valid).reshape(C2, h, w))
        S = clip_size * K
        cols = torch.stack(samples, 0)                            # (S,2C,h,w)
        kcol = cols[:, :C].view(S, heads, hd, h * w)
        vcol = cols[:, C:].view(S, heads, hd, h * w)
        qb = q[bi, 0].view(heads, hd, h * w) * scale
        attn = torch.einsum("ndp,sndp->nps", qb, kcol).softmax(-1)
        ob = torch.einsum("nps,sndp->ndp", attn, vcol).reshape(C, h, w)
        outs.append(ob)
    return torch.stack(outs, 0).view(B, 1, C, h, w).squeeze(1).view(q.shape)


# stub models.op.deform_attn BEFORE importing network_rvrt
op_mod = types.ModuleType("models.op.deform_attn")
op_mod.deform_attn = deform_attn_torch


class _Mlp(tnn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = tnn.Linear(in_features, hidden_features)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _DeformAttnPack(tnn.Module):
    """Attribute-compatible stand-in for op/deform_attn.py:110-180 (the
    parts GuidedDeformAttnPack relies on)."""

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
# make `models` a package entry so relative import resolves
import models  # noqa: E402  (reference package)

sys.modules.setdefault("models.op", types.ModuleType("models.op"))
sys.modules["models.op"].deform_attn = op_mod


def rvrt_fixture():
    from models.network_rvrt import RVRT as TorchRVRT

    torch.manual_seed(2)
    net = TorchRVRT(upscale=4, clip_size=2, img_size=[2, 64, 64],
                    window_size=[2, 8, 8], num_blocks=[1, 1, 1],
                    depths=[2, 2, 2], embed_dims=[16, 16, 16],
                    num_heads=[2, 2, 2], deformable_groups=2,
                    attention_heads=2, spynet_path=None)
    net.eval()
    rng = np.random.RandomState(2)
    x = rng.rand(1, 4, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(os.path.join(FIX, "model_rvrt.npz"), x=x,
                        out=out.numpy(),
                        **{f"sd.{k}": v for k, v in sd.items()})
    print("rvrt out:", tuple(out.shape), "params:",
          sum(v.size for v in sd.values()))


if __name__ == "__main__":
    rvrt_fixture()
