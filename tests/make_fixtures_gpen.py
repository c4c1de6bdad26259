"""GPEN fixture: run the reference network_faceenhancer.py with a pure-torch
`op` module stub (upfirdn2d / fused_leaky_relu native math, the standard
CPU fallbacks of the CUDA ops in models/op/).

Run once: python tests/make_fixtures_gpen.py
"""

import os
import sys
import types

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def upfirdn2d_native(x, kernel, up, down, pad0, pad1):
    b, c, h, w = x.shape
    # zero-stuff
    x = x.view(b, c, h, 1, w, 1)
    x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
    x = x.view(b, c, h * up, w * up)
    # pad (negative = crop)
    x = F.pad(x, [max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
    x = x[:, :, max(-pad0, 0): x.shape[2] - max(-pad1, 0),
          max(-pad0, 0): x.shape[3] - max(-pad1, 0)]
    # FIR (correlation with flipped kernel), depthwise
    kh, kw = kernel.shape
    wk = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw).repeat(c, 1, 1, 1)
    x = F.conv2d(x, wk, groups=c)
    return x[:, :, ::down, ::down]


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    return upfirdn2d_native(x, kernel.to(x.dtype), up, down, pad[0], pad[1])


def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        rest = [1] * (x.ndim - bias.ndim - 1)
        x = x + bias.view(1, bias.shape[0], *rest)
    return F.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLU(tnn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = tnn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)


op = types.ModuleType("op")
op.upfirdn2d = upfirdn2d
op.fused_leaky_relu = fused_leaky_relu
op.FusedLeakyReLU = FusedLeakyReLU
sys.modules["op"] = op

sys.path.insert(0, "/root/reference")
for _m in ("lpips", "pytorch_fid", "requests"):
    sys.modules.setdefault(_m, types.ModuleType(_m))


def main():
    from models.network_faceenhancer import FullGenerator

    torch.manual_seed(4)
    size, style_dim, n_mlp, cm = 64, 64, 2, 1
    net = FullGenerator(size, style_dim, n_mlp, channel_multiplier=cm)
    net.eval()
    rng = np.random.RandomState(4)
    x = (rng.rand(1, 3, size, size).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        out, _ = net(torch.from_numpy(x))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez_compressed(os.path.join(FIX, "model_gpen.npz"), x=x,
                        out=out.numpy(),
                        **{f"sd.{k}": v for k, v in sd.items()})
    print("gpen out:", tuple(out.shape),
          "params:", sum(v.size for v in sd.values()))


if __name__ == "__main__":
    main()
