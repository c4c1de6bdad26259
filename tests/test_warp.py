"""grid_sample / flow_warp / deformable-conv parity vs torch."""

import numpy as np
import pytest
import torch


def nhwc(t):
    return t.transpose(0, 2, 3, 1)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(mode, padding, align):
    from kair_tpu.ops.warp import grid_sample

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 7, 8, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
        padding_mode=padding, align_corners=align).numpy()
    got = np.asarray(grid_sample(nhwc(x), grid, mode, padding, align))
    np.testing.assert_allclose(got, nhwc(want), atol=2e-6)


def _torch_flow_warp(x, flow, interp, padding):
    """Oracle replicating reference flow_warp semantics
    (network_vrt.py:208-264) with torch grid_sample (align_corners=True)."""
    n, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h, dtype=x.dtype),
                            torch.arange(w, dtype=x.dtype), indexing="ij")
    grid = torch.stack((gx, gy), 2)
    vgrid = grid + flow
    if interp == "nearest4":
        outs = []
        for fx in (torch.floor, torch.ceil):
            for fy in (torch.floor, torch.ceil):
                gx2 = 2.0 * fx(vgrid[..., 0]) / max(w - 1, 1) - 1.0
                gy2 = 2.0 * fy(vgrid[..., 1]) / max(h - 1, 1) - 1.0
                outs.append(torch.nn.functional.grid_sample(
                    x, torch.stack((gx2, gy2), 3), mode="nearest",
                    padding_mode=padding, align_corners=True))
        return torch.cat(outs, 1)
    gx2 = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    gy2 = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    return torch.nn.functional.grid_sample(
        x, torch.stack((gx2, gy2), 3), mode=interp, padding_mode=padding,
        align_corners=True)


def test_flow_warp_matches_torch_oracle():
    from kair_tpu.ops.warp import flow_warp

    rng = np.random.RandomState(1)
    x = rng.rand(2, 4, 12, 10).astype(np.float32)
    flow = (rng.rand(2, 12, 10, 2).astype(np.float32) * 4 - 2)

    for interp in ("bilinear", "nearest4"):
        want = _torch_flow_warp(torch.from_numpy(x), torch.from_numpy(flow),
                                interp, "zeros").numpy()
        got = np.asarray(flow_warp(nhwc(x), flow, interp_mode=interp,
                                   padding_mode="zeros"))
        np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


def _naive_deform_conv(x, offset, mask, weight, bias, pad, dg):
    """Naive numpy DCNv2 oracle (torchvision deform_conv2d semantics)."""
    n, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    K = kh * kw
    cg = cin // dg
    xp = np.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0)))
    out = np.zeros((n, cout, h, w), np.float32)

    def sample(img, fy, fx):
        y0, x0 = int(np.floor(fy)), int(np.floor(fx))
        acc = 0.0
        for (yy, wy) in ((y0, 1 - (fy - y0)), (y0 + 1, fy - y0)):
            for (xx, wx) in ((x0, 1 - (fx - x0)), (x0 + 1, fx - x0)):
                if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                    acc += wy * wx * img[yy, xx]
        return acc

    for b in range(n):
        for oy in range(h):
            for ox in range(w):
                for g in range(dg):
                    for k in range(K):
                        ky, kx = divmod(k, kw)
                        fy = oy - pad + ky + offset[b, g * 2 * K + 2 * k, oy, ox]
                        fx = ox - pad + kx + offset[b, g * 2 * K + 2 * k + 1, oy, ox]
                        m = mask[b, g * K + k, oy, ox]
                        for c in range(cg):
                            cin_idx = g * cg + c
                            v = sample(x[b, cin_idx], fy, fx) * m
                            out[b, :, oy, ox] += v * weight[:, cin_idx, ky, kx]
    return out + bias[None, :, None, None]


def test_deform_conv_matches_naive_oracle():
    from kair_tpu.ops.warp import modulated_deform_conv

    rng = np.random.RandomState(2)
    n, cin, h, w = 1, 4, 6, 7
    cout, kh, kw, dg = 3, 3, 3, 2
    K = kh * kw
    x = rng.rand(n, cin, h, w).astype(np.float32)
    offset = (rng.rand(n, dg * 2 * K, h, w).astype(np.float32) * 3 - 1.5)
    mask = 1 / (1 + np.exp(-rng.rand(n, dg * K, h, w).astype(np.float32)))
    weight = rng.rand(cout, cin // 1, kh, kw).astype(np.float32) * 0.1
    bias = rng.rand(cout).astype(np.float32)

    want = _naive_deform_conv(x, offset, mask, weight, bias, 1, dg)

    got = np.asarray(modulated_deform_conv(
        nhwc(x), nhwc(offset), nhwc(mask),
        weight.transpose(2, 3, 1, 0), bias, stride=1, padding=1,
        dilation=1, deformable_groups=dg))
    np.testing.assert_allclose(got, nhwc(want), atol=1e-4)
