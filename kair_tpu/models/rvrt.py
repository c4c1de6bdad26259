"""RVRT — Recurrent Video Restoration Transformer with guided deformable
attention (reference: models/network_rvrt.py:742-1180).

Layout (B, D, H, W, C). Structure:
  feat_extract   RSTBWithInputConv (conv + LN + RSTB blocks + LN,
                 network_rvrt.py:658-707); strided conv head for deblur
  4 branches     backward_1 / forward_1 / backward_2 / forward_2 —
                 clip-recurrent propagation (:963-1071): each step warps the
                 propagated clip by composed flows and refines it with
                 guided deformable attention against the previous clip
  reconstruction RSTBWithInputConv over the 5 concatenated feature sets +
                 ×4 pixel-shuffle upsampler (:892-915, :1073-1105)

Guided deformable attention = kair_tpu.ops.deform_attn.deform_attention
(replaces the reference's CUDA extension, SURVEY.md §2.3). The reference's
CPU-cache for long videos (:1115-1155) maps to chunked processing at the
eval-harness level (host offload), not inside the jitted graph.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.models.spynet import SpyNet
from kair_tpu.models.vrt import TMSAG, _conv2d_frames, _gelu
from kair_tpu.ops.blocks import Conv, pixel_shuffle, resize_bilinear
from kair_tpu.ops.deform_attn import deform_attention
from kair_tpu.ops.warp import flow_warp


class RSTB(nn.Module):
    """x + Linear(STG_self(x)) (reference network_rvrt.py:640-656)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    remat: bool = False
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        y = TMSAG(self.dim, self.depth, self.num_heads, self.window_size,
                  mut_attn=False, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, geglu=False, remat=self.remat,
                  fuse_block=self.fuse_block,
                  dtype=self.dtype, name="group")(x)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="linear")(y)


class RSTBWithInputConv(nn.Module):
    """conv(1,3,3)[stride] + LN + num_blocks×RSTB + LN
    (reference network_rvrt.py:658-707)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    num_blocks: int = 2
    stride: int = 1
    groups: int = 1
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    remat: bool = False
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        conv = Conv(self.dim, 3, self.stride, 1,
                    feature_group_count=self.groups, dtype=self.dtype,
                    name="conv_in")
        x = _conv2d_frames(x, conv)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        for i in range(self.num_blocks):
            x = RSTB(self.dim, self.depth, self.num_heads, self.window_size,
                     self.mlp_ratio, self.qkv_bias, remat=self.remat,
                     fuse_block=self.fuse_block,
                     dtype=self.dtype, name=f"rstb{i:02d}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)


class GuidedDeformAttnPack(nn.Module):
    """Guided deformable attention (reference network_rvrt.py:179-260)."""
    dim: int
    attention_window: Tuple[int, int] = (3, 3)
    attention_heads: int = 12
    deformable_groups: int = 12
    clip_size: int = 2
    max_residue_magnitude: float = 10.0
    deform_impl: str = "auto"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, q, k, v, v_prop_warped: List, flows: List,
                 return_updateflow: bool = False):
        """All of q,k,v,warped: (B, clip, H, W, C); flows: list of
        (B, clip, H, W, 2)."""
        b, t, h, w, c = q.shape
        K = self.attention_window[0] * self.attention_window[1]
        dg = self.deformable_groups

        # offset net (1x1 conv → 4×3x3 conv → 1x1 conv, zero-init last;
        # reference :199-215)
        feat = jnp.concatenate([q] + list(v_prop_warped) + list(flows), axis=-1)
        y = feat.reshape(b * t, h, w, feat.shape[-1])
        y = nn.leaky_relu(Conv(64, 1, padding=0, dtype=self.dtype, name="off0")(y), 0.1)
        for i in range(1, 5):
            y = nn.leaky_relu(Conv(64, 3, dtype=self.dtype, name=f"off{i}")(y), 0.1)
        y = nn.Conv(self.clip_size * dg * K * 2, (1, 1),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="off5")(y)
        offset = self.max_residue_magnitude * jnp.tanh(y)
        offset = offset.reshape(b, t, h, w, self.clip_size * dg * K * 2)
        o1, o2 = jnp.split(offset, 2, axis=-1)
        # add guiding flows, flipped (x,y)→(y,x) and tiled per tap
        # (reference :243-246)
        f1 = flows[0][..., ::-1]
        f2 = flows[1][..., ::-1]
        o1 = o1 + jnp.tile(f1, (1, 1, 1, 1, o1.shape[-1] // 2))
        o2 = o2 + jnp.tile(f2, (1, 1, 1, 1, o2.shape[-1] // 2))
        offset = jnp.concatenate([o1, o2], axis=-1)      # (B,t,H,W,clip*dg*K*2)
        offset = offset.reshape(b, t, h, w, self.clip_size, dg * K * 2)
        offset = offset.transpose(0, 1, 4, 2, 3, 5)      # (B,t,clip,H,W,·)

        # q/k/v projections to 2C (reference :219-231)
        pc = c * 2
        q_p = nn.Dense(pc, dtype=self.dtype, name="proj_q")(q)
        k_p = nn.Dense(pc, dtype=self.dtype, name="proj_k")(k)
        v_p = nn.Dense(pc, dtype=self.dtype, name="proj_v")(v)

        # per query frame j, KV clip frame order is (n + j) % clip
        # (deform_attn_cuda_pt110.cpp:101-105).
        from kair_tpu.ops.warp import resolve_deform_impl
        impl = resolve_deform_impl(self.deform_impl)
        if impl == "gather":
            # keep per-frame calls: many small gather index sets beat one
            # big one on the TPU gather path (measured 2x on the analogous
            # VRT alignment batch — test_video_parity.py:139 note)
            outs = []
            for j in range(t):
                kj = jnp.stack([k_p[:, (n + j) % self.clip_size]
                                for n in range(self.clip_size)], axis=1)
                vj = jnp.stack([v_p[:, (n + j) % self.clip_size]
                                for n in range(self.clip_size)], axis=1)
                outs.append(deform_attention(
                    q_p[:, j], kj, vj, offset[:, j], self.attention_window,
                    self.attention_heads, dg, impl=self.deform_impl))
            out = jnp.stack(outs, axis=1)                # (B,t,H,W,2C)
        else:
            # mxu/fused: matmul cost is batch-linear, so all t query frames
            # ride ONE call (batch b·t) — fewer, larger kernels (round 4)
            kj = jnp.stack(
                [jnp.stack([k_p[:, (n + j) % self.clip_size]
                            for n in range(self.clip_size)], axis=1)
                 for j in range(t)], axis=1)             # (B,t,clip,H,W,2C)
            vj = jnp.stack(
                [jnp.stack([v_p[:, (n + j) % self.clip_size]
                            for n in range(self.clip_size)], axis=1)
                 for j in range(t)], axis=1)
            out = deform_attention(
                q_p.reshape(b * t, h, w, pc),
                kj.reshape(b * t, self.clip_size, h, w, pc),
                vj.reshape(b * t, self.clip_size, h, w, pc),
                offset.reshape(b * t, self.clip_size, h, w, -1),
                self.attention_window, self.attention_heads, dg,
                impl=self.deform_impl)
            out = out.reshape(b, t, h, w, pc)            # (B,t,H,W,2C)

        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        # plain MLP residual (reference :231-234, op/deform_attn.py Mlp)
        y = nn.Dense(c * 2, dtype=self.dtype, name="mlp_fc1")(out)
        out = out + nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(_gelu(y))

        if return_updateflow:
            # updated flows = mean over taps of the offsets, back to (x,y)
            # (reference :255-258)
            u1 = o1.reshape(b, t, h, w, -1, 2).mean(axis=4)[..., ::-1]
            u2 = o2.reshape(b, t, h, w, -1, 2).mean(axis=4)[..., ::-1]
            return out, u1, u2
        return out


class RVRT(nn.Module):
    """reference network_rvrt.py:742-1180."""
    upscale: int = 4
    clip_size: int = 2
    window_size: Tuple[int, int, int] = (2, 8, 8)
    num_blocks: Tuple[int, int, int] = (1, 2, 1)
    depths: Tuple[int, int, int] = (2, 2, 2)
    embed_dims: Tuple[int, int, int] = (144, 144, 144)
    num_heads: Tuple[int, int, int] = (6, 6, 6)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    inputconv_groups: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    max_residue_magnitude: float = 10.0
    deformable_groups: int = 12
    attention_heads: int = 12
    attention_window: Tuple[int, int] = (3, 3)
    nonblind_denoising: bool = False
    remat: bool = False
    fuse_block: bool = False
    deform_impl: str = "auto"
    dtype: Optional[Any] = None

    # ---- shared submodule builders (identical names/args for the full
    # forward and the streamed per-stage path, eval/rvrt_stream.py) --------
    def _feat_extract(self):
        return RSTBWithInputConv(
            self.embed_dims[0], self.depths[0], self.num_heads[0],
            (1, self.window_size[1], self.window_size[2]),
            num_blocks=self.num_blocks[0], groups=self.inputconv_groups[0],
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            remat=self.remat, fuse_block=self.fuse_block, dtype=self.dtype,
            name="feat_extract")

    def _deform(self, module: str):
        return GuidedDeformAttnPack(
            self.embed_dims[1], self.attention_window,
            self.attention_heads, self.deformable_groups, self.clip_size,
            self.max_residue_magnitude, deform_impl=self.deform_impl,
            dtype=self.dtype, name=f"deform_{module}")

    def _backbone(self, module: str):
        bi = ["backward_1", "forward_1", "backward_2", "forward_2"].index(module)
        return RSTBWithInputConv(
            self.embed_dims[1], self.depths[1], self.num_heads[1],
            self.window_size, num_blocks=self.num_blocks[1],
            groups=self.inputconv_groups[bi + 1],
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            remat=self.remat, fuse_block=self.fuse_block, dtype=self.dtype,
            name=f"backbone_{module}")

    def _reconstruct(self, cat, lqs):
        """cat (B,D,H,W,5C) branch concat → HR (B,D,4H,4W,3) incl. the
        bilinear-upsampled input residual (reference :1073-1105)."""
        hr = RSTBWithInputConv(
            self.embed_dims[2], self.depths[2], self.num_heads[2],
            (1, self.window_size[1], self.window_size[2]),
            num_blocks=self.num_blocks[2], groups=self.inputconv_groups[5],
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            remat=self.remat, fuse_block=self.fuse_block, dtype=self.dtype,
            name="reconstruction")(cat)
        cbu = Conv(64, 1, padding=0, dtype=self.dtype, name="conv_before_upsampler")
        hr = _conv2d_frames(hr, lambda a: nn.leaky_relu(cbu(a), 0.1))
        for i in range(2):
            up = Conv(256, 3, dtype=self.dtype, name=f"upsampler{i}")
            hr = _conv2d_frames(hr, lambda a, up=up: nn.leaky_relu(
                pixel_shuffle(up(a), 2), 0.1))
        upt = Conv(64, 3, dtype=self.dtype, name="upsampler_tail")
        hr = _conv2d_frames(hr, upt)
        last = Conv(3, 3, dtype=self.dtype, name="conv_last")
        hr = _conv2d_frames(hr, last)
        base = jax.vmap(lambda f: resize_bilinear(
            f, (hr.shape[2], hr.shape[3])), in_axes=1, out_axes=1)(lqs[..., :3])
        return hr + base

    def _run_stage(self, stage: str, kw: dict):
        """Per-stage entry for chunked/streamed long-video eval
        (eval/rvrt_stream.py) — the TPU analog of the reference's CPU
        feature cache (network_rvrt.py:1115-1155). Same submodule names →
        same param tree as the full forward."""
        if stage == "shallow":
            assert self.upscale == 4, "streamed eval: SR head only"
            return self._feat_extract()(kw["clip"])
        if stage == "flow":
            spynet = SpyNet(return_levels=(5,), dtype=self.dtype, name="spynet")
            return spynet(kw["l1"], kw["l2"])
        if stage == "deform":
            return self._deform(kw["module"])(
                kw["q"], kw["k"], kw["v"], kw["warped"], kw["flows"],
                kw["update"])
        if stage == "backbone":
            return self._backbone(kw["module"])(kw["cat"])
        if stage == "recon":
            return self._reconstruct(kw["cat"], kw["lq"])
        raise ValueError(f"unknown stage {stage}")

    @nn.compact
    def __call__(self, lqs=None, train: bool = False,
                 stage: Optional[str] = None, **kw):
        if stage is not None:
            return self._run_stage(stage, kw)
        n, t, h, w, _ = lqs.shape
        assert t % self.clip_size == 0, "frame count must divide clip_size"

        spynet = SpyNet(return_levels=(5,), dtype=self.dtype, name="spynet")

        if self.upscale == 4:
            lqs_ds = lqs
            feat_shallow = self._feat_extract()(lqs)
        else:
            # deblur/denoise: 4x strided conv head (reference :826-840)
            c0 = Conv(self.embed_dims[0], 3, 2, 1, dtype=self.dtype, name="down0")
            c1 = Conv(self.embed_dims[0], 3, 2, 1, dtype=self.dtype, name="down1")
            y = _conv2d_frames(lqs, lambda a: nn.leaky_relu(c0(a), 0.1))
            y = _conv2d_frames(y, lambda a: nn.leaky_relu(c1(a), 0.1))
            feat_shallow = RSTBWithInputConv(
                self.embed_dims[0], self.depths[0], self.num_heads[0],
                (1, self.window_size[1], self.window_size[2]),
                num_blocks=self.num_blocks[0], groups=self.inputconv_groups[0],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                remat=self.remat, fuse_block=self.fuse_block,
                dtype=self.dtype, name="feat_extract")(y)
            lqs_ds = jax.vmap(lambda f: resize_bilinear(
                f, (h // 4, w // 4)), in_axes=1, out_axes=1)(lqs[..., :3])

        # flows on the downsampled sequence (reference compute_flow :917-946)
        hd_, wd_ = lqs_ds.shape[2:4]
        l1 = lqs_ds[:, :-1].reshape(-1, hd_, wd_, lqs_ds.shape[-1])
        l2 = lqs_ds[:, 1:].reshape(-1, hd_, wd_, lqs_ds.shape[-1])
        # both directions in ONE SpyNet call: every op in the pyramid is
        # batch-parallel, so stacking halves the sequential chain of tiny
        # convs/warps (the flow stage is latency-bound at 64px clips)
        flows = spynet(jnp.concatenate([l1, l2], axis=0),
                       jnp.concatenate([l2, l1], axis=0))
        flows_backward = flows[:n * (t - 1)].reshape(n, t - 1, hd_, wd_, 2)
        flows_forward = flows[n * (t - 1):].reshape(n, t - 1, hd_, wd_, 2)

        n_clips = t // self.clip_size
        feats = {"shallow": [feat_shallow[:, i * self.clip_size:(i + 1) * self.clip_size]
                             for i in range(n_clips)]}

        updated_flows: dict = {}
        order = ["backward_1", "forward_1", "backward_2", "forward_2"]
        for module in order:
            flows = flows_backward if "backward" in module else flows_forward
            feats = self._propagate(feats, flows, module,
                                    self._deform(module),
                                    self._backbone(module), updated_flows)

        # reconstruction (reference upsample :1073-1105)
        cat = jnp.concatenate(
            [jnp.concatenate(feats[k], axis=1) for k in
             ["shallow", "backward_1", "forward_1", "backward_2", "forward_2"]],
            axis=-1)
        return self._reconstruct(cat, lqs)

    # ------------------------------------------------------------------
    def _propagate(self, feats, flows, module_name, deform, backbone,
                   updated_flows):
        """Clip-recurrent propagation (reference :963-1071)."""
        n, tm1 = flows.shape[0], flows.shape[1]
        t = tm1 + 1
        clip = self.clip_size
        if "backward" in module_name:
            flow_idx = list(range(0, t))[::-1]
            clip_idx = list(range(0, t // clip))[::-1]
        else:
            flow_idx = list(range(-1, tm1))
            clip_idx = list(range(0, t // clip))

        if "_1" in module_name:
            updated_flows[f"{module_name}_n1"] = []
            updated_flows[f"{module_name}_n2"] = []

        feat_prop = jnp.zeros_like(feats["shallow"][0])
        last_key = list(feats)[-2] if len(feats) > 1 else "shallow"
        keys_before = [k for k in feats if k != module_name]
        feats[module_name] = []

        for i in range(len(clip_idx)):
            idx_c = clip_idx[i]
            if i > 0:
                if "_1" in module_name:
                    f01 = flows[:, flow_idx[clip * i - 1]]
                    f12 = flows[:, flow_idx[clip * i]]
                    f23 = flows[:, flow_idx[clip * i + 1]]
                    f02 = f12 + flow_warp(f01, f12)
                    f13 = f23 + flow_warp(f12, f23)
                    f03 = f23 + flow_warp(f02, f23)
                    flow_n1 = jnp.stack([f02, f13], 1)
                    flow_n2 = jnp.stack([f12, f03], 1)
                else:
                    old = module_name.replace("_2", "_1")
                    flow_n1 = updated_flows[f"{old}_n1"][i - 1]
                    flow_n2 = updated_flows[f"{old}_n2"][i - 1]

                if "backward" in module_name:
                    feat_q = feats[last_key][idx_c][:, ::-1]
                    feat_k = feats[last_key][clip_idx[i - 1]][:, ::-1]
                else:
                    feat_q = feats[last_key][idx_c]
                    feat_k = feats[last_key][clip_idx[i - 1]]

                def warp_clip(fp, fl):
                    b, tc = fp.shape[0], fp.shape[1]
                    flat = fp.reshape((-1,) + fp.shape[2:])
                    fl_flat = fl.reshape((-1,) + fl.shape[2:])
                    return flow_warp(flat, fl_flat).reshape(fp.shape)

                fpw1 = warp_clip(feat_prop, flow_n1)
                fpw2 = warp_clip(feat_prop[:, ::-1], flow_n2)

                if "_1" in module_name:
                    feat_prop, flow_n1u, flow_n2u = deform(
                        feat_q, feat_k, feat_prop, [fpw1, fpw2],
                        [flow_n1, flow_n2], True)
                    updated_flows[f"{module_name}_n1"].append(flow_n1u)
                    updated_flows[f"{module_name}_n2"].append(flow_n2u)
                else:
                    feat_prop = deform(feat_q, feat_k, feat_prop,
                                       [fpw1, fpw2], [flow_n1, flow_n2], False)

            if "backward" in module_name:
                feat = [feats[k][idx_c][:, ::-1] for k in keys_before] + [feat_prop]
            else:
                feat = [feats[k][idx_c] for k in keys_before] + [feat_prop]
            feat_prop = feat_prop + backbone(jnp.concatenate(feat, axis=-1))
            feats[module_name].append(feat_prop)

        if "backward" in module_name:
            feats[module_name] = [f[:, ::-1] for f in feats[module_name][::-1]]
        return feats
