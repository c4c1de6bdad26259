"""SwinIR — image restoration with shifted-window transformers
(reference: models/network_swinir.py:618-852; the benchmark model for the
≥2× MP/s/chip target, SURVEY.md §7.5).

TPU-native design decisions:

* NHWC feature maps end-to-end; window partition/reverse are reshapes
  (reference's (B,L,C) token layout + view gymnastics collapse away).
* shift masks and relative-position indices are numpy constants computed at
  trace time for the actual static (H, W) — the reference's
  "if input_resolution == x_size" runtime switch (network_swinir.py:261-265)
  is unnecessary under XLA's shape specialization.
* the attention core routes through kair_tpu.ops.window_attention.window_msa
  which can swap in the Pallas fused kernel (`use_pallas`).
* exact (erf) GELU to match torch's default — NOT jax's tanh approximation.
* `jax.checkpoint` per RSTB when remat=True (analog of use_checkpoint,
  network_swinir.py:447).

Checkpoint parity: the converter maps the released 'params'/'params_ema'
zoos (main_test_swinir.py:124-177) onto this module.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kair_tpu.ops.blocks import Conv, pixel_shuffle, upsample_nearest
from kair_tpu.utils.logger import warn_once
from kair_tpu.ops.window_attention import (relative_position_index,
                                           shift_attn_mask_graph,
                                           window_msa,
                                           window_partition, window_reverse)

_gelu = lambda x: jax.nn.gelu(x, approximate=False)


class SwinBlock(nn.Module):
    """One Swin transformer block: [shift] → W-MSA(+rel-bias,+mask) →
    [unshift] → residual → LN→MLP→residual (reference
    SwinTransformerBlock, network_swinir.py:164-277).

    fuse_block=True runs the ENTIRE block (LN1+attention+LN2+MLP, both
    residuals) as one Pallas kernel in shifted-window space
    (ops/pallas/swin_block.py) — LN/MLP are per-token so window
    partitioning commutes with them. Fused mode declares the LN/MLP params
    flat (norm1_scale, fc1_kernel, …); `fused_block_params` adapts a
    standard tree."""
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_pallas: bool = False
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False, phase_in: int = 0):
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0

        n = ws * ws
        qkv_kernel = self.param("qkv_kernel", nn.initializers.normal(0.02),
                                (c, 3 * c))
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * c,)) \
            if self.qkv_bias else None
        proj_kernel = self.param("proj_kernel", nn.initializers.normal(0.02), (c, c))
        proj_b = self.param("proj_bias", nn.initializers.zeros, (c,))
        bias_table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                                ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        # rel_idx stays numpy: converted checkpoints hold numpy params, and
        # numpy fancy-indexing by a traced index breaks under jit
        rel_idx = relative_position_index(ws, ws)
        # in-graph mask from (nW, N) labels: the (nW, N, N) literal is
        # ~4 MB of HLO per shifted block at 128px (compile-time killer)
        mask = shift_attn_mask_graph(h, w, ws, shift) if shift > 0 else None
        hidden = int(c * self.mlp_ratio)

        if self.fuse_block:
            # the flat LN/MLP param layout is declared UNCONDITIONALLY when
            # fuse_block=True: the param structure depends only on static
            # config, never on the input geometry or the train flag (a
            # runtime-dependent layout breaks flax param resolution when
            # e.g. a W%16!=0 training crop follows a fused-geometry init).
            ln1s = self.param("norm1_scale", nn.initializers.ones, (c,))
            ln1b = self.param("norm1_bias", nn.initializers.zeros, (c,))
            ln2s = self.param("norm2_scale", nn.initializers.ones, (c,))
            ln2b = self.param("norm2_bias", nn.initializers.zeros, (c,))
            fc1k = self.param("fc1_kernel", nn.initializers.normal(0.02),
                              (c, hidden))
            fc1b = self.param("fc1_bias", nn.initializers.zeros, (hidden,))
            fc2k = self.param("fc2_kernel", nn.initializers.normal(0.02),
                              (hidden, c))
            fc2b = self.param("fc2_bias", nn.initializers.zeros, (c,))
            flat = (qkv_kernel, qkv_b, proj_kernel, proj_b, ln1s, ln1b,
                    ln2s, ln2b, fc1k, fc1b, fc2k, fc2b)
            nw = (h // ws) * (w // ws)
            # strip kernel VMEM cap (see strip_w_max): bigger frames should
            # use tiled eval (eval/test_modes)
            from kair_tpu.ops.pallas.swin_block import strip_w_max
            w_strip_max = strip_w_max(c)
            if (n == 64 and h % 8 == 0 and w % 16 == 0
                    and w <= w_strip_max and not train):
                # inference strip kernel with the cyclic shift FOLDED into
                # the read (phase = shift - phase_in): no jnp.roll HBM
                # round-trips; output stays in this block's phase and RSTB
                # threads it (un-rolling once per residual group).
                from kair_tpu.ops.pallas.swin_block import swin_block_pallas_2d
                return swin_block_pallas_2d(x, qkv_kernel, qkv_b, proj_kernel,
                                            proj_b, bias_table, rel_idx,
                                            self.num_heads, ln1s, ln1b, ln2s,
                                            ln2b, fc1k, fc1b, fc2k, fc2b, mask,
                                            phase=shift - phase_in)
            assert phase_in == 0, "phase threading requires the strip kernel"
            if shift > 0:
                x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            if n == 64 and h % 8 == 0 and w % 16 == 0 and w <= w_strip_max:
                # training strip kernel: differentiable (custom VJP, remat
                # memory profile); explicit rolls (phase=0). safe=True:
                # training logits are unbounded, so the forward subtracts
                # the row max (ADVICE r1); inference keeps the cheaper
                # max-free softmax.
                from kair_tpu.ops.pallas.swin_block import swin_block_pallas_2d
                x = swin_block_pallas_2d(x, qkv_kernel, qkv_b, proj_kernel,
                                         proj_b, bias_table, rel_idx,
                                         self.num_heads, ln1s, ln1b, ln2s,
                                         ln2b, fc1k, fc1b, fc2k, fc2b, mask,
                                         safe=True)
            elif n in (49, 64) and not train \
                    and (mask is None or nw <= 256):
                # window-pair kernel: inference fallback for W % 16 != 0 /
                # odd window counts / frames too wide for the strip kernel,
                # and the native fused path for ws=7 (JPEG-CAR configs,
                # main_test_swinir.py:170-172) — 49-token windows ride the
                # 64-token kernel via zero-pad + key mask. Shifted blocks
                # materialize a per-pair bias, so huge frames (nw > 256)
                # go to XLA instead of blowing HBM.
                warn_once(
                    f"swin-pair-fallback-{h}x{w}x{ws}",
                    f"SwinIR fused strip kernel disabled at {h}x{w}, "
                    f"window {ws} (needs ws==8, H%8==0, W%16==0, "
                    f"W<={w_strip_max}): using the window-pair kernel"
                    + (" (~1.3x token-pad overhead for ws=7)" if n == 49
                       else " — pad/tile to these multiples for full "
                            "speed"))
                from kair_tpu.ops.pallas.swin_block import swin_block_pallas
                xw = window_partition(x, ws)
                xw = swin_block_pallas(xw, qkv_kernel, qkv_b, proj_kernel,
                                       proj_b, bias_table, rel_idx,
                                       self.num_heads, ln1s, ln1b, ln2s, ln2b,
                                       fc1k, fc1b, fc2k, fc2b, mask)
                x = window_reverse(xw, ws, h, w)
            else:
                # odd geometry (odd window count / tiny inputs) or training
                # off the fused geometry: jnp path on the SAME flat params
                warn_once(
                    f"swin-xla-fallback-{h}x{w}x{ws}-{train}",
                    f"SwinIR fuse_block=True fell back to the XLA path at "
                    f"{h}x{w}, window {ws}, train={train} (~4x slower): "
                    + ("window size 8 (or 7 at inference) is required for "
                       f"the Pallas kernels (got {ws}); pad/crop or "
                       "accept the XLA path"
                       if n not in (49, 64) else
                       "training requires ws=8 with H%8==0 and W%16==0"
                       if train else
                       "pad H to a multiple of 8 and W to a multiple of 16"))
                x = _flat_block_xla(x, ws, flat, bias_table, rel_idx,
                                    self.num_heads, mask)
            if shift > 0:
                x = jnp.roll(x, (shift, shift), axis=(1, 2))
            return x

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, ws)

        xw = window_msa(xw, qkv_kernel, qkv_b, proj_kernel, proj_b,
                        bias_table, rel_idx, self.num_heads, mask,
                        use_pallas=self.use_pallas)
        x = window_reverse(xw, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x

        # MLP
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(y)
        y = _gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


def _flat_block_xla(x, ws, flat, bias_table, rel_idx, num_heads, mask):
    """jnp fallback for fuse_block=True on geometries the Pallas kernels
    don't cover: the full block (LN1 → W-MSA → residual → LN2 → MLP →
    residual) computed from the FLAT param layout. Caller has already
    applied the cyclic shift; LN is per-token so it commutes with the roll
    (reference SwinTransformerBlock, network_swinir.py:239-277)."""
    (qkv_kernel, qkv_b, proj_kernel, proj_b, ln1s, ln1b,
     ln2s, ln2b, fc1k, fc1b, fc2k, fc2b) = flat
    b, h, w, c = x.shape
    dtype = x.dtype

    def ln(v, s, bb):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + 1e-5)) * s + bb).astype(dtype)

    y = ln(x, ln1s, ln1b)
    yw = window_partition(y, ws)
    yw = window_msa(yw, qkv_kernel, qkv_b, proj_kernel, proj_b,
                    bias_table, rel_idx, num_heads, mask)
    x = x + window_reverse(yw, ws, h, w)
    z = ln(x, ln2s, ln2b)
    z = jnp.dot(z, fc1k.astype(dtype)) + fc1b.astype(dtype)
    z = _gelu(z)
    z = jnp.dot(z, fc2k.astype(dtype)) + fc2b.astype(dtype)
    return x + z


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth SwinBlocks (alternating
    shift 0, ws//2) + conv + residual (reference network_swinir.py:419-494)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    resi_connection: str = "1conv"
    use_pallas: bool = False
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        ws = min(h, w) if min(h, w) <= self.window_size else self.window_size
        # phase threading (inference strip kernel only): each block's output
        # stays in that block's shift phase; one un-roll at group end
        # replaces 2 jnp.roll HBM round-trips per shifted block
        use_phase = (self.fuse_block and not train and ws == 8
                     and h % 8 == 0 and w % 16 == 0)
        res = x
        phase = 0
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window_size // 2
            res = SwinBlock(self.dim, self.num_heads, self.window_size,
                            shift, self.mlp_ratio, use_pallas=self.use_pallas,
                            fuse_block=self.fuse_block,
                            dtype=self.dtype, name=f"blk{i:02d}")(
                res, train=train, phase_in=phase)
            if use_phase:
                # SwinBlock zeroes the shift when min(h,w) <= window_size —
                # thread the same EFFECTIVE shift
                phase = shift if min(h, w) > self.window_size else 0
        if self.resi_connection == "1conv" and self.fuse_block and not train:
            # fused tail: the group un-roll, 3x3 conv and residual run as
            # ONE Pallas strip pass (ops/pallas/conv_block.py) — replaces a
            # roll HBM round-trip + conv relayout + residual fusion
            return Conv(self.dim, dtype=self.dtype, name="conv")(
                res, residual=x, phase=phase)
        if phase:
            res = jnp.roll(res, (phase, phase), axis=(1, 2))
        if self.resi_connection == "1conv":
            res = Conv(self.dim, dtype=self.dtype, name="conv")(res)
        else:  # 3conv (network_swinir.py:469-473)
            res = Conv(self.dim // 4, dtype=self.dtype, name="conv_a")(res)
            res = nn.leaky_relu(res, 0.2)
            res = Conv(self.dim // 4, 1, padding=0, dtype=self.dtype, name="conv_b")(res)
            res = nn.leaky_relu(res, 0.2)
            res = Conv(self.dim, dtype=self.dtype, name="conv_c")(res)
        return res + x


class SwinIR(nn.Module):
    """reference network_swinir.py:618-852. Input NHWC with H, W multiples
    of window_size (pad outside jit; `pad_input` helper below)."""
    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    ape: bool = False
    patch_norm: bool = True
    num_feat: int = 64
    remat: bool = False
    use_pallas: bool = False
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        assert h % self.window_size == 0 and w % self.window_size == 0, \
            "pad input to window multiples outside jit (swinir.pad_input)"

        if self.in_chans == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        else:
            mean = jnp.zeros((self.in_chans,), x.dtype)
        x = (x - mean) * self.img_range

        def features(feat):
            # returns body(feat) + feat: the residual is folded here so the
            # fused conv_after_body tail (Pallas conv+residual, one HBM
            # pass) can consume it; reference adds it at the call site
            # (network_swinir.py:661-668)
            feat0 = feat
            if self.patch_norm:
                feat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    name="patch_norm")(feat)
            if self.ape:
                # absolute position embedding (reference
                # network_swinir.py:643-651,679): (1, num_patches, C) added
                # after patch norm; our NHWC layout keeps it (1, S, S, C).
                # Like the reference, the embedding is sized by img_size —
                # other input sizes cannot use ape.
                fh, fw = feat.shape[1], feat.shape[2]
                if (fh, fw) != (self.img_size, self.img_size):
                    raise ValueError(
                        f"ape=True requires {self.img_size}x{self.img_size} "
                        f"inputs (got {fh}x{fw}) — the absolute position "
                        "embedding is sized by img_size, as in the reference")
                ape = self.param("absolute_pos_embed",
                                 nn.initializers.truncated_normal(0.02),
                                 (1, self.img_size, self.img_size,
                                  self.embed_dim))
                feat = feat + ape.astype(feat.dtype)
            for il, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
                layer = RSTB(self.embed_dim, d, nh, self.window_size,
                             self.mlp_ratio, self.resi_connection,
                             use_pallas=self.use_pallas,
                             fuse_block=self.fuse_block, dtype=self.dtype,
                             name=f"layer{il}")
                if self.remat:
                    feat = nn.remat(lambda m, v: m(v, train=train))(layer, feat)
                else:
                    feat = layer(feat, train=train)
            feat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(feat)
            if self.resi_connection != "1conv":
                return self._conv3(feat) + feat0
            cab = Conv(self.embed_dim, dtype=self.dtype,
                       name="conv_after_body")
            if self.fuse_block and not train:
                return cab(feat, residual=feat0)
            return cab(feat) + feat0

        if self.upsampler == "pixelshuffle":
            x = Conv(self.embed_dim, dtype=self.dtype, name="conv_first")(x)
            x = features(x)
            x = nn.leaky_relu(
                Conv(self.num_feat, dtype=self.dtype, name="conv_before_upsample")(x),
                0.01)
            # Upsample: 2^n or 3 (reference network_swinir.py:572-591)
            s = self.upscale
            i = 0
            while s > 1:
                r = 3 if s % 3 == 0 else 2
                x = pixel_shuffle(
                    Conv(self.num_feat * r * r, dtype=self.dtype,
                         name=f"upsample{i}")(x), r)
                s //= r
                i += 1
            x = Conv(self.in_chans, dtype=self.dtype, name="conv_last")(x)
        elif self.upsampler == "pixelshuffledirect":
            x = Conv(self.embed_dim, dtype=self.dtype, name="conv_first")(x)
            x = features(x)
            x = pixel_shuffle(
                Conv(self.in_chans * self.upscale ** 2, dtype=self.dtype,
                     name="upsample_direct")(x), self.upscale)
        elif self.upsampler == "nearest+conv":
            x = Conv(self.embed_dim, dtype=self.dtype, name="conv_first")(x)
            x = features(x)
            x = nn.leaky_relu(
                Conv(self.num_feat, dtype=self.dtype, name="conv_before_upsample")(x),
                0.01)
            x = nn.leaky_relu(Conv(self.num_feat, dtype=self.dtype, name="conv_up1")(
                upsample_nearest(x, 2)), 0.2)
            x = nn.leaky_relu(Conv(self.num_feat, dtype=self.dtype, name="conv_up2")(
                upsample_nearest(x, 2)), 0.2)
            x = Conv(self.in_chans, dtype=self.dtype, name="conv_last")(
                nn.leaky_relu(Conv(self.num_feat, dtype=self.dtype, name="conv_hr")(x), 0.2))
        else:  # denoise / JPEG CAR
            x_first = Conv(self.embed_dim, dtype=self.dtype, name="conv_first")(x)
            res = features(x_first)
            x = x + Conv(self.in_chans, dtype=self.dtype, name="conv_last")(res)

        # keep the de-normalization in the compute dtype: `mean` was built
        # from the f32 input, and a f32 add at HR size (e.g. 16x512x512x3)
        # costs ~3.3 ms/iter of pure layout/convert work in the bf16 model
        # (round-5 trace, convert_add_fusion.2)
        return x / self.img_range + mean.astype(x.dtype)

    def _conv3(self, feat):
        feat = Conv(self.embed_dim // 4, dtype=self.dtype, name="cab_a")(feat)
        feat = nn.leaky_relu(feat, 0.2)
        feat = Conv(self.embed_dim // 4, 1, padding=0, dtype=self.dtype, name="cab_b")(feat)
        feat = nn.leaky_relu(feat, 0.2)
        return Conv(self.embed_dim, dtype=self.dtype, name="cab_c")(feat)


def pad_input(x: np.ndarray, window_size: int) -> Tuple[np.ndarray, int, int]:
    """Reflect-pad NHWC to window multiples (reference check_image_size,
    network_swinir.py:783-788). Do this OUTSIDE jit; crop the output to
    (H*scale, W*scale)."""
    _, h, w, _ = x.shape
    ph = (window_size - h % window_size) % window_size
    pw = (window_size - w % window_size) % window_size
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, h, w


def fused_block_params(params):
    """Adapt a standard SwinIR param tree (norm1/{scale,bias}, fc1/{kernel,
    bias}, …) to the fuse_block=True layout (norm1_scale, fc1_kernel, …).
    Pure tree rewrite — use after checkpoint conversion for fused
    inference."""
    def walk(p):
        if not isinstance(p, dict):
            return p
        if "norm1" in p and "fc1" in p and "qkv_kernel" in p:
            q = {k: v for k, v in p.items()
                 if k not in ("norm1", "norm2", "fc1", "fc2")}
            q["norm1_scale"] = p["norm1"]["scale"]
            q["norm1_bias"] = p["norm1"]["bias"]
            q["norm2_scale"] = p["norm2"]["scale"]
            q["norm2_bias"] = p["norm2"]["bias"]
            q["fc1_kernel"] = p["fc1"]["kernel"]
            q["fc1_bias"] = p["fc1"]["bias"]
            q["fc2_kernel"] = p["fc2"]["kernel"]
            q["fc2_bias"] = p["fc2"]["bias"]
            return q
        return {k: walk(v) for k, v in p.items()}

    return walk(params)
