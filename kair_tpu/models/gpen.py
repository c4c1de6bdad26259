"""GPEN blind face restoration — StyleGAN2 generator with a GAN-prior
encoder (reference: models/network_faceenhancer.py:23-687; paper "GAN Prior
Embedded Network for Blind Face Restoration in the Wild").

NHWC; the reference's CUDA fused_bias_act / upfirdn2d become plain XLA ops
(kair_tpu.ops.stylegan). `isconcat=True` (reference :20-21): noise
injection CONCATENATES noise features, doubling channels (sss = 2).

The per-sample modulated convolution is expressed as a vmapped conv over
the batch — XLA batches the grouped convolutions exactly like the
reference's groups=batch trick (network_faceenhancer.py:243-285).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.stylegan import blur, fused_leaky_relu, make_kernel, upfirdn2d

SSS = 2  # isconcat=True channel multiplier (reference :20-21)


def pixel_norm(x):
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + 1e-8)


class EqualLinear(nn.Module):
    """Equalised-lr linear (reference :141-173)."""
    out_dim: int
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param("weight",
                            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
                            (in_dim, self.out_dim))
        bias = self.param("bias",
                          lambda k, s: jnp.full(s, self.bias_init),
                          (self.out_dim,))
        scale = (1 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (weight * scale).astype(x.dtype)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, bias * self.lr_mul)
        return out + (bias * self.lr_mul).astype(x.dtype)


class EqualConv(nn.Module):
    """Equalised-lr conv (reference EqualConv2d :103-138)."""
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel_size
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, c, self.out_channel))
        scale = 1 / math.sqrt(c * k ** 2)
        y = jax.lax.conv_general_dilated(
            x, (weight * scale).astype(x.dtype),
            (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            y = y + b.astype(y.dtype)
        return y


class ModulatedConv(nn.Module):
    """Style-modulated (de)conv (reference ModulatedConv2d :188-285)."""
    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, style):
        b, h, w, c = x.shape
        k = self.kernel_size
        fan_in = c * k ** 2
        scale = 1 / math.sqrt(fan_in)

        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, c, self.out_channel))
        s = EqualLinear(c, bias_init=1.0, dtype=self.dtype,
                        name="modulation")(style)           # (B, C)
        # per-sample modulated kernels (B, k, k, C, O)
        wmod = scale * weight[None] * s[:, None, None, :, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(wmod ** 2, axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * demod[:, None, None, None, :]
        wmod = wmod.astype(x.dtype)

        if self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1

            def convT(xi, wi):
                # torch conv_transpose2d(stride=2, padding=0)
                return jax.lax.conv_general_dilated(
                    xi[None], jnp.flip(wi, (0, 1)),
                    window_strides=(1, 1),
                    padding=((k - 1, k - 1), (k - 1, k - 1)),
                    lhs_dilation=(factor, factor),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

            out = jax.vmap(convT)(x, wmod)
            out = blur(out, self.blur_kernel, (pad0, pad1),
                       upsample_factor=factor)
        elif self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            x = blur(x, self.blur_kernel, ((p + 1) // 2, p // 2))

            def conv_s2(xi, wi):
                return jax.lax.conv_general_dilated(
                    xi[None], wi, (2, 2), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

            out = jax.vmap(conv_s2)(x, wmod)
        else:
            pad = k // 2

            def conv(xi, wi):
                return jax.lax.conv_general_dilated(
                    xi[None], wi, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

            out = jax.vmap(conv)(x, wmod)
        return out


class StyledConv(nn.Module):
    """ModulatedConv + concat-noise injection + FusedLeakyReLU
    (reference :287-356; isconcat noise at :293-306)."""
    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    demodulate: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, style, noise):
        out = ModulatedConv(self.out_channel, self.kernel_size,
                            self.demodulate, self.upsample,
                            blur_kernel=self.blur_kernel, dtype=self.dtype,
                            name="conv")(x, style)
        nweight = self.param("noise_weight", nn.initializers.zeros, (1,))
        out = jnp.concatenate([out, nweight.astype(out.dtype) * noise], axis=-1)
        bias = self.param("act_bias", nn.initializers.zeros,
                          (self.out_channel * SSS,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """reference :358-377."""
    upsample: bool = True
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(3, 1, demodulate=False, dtype=self.dtype,
                            name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            from kair_tpu.ops.stylegan import upsample2
            skip = upsample2(skip, self.blur_kernel)
            out = out + skip
        return out


_CHANNELS = lambda m: {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * m,
                       128: 128 * m, 256: 64 * m, 512: 32 * m, 1024: 16 * m}


class StyleGANGenerator(nn.Module):
    """StyleGAN2 synthesis + style MLP (reference Generator :379-555)."""
    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, style, noise: List[jnp.ndarray],
                 input_is_latent: bool = False):
        channels = _CHANNELS(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        n_latent = log_size * 2 - 2

        if not input_is_latent:
            w = pixel_norm(style)
            for i in range(self.n_mlp):
                w = EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                activation="fused_lrelu", dtype=self.dtype,
                                name=f"style{i}")(w)
        else:
            w = style
        latent = jnp.repeat(w[:, None, :], n_latent, axis=1)

        const = self.param("const_input", nn.initializers.normal(1.0),
                           (1, 4, 4, channels[4]))
        out = jnp.broadcast_to(const, (style.shape[0],) + const.shape[1:]
                               ).astype(self.dtype or jnp.float32)
        out = StyledConv(channels[4], 3, blur_kernel=self.blur_kernel,
                         dtype=self.dtype, name="conv1")(
            out, latent[:, 0], noise[0])
        skip = ToRGB(upsample=False, dtype=self.dtype,
                     name="to_rgb1")(out, latent[:, 1])

        i = 1
        noise_i = 1
        for li, res in enumerate(range(3, log_size + 1)):
            out_ch = channels[2 ** res]
            out = StyledConv(out_ch, 3, upsample=True,
                             blur_kernel=self.blur_kernel, dtype=self.dtype,
                             name=f"conv_up{li}")(
                out, latent[:, i], noise[(noise_i + 1) // 2])
            out = StyledConv(out_ch, 3, blur_kernel=self.blur_kernel,
                             dtype=self.dtype, name=f"conv_same{li}")(
                out, latent[:, i + 1], noise[(noise_i + 2) // 2])
            skip = ToRGB(dtype=self.dtype, name=f"to_rgbs{li}")(
                out, latent[:, i + 2], skip)
            i += 2
            noise_i += 2
        return skip


class ConvLayer(nn.Module):
    """Equal conv (+blur downsample) + fused act (reference :557-603)."""
    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            x = blur(x, self.blur_kernel, ((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv(self.out_channel, self.kernel_size, stride, padding,
                      use_bias=self.use_bias and not self.activate,
                      dtype=self.dtype, name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros,
                                  (self.out_channel,))
                x = fused_leaky_relu(x, bias)
            else:
                x = jax.nn.leaky_relu(x, 0.2) * math.sqrt(2)
        return x


class FullGenerator(nn.Module):
    """GPEN: encoder pyramid → style latent; encoder features become the
    concat-noise of the synthesis network (reference :630-687)."""
    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        channels = _CHANNELS(self.channel_multiplier)
        log_size = int(math.log2(self.size))

        noise = []
        feat = ConvLayer(channels[self.size], 1, dtype=self.dtype,
                         name="ecd0")(x)
        noise.append(feat)
        for idx, res in enumerate(range(log_size, 2, -1)):
            out_ch = channels[2 ** (res - 1)]
            feat = ConvLayer(out_ch, 3, downsample=True, dtype=self.dtype,
                             name=f"ecd{idx + 1}")(feat)
            noise.append(feat)
        flat = feat.reshape(feat.shape[0], -1)
        style = EqualLinear(self.style_dim, activation="fused_lrelu",
                            dtype=self.dtype, name="final_linear")(flat)
        # the encoder latent still passes through the style MLP (reference
        # forward :669-687 calls generator with input_is_latent=False)
        image = StyleGANGenerator(
            self.size, self.style_dim, self.n_mlp, self.channel_multiplier,
            self.blur_kernel, self.lr_mlp, dtype=self.dtype,
            name="generator")(style, noise[::-1], input_is_latent=False)
        return image
