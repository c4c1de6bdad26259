"""Reusable network blocks (flax.linen, NHWC, TPU-first).

Provides the same block vocabulary as the reference `models/basicblock.py`
(591 LoC): the mode-string conv factory (`basicblock.py:61-101`), pixel
(un)shuffle (`:104-152`), ResBlock (`:211`), IMDN blocks (IMDB `:230`,
ESA `:271`, CFRB `:298`), channel attention (CALayer `:333`, RCABlock
`:354`, RCAGroup `:373`), residual-dense blocks (`:393,416`), up/down
samplers (`:446-540`) and NonLocalBlock (`:543`).

Design notes (TPU-native, not a translation):

* layout is **NHWC** (XLA's preferred conv layout on TPU); channel counts
  stay multiples of 64/128 in all the shipped configs so convs tile onto
  the MXU cleanly.
* modules carry a `dtype` for compute precision — bf16 by default in
  training, fp32 for checkpoint-parity eval. Params are always fp32.
* activations/bias-adds are plain jnp expressions — XLA fuses them into
  the convs (this is why the reference's `fused_bias_act` CUDA op needs
  no kernel here, SURVEY.md §2.3).
* pixel (un)shuffle uses the same channel ordering as torch so converted
  checkpoints match bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


# ----------------------------------------------------------------------------
# pixel shuffle / unshuffle with torch channel ordering
# ----------------------------------------------------------------------------

def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel order:
    input channel index co*r² + i*r + j → output (co, h*r+i, w*r+j)."""
    n, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(n, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, co
    return x.reshape(n, h * r, w * r, co)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle`; matches the reference FFDNet
    ordering (basicblock.py:104-127): out channel = c*r² + i*r + j."""
    n, h, w, c = x.shape
    ho, wo = h // r, w // r
    x = x.reshape(n, ho, r, wo, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, ho, wo, c, i, j
    return x.reshape(n, ho, wo, c * r * r)


def upsample_nearest(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.Upsample(mode='nearest') equivalent: out[i]=in[i//r]."""
    return jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    (half-pixel centers — jax.image.resize 'linear' semantics)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear")


# ----------------------------------------------------------------------------
# conv / conv-transpose with torch-compatible geometry
# ----------------------------------------------------------------------------

class _RawConvParams(nn.Module):
    """Declares nn.Conv's param tree (kernel/bias, same names, shapes and
    initializers) WITHOUT running the conv — lets a fused Pallas path own
    the compute while staying checkpoint- and init-identical to nn.Conv."""
    kernel_shape: Tuple[int, int, int, int]
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Conv(nn.Module):
    """2-D conv, NHWC, explicit symmetric padding like torch Conv2d.

    `residual`/`phase`: fused tail mode — computes
    conv(jnp.roll(x, (phase, phase), (1, 2))) + residual, routed through
    the Pallas strip kernel (ops/pallas/conv_block.py) when the geometry
    allows; same param tree either way."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dilation: int = 1
    feature_group_count: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, phase: int = 0):
        fused_ok = (residual is not None and self.kernel_size == 3
                    and self.stride == 1 and self.padding == 1
                    and self.dilation == 1 and self.feature_group_count == 1
                    and self.use_bias and x.shape[-1] == self.features)
        if fused_ok:
            from kair_tpu.ops.pallas.conv_block import conv3x3_residual
            c = x.shape[-1]
            kern, bias = _RawConvParams((3, 3, c, self.features),
                                        self.features, name="conv")()
            if self.dtype is not None:
                x = x.astype(self.dtype)
                residual = residual.astype(self.dtype)
            return conv3x3_residual(x, residual, kern, bias, phase=phase)
        assert residual is None and phase == 0, \
            "fused residual mode needs k=3/s=1/p=1/d=1/groups=1 and C_in==C_out"
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvT(nn.Module):
    """2-D transposed conv matching torch ConvTranspose2d geometry:
    out = (in-1)*stride - 2*padding + kernel."""
    features: int
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features))
        # torch ConvTranspose == conv with lhs dilation `s`, kernel flipped,
        # padding (k-1-p) on both sides.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype or kernel.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm matching torch BatchNorm2d(momentum=0.9, eps=1e-4) as the
    reference conv factory configures it (basicblock.py:69)."""
    use_running_average: bool = True
    momentum: float = 0.1  # flax convention: new = m*old + (1-m)*batch
    eps: float = 1e-4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )(x)


# ----------------------------------------------------------------------------
# mode-string conv factory (reference: basicblock.py:61-101)
# ----------------------------------------------------------------------------

class ConvBlock(nn.Module):
    """Composable Conv/BN/activation/resample stack keyed by a mode string.

    Mode chars (same vocabulary as the reference factory):
      C conv | T conv-transpose | B batchnorm | I instancenorm |
      R/r relu | L/l leaky-relu(negative_slope) | S softplus? (unused) |
      2/3/4 pixel-shuffle | U/u/v nearest-upsample x2/3/4 |
      M maxpool | A avgpool
    """
    out_channels: int = 64
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    bias: bool = True
    mode: str = "CBR"
    negative_slope: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        idx = 0
        for t in self.mode:
            if t == "C":
                x = Conv(self.out_channels, self.kernel_size, self.stride,
                         self.padding, self.bias, dtype=self.dtype,
                         name=f"m{idx:02d}")(x)
            elif t == "T":
                x = ConvT(self.out_channels, self.kernel_size, self.stride,
                          self.padding, self.bias, dtype=self.dtype,
                          name=f"m{idx:02d}")(x)
            elif t == "B":
                x = BatchNorm(dtype=self.dtype, name=f"m{idx:02d}")(x, train=train)
            elif t == "I":
                x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                                 dtype=self.dtype, name=f"m{idx:02d}")(x)
            elif t in ("R", "r"):
                x = nn.relu(x)
            elif t in ("L", "l"):
                x = nn.leaky_relu(x, self.negative_slope)
            elif t in ("2", "3", "4"):
                x = pixel_shuffle(x, int(t))
            elif t == "U":
                x = upsample_nearest(x, 2)
            elif t == "u":
                x = upsample_nearest(x, 3)
            elif t == "v":
                x = upsample_nearest(x, 4)
            elif t == "M":
                x = nn.max_pool(x, (self.kernel_size, self.kernel_size),
                                strides=(self.stride, self.stride), padding="VALID")
            elif t == "A":
                x = nn.avg_pool(x, (self.kernel_size, self.kernel_size),
                                strides=(self.stride, self.stride), padding="VALID")
            else:
                raise NotImplementedError(f"Undefined mode char: {t}")
            idx += 1
        return x


# ----------------------------------------------------------------------------
# residual / attention blocks
# ----------------------------------------------------------------------------

class ResBlock(nn.Module):
    """x + conv(act(conv(x))) (reference: basicblock.py:211-224)."""
    channels: int = 64
    kernel_size: int = 3
    mode: str = "CRC"
    negative_slope: float = 0.2
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = ConvBlock(self.channels, self.kernel_size, bias=self.bias,
                        mode=self.mode,
                        negative_slope=self.negative_slope, dtype=self.dtype,
                        name="res")(x, train=train)
        return x + res


class CALayer(nn.Module):
    """Squeeze-excite channel attention (reference: basicblock.py:333-350)."""
    channels: int = 64
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv(self.channels // self.reduction, 1, padding=0,
                 dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = Conv(self.channels, 1, padding=0, dtype=self.dtype, name="fc2")(y)
        return x * nn.sigmoid(y)


class RCABlock(nn.Module):
    """Residual channel-attention block (reference: basicblock.py:354-369)."""
    channels: int = 64
    reduction: int = 16
    mode: str = "CRC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = ConvBlock(self.channels, mode=self.mode, dtype=self.dtype,
                        name="res")(x, train=train)
        res = CALayer(self.channels, self.reduction, dtype=self.dtype,
                      name="ca")(res)
        return res + x


class RCAGroup(nn.Module):
    """nb RCABlocks + conv, residual (reference: basicblock.py:373-390)."""
    channels: int = 64
    reduction: int = 16
    nb: int = 12
    mode: str = "CRC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        for i in range(self.nb):
            res = RCABlock(self.channels, self.reduction, self.mode,
                           dtype=self.dtype, name=f"b{i:02d}")(res, train=train)
        res = Conv(self.channels, dtype=self.dtype, name="tail")(res)
        return res + x


class ResidualDenseBlock5C(nn.Module):
    """5-conv dense block, 0.2-scaled residual (reference: basicblock.py:393-412)."""
    nc: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, 0.2)
        x1 = act(Conv(self.gc, dtype=self.dtype, name="conv1")(x))
        x2 = act(Conv(self.gc, dtype=self.dtype, name="conv2")(jnp.concatenate([x, x1], -1)))
        x3 = act(Conv(self.gc, dtype=self.dtype, name="conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = act(Conv(self.gc, dtype=self.dtype, name="conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = Conv(self.nc, dtype=self.dtype, name="conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference: basicblock.py:416-431)."""
    nc: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nc, self.gc, dtype=self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock5C(self.nc, self.gc, dtype=self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock5C(self.nc, self.gc, dtype=self.dtype, name="rdb3")(out)
        return out * 0.2 + x


# ----------------------------------------------------------------------------
# IMDN blocks
# ----------------------------------------------------------------------------

class IMDBlock(nn.Module):
    """Information multi-distillation block (reference: basicblock.py:230-265)."""
    channels: int = 64
    d_rate: float = 0.25
    negative_slope: float = 0.05
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d_nc = int(self.channels * self.d_rate)
        act = lambda v: nn.leaky_relu(v, self.negative_slope)
        c1 = act(Conv(self.channels, dtype=self.dtype, name="conv1")(x))
        d1, r1 = c1[..., :d_nc], c1[..., d_nc:]
        c2 = act(Conv(self.channels, dtype=self.dtype, name="conv2")(r1))
        d2, r2 = c2[..., :d_nc], c2[..., d_nc:]
        c3 = act(Conv(self.channels, dtype=self.dtype, name="conv3")(r2))
        d3, r3 = c3[..., :d_nc], c3[..., d_nc:]
        d4 = Conv(d_nc, dtype=self.dtype, name="conv4")(r3)
        res = Conv(self.channels, 1, padding=0, dtype=self.dtype,
                   name="conv1x1")(jnp.concatenate([d1, d2, d3, d4], -1))
        return x + res


class ESA(nn.Module):
    """Enhanced spatial attention (reference: basicblock.py:271-295)."""
    channels: int = 64
    reduction: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        r_nc = self.channels // self.reduction
        x1 = Conv(r_nc, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        x2 = Conv(r_nc, 3, stride=2, padding=0, dtype=self.dtype, name="conv2")(x1)
        x2 = nn.max_pool(x2, (7, 7), strides=(3, 3), padding="VALID")
        x2 = nn.relu(Conv(r_nc, dtype=self.dtype, name="conv3")(x2))
        x2 = nn.relu(Conv(r_nc, dtype=self.dtype, name="conv4")(x2))
        x2 = Conv(r_nc, dtype=self.dtype, name="conv5")(x2)
        x2 = resize_bilinear(x2, (x.shape[1], x.shape[2]))
        x21 = Conv(r_nc, 1, padding=0, dtype=self.dtype, name="conv21")(x1)
        x2 = Conv(self.channels, 1, padding=0, dtype=self.dtype, name="conv6")(x2 + x21)
        return x * nn.sigmoid(x2)


class CFRB(nn.Module):
    """Concat-feature residual block with ESA (reference: basicblock.py:298-329)."""
    channels: int = 50
    d_rate: float = 0.5
    negative_slope: float = 0.05
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d_nc = int(self.channels * self.d_rate)
        act = lambda v: nn.leaky_relu(v, self.negative_slope)
        d1 = Conv(d_nc, 1, padding=0, dtype=self.dtype, name="conv1_d")(x)
        x = act(Conv(self.channels, dtype=self.dtype, name="conv1_r")(x) + x)
        d2 = Conv(d_nc, 1, padding=0, dtype=self.dtype, name="conv2_d")(x)
        x = act(Conv(self.channels, dtype=self.dtype, name="conv2_r")(x) + x)
        d3 = Conv(d_nc, 1, padding=0, dtype=self.dtype, name="conv3_d")(x)
        x = act(Conv(self.channels, dtype=self.dtype, name="conv3_r")(x) + x)
        x = Conv(d_nc, dtype=self.dtype, name="conv4_d")(x)
        x = act(jnp.concatenate([d1, d2, d3, x], -1))
        x = Conv(self.channels, 1, padding=0, dtype=self.dtype, name="conv1x1")(x)
        return ESA(self.channels, 4, dtype=self.dtype, name="esa")(x)


class NonLocalBlock2D(nn.Module):
    """Embedded-Gaussian non-local block (reference: basicblock.py:543-591)."""
    nc: int = 64
    reduction: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        inter_nc = self.nc // self.reduction
        n, h, w, _ = x.shape
        g = Conv(inter_nc, 1, padding=0, dtype=self.dtype, name="g")(x).reshape(n, h * w, inter_nc)
        theta = Conv(inter_nc, 1, padding=0, dtype=self.dtype, name="theta")(x).reshape(n, h * w, inter_nc)
        phi = Conv(inter_nc, 1, padding=0, dtype=self.dtype, name="phi")(x).reshape(n, h * w, inter_nc)
        attn = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", theta, phi,
                       preferred_element_type=jnp.float32), axis=-1).astype(g.dtype)
        y = jnp.einsum("nqk,nkc->nqc", attn, g).reshape(n, h, w, inter_nc)
        y = Conv(self.nc, 1, padding=0, dtype=self.dtype, name="w")(y)
        return x + y


# ----------------------------------------------------------------------------
# up/down sampler heads (reference: basicblock.py:446-540)
# ----------------------------------------------------------------------------

class UpsamplePixelShuffle(nn.Module):
    """conv -> pixelshuffle (+act) (reference: basicblock.py:446-452)."""
    out_channels: int = 3
    scale: int = 2
    mode: str = ""  # trailing act chars, e.g. 'R'
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBlock(self.out_channels * self.scale ** 2,
                         mode="C" + str(self.scale) + self.mode,
                         bias=self.bias,
                         dtype=self.dtype, name="up")(x, train=train)


class UpsampleUpConv(nn.Module):
    """nearest-upsample -> conv (+act) (reference: basicblock.py:455-467)."""
    out_channels: int = 3
    scale: int = 2
    mode: str = ""
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        uc = {2: "U", 3: "u", 4: "v"}[self.scale]
        return ConvBlock(self.out_channels, mode=uc + "C" + self.mode,
                         bias=self.bias,
                         dtype=self.dtype, name="up")(x, train=train)


class UpsampleConvTranspose(nn.Module):
    """transpose-conv upsampler (reference: basicblock.py:471-481,
    kernel_size=2, stride=scale adjusted per scale)."""
    out_channels: int = 3
    scale: int = 2
    mode: str = ""
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBlock(self.out_channels, kernel_size=self.scale,
                         stride=self.scale, padding=0, bias=self.bias,
                         mode="T" + self.mode, dtype=self.dtype,
                         name="up")(x, train=train)


class DownsampleStrideConv(nn.Module):
    """strided-conv downsampler (reference: basicblock.py:495-505)."""
    out_channels: int = 64
    scale: int = 2
    mode: str = ""
    bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBlock(self.out_channels, kernel_size=self.scale,
                         stride=self.scale, padding=0, bias=self.bias,
                         mode="C" + self.mode, dtype=self.dtype,
                         name="down")(x, train=train)


class DownsampleMaxPool(nn.Module):
    """maxpool -> conv (reference: basicblock.py:507-517)."""
    out_channels: int = 64
    scale: int = 2
    mode: str = ""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (self.scale, self.scale),
                        strides=(self.scale, self.scale), padding="VALID")
        return ConvBlock(self.out_channels, mode="C" + self.mode,
                         dtype=self.dtype, name="down")(x, train=train)


class DownsampleAvgPool(nn.Module):
    """avgpool -> conv (reference: basicblock.py:520-530)."""
    out_channels: int = 64
    scale: int = 2
    mode: str = ""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (self.scale, self.scale),
                        strides=(self.scale, self.scale), padding="VALID")
        return ConvBlock(self.out_channels, mode="C" + self.mode,
                         dtype=self.dtype, name="down")(x, train=train)
