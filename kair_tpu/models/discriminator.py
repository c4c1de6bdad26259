"""Discriminators for GAN training
(reference: models/network_discriminator.py:22-300).

Spectral normalisation is a power-iteration estimate of the largest
singular value with the iteration vector kept in a mutable 'spectral'
collection (the analog of torch's buffer inside spectral_norm); one
iteration per training step, frozen at eval — same contract as torch.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import resize_bilinear


class SNConv(nn.Module):
    """Conv2d with optional spectral normalisation."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    spectral: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.normal(0.02),
                            (k, k, x.shape[-1], self.features))
        w = kernel
        if self.spectral:
            mat = kernel.reshape(-1, self.features)
            u = self.variable("spectral", "u",
                              lambda: jax.random.normal(
                                  jax.random.PRNGKey(0), (self.features,)))
            u_val = u.value
            v = mat @ u_val
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = mat.T @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = v @ (mat @ u_new)
            if train and not self.is_initializing():
                u.value = jax.lax.stop_gradient(u_new)
            w = kernel / jax.lax.stop_gradient(sigma)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype), w.astype(self.dtype or w.dtype),
            (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SNDense(nn.Module):
    features: int
    spectral: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = self.param("kernel", nn.initializers.normal(0.02),
                            (x.shape[-1], self.features))
        w = kernel
        if self.spectral:
            u = self.variable("spectral", "u",
                              lambda: jax.random.normal(
                                  jax.random.PRNGKey(0), (self.features,)))
            v = kernel @ u.value
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = kernel.T @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = v @ (kernel @ u_new)
            if train and not self.is_initializing():
                u.value = jax.lax.stop_gradient(u_new)
            w = kernel / jax.lax.stop_gradient(sigma)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class PatchGAN(nn.Module):
    """70×70 PatchGAN (reference network_discriminator.py:22-87):
    k4s2p2 stride convs with spectral/batch/instance norm options."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "spectral"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        sn = "spectral" in self.norm_type
        act = lambda v: nn.leaky_relu(v, 0.2)

        def norm(v, name):
            if "batch" in self.norm_type:
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name=name)(v)
            if "instance" in self.norm_type:
                mean = v.mean(axis=(1, 2), keepdims=True)
                var = v.var(axis=(1, 2), keepdims=True)
                return (v - mean) * jax.lax.rsqrt(var + 1e-5)
            return v

        x = act(SNConv(self.ndf, 4, 2, 2, spectral=sn, dtype=self.dtype,
                       name="conv0")(x, train=train))
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = SNConv(nf, 4, 2, 2, spectral=sn, dtype=self.dtype,
                       name=f"conv{n}")(x, train=train)
            x = act(norm(x, f"norm{n}"))
        nf = min(nf * 2, 512)
        x = SNConv(nf, 4, 1, 2, spectral=sn, dtype=self.dtype,
                   name=f"conv{self.n_layers}")(x, train=train)
        x = act(norm(x, f"norm{self.n_layers}"))
        return SNConv(1, 4, 1, 2, spectral=sn, dtype=self.dtype,
                      name="conv_out")(x, train=train)


class UNetDiscriminator(nn.Module):
    """U-Net discriminator with SN (reference network_discriminator.py:89-140)."""
    input_nc: int = 3
    ndf: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: nn.leaky_relu(v, 0.2)
        d = self.dtype
        x0 = act(SNConv(self.ndf, 3, 1, 1, spectral=False, dtype=d, name="conv0")(x, train=train))
        x1 = act(SNConv(self.ndf * 2, 4, 2, 1, use_bias=False, dtype=d, name="conv1")(x0, train=train))
        x2 = act(SNConv(self.ndf * 4, 4, 2, 1, use_bias=False, dtype=d, name="conv2")(x1, train=train))
        x3 = act(SNConv(self.ndf * 8, 4, 2, 1, use_bias=False, dtype=d, name="conv3")(x2, train=train))
        x3 = resize_bilinear(x3, (x3.shape[1] * 2, x3.shape[2] * 2))
        x4 = act(SNConv(self.ndf * 4, 3, 1, 1, use_bias=False, dtype=d, name="conv4")(x3, train=train))
        x4 = resize_bilinear(x4 + x2, (x4.shape[1] * 2, x4.shape[2] * 2))
        x5 = act(SNConv(self.ndf * 2, 3, 1, 1, use_bias=False, dtype=d, name="conv5")(x4, train=train))
        x5 = resize_bilinear(x5 + x1, (x5.shape[1] * 2, x5.shape[2] * 2))
        x6 = act(SNConv(self.ndf, 3, 1, 1, use_bias=False, dtype=d, name="conv6")(x5, train=train))
        x6 = x6 + x0
        out = act(SNConv(self.ndf, 3, 1, 1, use_bias=False, dtype=d, name="conv7")(x6, train=train))
        out = act(SNConv(self.ndf, 3, 1, 1, use_bias=False, dtype=d, name="conv8")(out, train=train))
        return SNConv(1, 3, 1, 1, spectral=False, dtype=d, name="conv9")(out, train=train)


class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator for 96/128/192 inputs (reference
    network_discriminator.py:144-258); spectral variant when sn=True
    (Discriminator_VGG_128_SN, :263-300)."""
    input_size: int = 128
    in_nc: int = 3
    base_nc: int = 64
    ac_type: str = "BL"  # BN + LeakyReLU
    sn: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: nn.leaky_relu(v, 0.2)
        use_bn = "B" in self.ac_type and not self.sn

        def bn(v, name):
            if not use_bn:
                return v
            return nn.BatchNorm(use_running_average=not train, momentum=0.1,
                                epsilon=1e-4, dtype=self.dtype, name=name)(v)

        nc = self.base_nc
        widths = [nc, nc, nc * 2, nc * 2, nc * 4, nc * 4, nc * 8, nc * 8,
                  nc * 8, nc * 8]
        h = x
        for i, w in enumerate(widths):
            k = 3 if i % 2 == 0 else 4
            s = 1 if i % 2 == 0 else 2
            p = 1
            h = SNConv(w, k, s, p, spectral=self.sn, dtype=self.dtype,
                       name=f"conv{i}")(h, train=train)
            if i > 0:
                h = bn(h, f"bn{i}")
            h = act(h)
        h = h.reshape(h.shape[0], -1)
        h = act(SNDense(100, spectral=self.sn, dtype=self.dtype,
                        name="linear0")(h, train=train))
        return SNDense(1, spectral=self.sn, dtype=self.dtype,
                       name="linear1")(h, train=train)


class VGG128SN(VGGStyleDiscriminator):
    """Discriminator_VGG_128_SN preset (reference :263-300)."""
    input_size: int = 128
    sn: bool = True
    ac_type: str = "L"
