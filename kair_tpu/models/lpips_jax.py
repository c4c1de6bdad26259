"""LPIPS perceptual metric (reference usage: utils_image.py:784-827
`calculate_lpips` with the `lpips` package's AlexNet-linear model; fork eval
model_base.py:280-569 uses global + repeat-sampled local LPIPS).

Native implementation: AlexNet feature trunk → per-layer unit-normalised
differences → learned 1×1 linear heads → spatial mean → sum. Weights
convert from the official `lpips` package checkpoint (alex.pth +
torchvision alexnet features) via `convert_lpips_alex`; this environment
has no network access, so construction REQUIRES a local weights file —
LPIPS with random weights is meaningless and is refused.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision AlexNet features: (out_ch, kernel, stride, padding) convs with
# ReLU after each; maxpool(3,2) after convs 0, 1, 4
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


class AlexFeatures(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            outs.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return outs


class LPIPSAlex(nn.Module):
    """lpips.LPIPS(net='alex') equivalent. Inputs NHWC RGB in [-1, 1]."""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray([-0.030, -0.088, -0.188], x0.dtype)
        scale = jnp.asarray([0.458, 0.448, 0.450], x0.dtype)
        f = AlexFeatures(dtype=self.dtype, name="net")
        feats0 = f((x0 - shift) / scale)
        feats1 = f((x1 - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(feats0, feats1)):
            # lpips normalize_tensor: x / (sqrt(sum x²) + 1e-10) — match
            # its eps placement exactly for converted-weight parity
            a = a / (jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True)) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1], 1))
            # lpips lin heads are 1x1 convs with non-negative weights
            d = diff @ jnp.maximum(w, 0.0).astype(diff.dtype)
            total = total + jnp.mean(d, axis=(1, 2))
        return total[:, 0]


def convert_lpips_alex(alexnet_sd: Dict[str, np.ndarray],
                       lpips_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Build params from torchvision alexnet state dict (features.N.weight)
    + lpips alex.pth (lin{i}.model.1.weight, shape (1, C, 1, 1))."""
    from kair_tpu.ckpt.torch_convert import t_conv

    feat_idx = [0, 3, 6, 8, 10]  # conv positions in torchvision features
    net = {}
    for i, t in enumerate(feat_idx):
        net[f"conv{i}"] = {
            "kernel": t_conv(alexnet_sd[f"features.{t}.weight"]),
            "bias": alexnet_sd[f"features.{t}.bias"]}
    params: Dict[str, Any] = {"net": net}
    for i in range(5):
        w = lpips_sd[f"lin{i}.model.1.weight"]
        params[f"lin{i}"] = np.ascontiguousarray(w[:, :, 0, 0].T)
    return {"params": params}


def load_lpips(alexnet_path: Optional[str] = None,
               lpips_path: Optional[str] = None):
    """(model, variables) or raise if weights unavailable (zero-egress env)."""
    import os

    if not (alexnet_path and lpips_path and os.path.exists(alexnet_path)
            and os.path.exists(lpips_path)):
        raise FileNotFoundError(
            "LPIPS needs local weights: torchvision alexnet .pth and the "
            "lpips package's alex.pth (no network access here). Pass their "
            "paths; refusing random-weight LPIPS.")
    from kair_tpu.ckpt.torch_convert import load_torch_state_dict

    model = LPIPSAlex()
    variables = convert_lpips_alex(load_torch_state_dict(alexnet_path),
                                   load_torch_state_dict(lpips_path))
    return model, variables


def make_lpips_fn(model, variables):
    """`calculate_lpips`-equivalent callable (reference
    utils_image.py:784-827): fn(img1, img2, border=0) on uint8/float RGB
    [0,255] images (HWC; grayscale HW1/HW replicated to 3 channels)."""
    apply_jit = jax.jit(lambda a, b: model.apply(variables, a, b))

    def fn(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
        if img1.shape != img2.shape:
            raise ValueError("Input images must have the same dimensions.")
        h, w = img1.shape[:2]
        img1 = img1[border:h - border or None, border:w - border or None]
        img2 = img2[border:h - border or None, border:w - border or None]

        def prep(im):
            im = im.astype(np.float32) / 255.0
            if im.ndim == 2:
                im = im[:, :, None]
            if im.shape[-1] == 1:
                im = np.repeat(im, 3, axis=-1)
            return jnp.asarray(im[None] * 2.0 - 1.0)

        return float(apply_jit(prep(img1), prep(img2))[0])

    return fn


def load_lpips_default(weights_dir: Optional[str] = None):
    """(model, variables, lpips_fn) from the conventional weights location,
    or None when absent (zero-egress environments).

    Drop the two files in ``$KAIR_LPIPS_DIR`` (default
    ``<cwd>/model_zoo/lpips/``):
      alexnet.pth  — torchvision AlexNet IMAGENET1K_V1 state dict
      alex.pth     — the `lpips` package's v0.1 alex linear heads
    and every harness/CLI LPIPS metric starts producing real numbers."""
    import os

    d = weights_dir or os.environ.get("KAIR_LPIPS_DIR") \
        or os.path.join(os.getcwd(), "model_zoo", "lpips")
    alex_path = os.path.join(d, "alexnet.pth")
    lin_path = os.path.join(d, "alex.pth")
    if not (os.path.exists(alex_path) and os.path.exists(lin_path)):
        return None
    model, variables = load_lpips(alex_path, lin_path)
    return model, variables, make_lpips_fn(model, variables)
