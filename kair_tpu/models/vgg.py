"""VGG19 feature extractor for perceptual loss
(reference: models/loss.py:55-133 VGGFeatureExtractor/PerceptualLoss and
models/network_feature.py).

Runs the torchvision VGG19 `features` stack up to the requested Sequential
indices (default 34 = conv5_4 pre-ReLU; list mode taps [2,7,16,25,34]).
Weights come from a converted torchvision state dict
(`convert_vgg19_features`); in a zero-egress environment load them from a
local .pth — there is no silent fallback, the perceptual loss refuses
random weights unless explicitly allowed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import Conv

# torchvision vgg19.features layout: (sequential_index, out_channels) for
# convs; 'M' = maxpool positions implied after relu indices 4,9,18,27,36
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def vgg19_module_table() -> List[Tuple[int, str, int]]:
    """[(torch Sequential index, kind, channels)] for features modules."""
    table = []
    idx = 0
    for v in _VGG19_CFG:
        if v == "M":
            table.append((idx, "pool", 0))
            idx += 1
        else:
            table.append((idx, "conv", v))
            idx += 1
            table.append((idx, "relu", 0))
            idx += 1
    return table


class VGG19Features(nn.Module):
    """Emit feature maps at the given torch-Sequential indices."""
    feature_layers: Tuple[int, ...] = (34,)
    use_input_norm: bool = True
    use_range_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.use_range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std
        outputs = []
        max_layer = max(self.feature_layers)
        for idx, kind, ch in vgg19_module_table():
            if idx > max_layer:
                break
            if kind == "conv":
                x = Conv(ch, 3, 1, 1, dtype=self.dtype, name=f"conv{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx in self.feature_layers:
                outputs.append(x)
        return outputs if len(outputs) > 1 else outputs[0]


def convert_vgg19_features(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision vgg19 state dict (features.N.weight OIHW) → params."""
    from kair_tpu.ckpt.torch_convert import conv_leaf

    sd = {k.replace("features.", ""): v for k, v in sd.items()
          if k.startswith("features.")}
    params = {}
    for idx, kind, _ in vgg19_module_table():
        if kind == "conv" and f"{idx}.weight" in sd:
            params[f"conv{idx}"] = {"conv": conv_leaf(sd, str(idx))}
    return {"params": params}
