"""torch ``.pth`` → JAX param-tree converters for the released model zoos.

PSNR parity against released checkpoints is the acceptance criterion
(SURVEY.md §4.1), so every supported architecture gets an explicit,
auditable key mapping from the torch state dict to our flax/NHWC params.

Layout conversions:
  conv          OIHW  -> HWIO
  conv-transpose IOHW -> HWIO (our ConvT flips spatially at apply time,
                               so no flip here)
  linear        (out,in) -> (in,out)
  batchnorm     weight/bias/running_mean/running_var -> scale/bias/mean/var

``param_key`` indirection ('params'/'params_ema') follows the reference
loader (model_base.py:201-216, main_test_swinir.py:130-175).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(path: str, param_key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a plain {name: np.ndarray} dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if param_key is not None and param_key in sd:
        sd = sd[param_key]
    elif isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_convT(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight IOHW -> our ConvT kernel (k,k,I,O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def conv_leaf(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_conv(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def convT_leaf(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_convT(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def bn_params(sd: Dict[str, np.ndarray], prefix: str):
    """Returns (params, batch_stats) halves of a torch BatchNorm2d."""
    p = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    s = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
    return p, s


# ----------------------------------------------------------------------------
# DnCNN family (reference: network_dncnn.py; checkpoints: dncnn_25.pth etc.)
# ----------------------------------------------------------------------------

def convert_dncnn(sd: Dict[str, np.ndarray], nb: int = 17,
                  act_mode: str = "R") -> Dict[str, Any]:
    """dncnn_* checkpoints: keys ``model.{i}.weight/bias`` where i steps over
    Sequential slots (conv, act[, bn] interleaved). Works for DnCNN and
    FDnCNN (identical layer naming)."""
    conv_idx = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("model.") and k.endswith(".weight")
         and sd[k].ndim == 4})
    assert len(conv_idx) == nb, f"expected {nb} convs, found {len(conv_idx)}"
    names = (["head"] + [f"body{i:02d}" for i in range(nb - 2)] + ["tail"])
    params: Dict[str, Any] = {}
    for name, ti in zip(names, conv_idx):
        leaf = conv_leaf(sd, f"model.{ti}")
        if name == "tail":
            params[name] = {"conv": leaf}
        else:
            params[name] = {"m00": {"conv": leaf}}
    if "B" in act_mode:
        raise NotImplementedError(
            "BN checkpoints: merge BN first (utils_bnorm semantics) or load "
            "the released merged checkpoints")
    return {"params": params}


def convert_ircnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """IRCNN ``model.{0,2,...,12}`` 7 dilated convs (network_dncnn.py:98-112)."""
    conv_idx = sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")})
    assert len(conv_idx) == 7
    params = {f"conv{i}": conv_leaf(sd, f"model.{t}") for i, t in enumerate(conv_idx)}
    return {"params": params}


# ----------------------------------------------------------------------------
# FFDNet (reference: network_ffdnet.py:27-69)
# ----------------------------------------------------------------------------

def convert_ffdnet(sd: Dict[str, np.ndarray], nb: int = 15) -> Dict[str, Any]:
    conv_idx = sorted(
        {int(k.split(".")[1]) for k in sd
         if k.startswith("model.") and k.endswith(".weight") and sd[k].ndim == 4})
    assert len(conv_idx) == nb
    names = (["head"] + [f"body{i:02d}" for i in range(nb - 2)] + ["tail"])
    params: Dict[str, Any] = {}
    for name, ti in zip(names, conv_idx):
        leaf = conv_leaf(sd, f"model.{ti}")
        if name == "tail":
            params[name] = {"conv": leaf}
        else:
            params[name] = {"m00": {"conv": leaf}}
    return {"params": params}
