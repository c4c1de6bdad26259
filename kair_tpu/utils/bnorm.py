"""BatchNorm folding into preceding convs (reference: utils/utils_bnorm.py:32-91).

Functional: given a params/batch_stats pytree in our ConvBlock layout
(Conv 'mNN/conv' followed by BatchNorm 'mMM/bn'), return new params with
the BN absorbed — w' = w·γ/√(σ²+ε), b' = (b−μ)·γ/√(σ²+ε)+β — and the BN
entries removed. This is how BN-trained DnCNN checkpoints become the
released act_mode='R' form (main_test_dncnn.py:118-121)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def merge_conv_bn(conv: Dict[str, np.ndarray], bn_p: Dict[str, np.ndarray],
                  bn_s: Dict[str, np.ndarray], eps: float = 1e-4):
    """Fold one BN (scale/bias + mean/var) into one HWIO conv."""
    w = np.asarray(conv["kernel"], np.float64)
    b = np.asarray(conv.get("bias", np.zeros(w.shape[-1])), np.float64)
    invstd = 1.0 / np.sqrt(np.asarray(bn_s["var"], np.float64) + eps)
    gamma = np.asarray(bn_p["scale"], np.float64)
    beta = np.asarray(bn_p["bias"], np.float64)
    mean = np.asarray(bn_s["mean"], np.float64)
    w = w * (invstd * gamma)            # broadcast over output channels
    b = (b - mean) * invstd * gamma + beta
    return {"kernel": w.astype(np.float32), "bias": b.astype(np.float32)}


def merge_bn_convblocks(params: Dict[str, Any], batch_stats: Dict[str, Any],
                        eps: float = 1e-4) -> Dict[str, Any]:
    """Walk a params tree, folding every ``mNN``(conv) + ``m(NN+1)``(bn)
    pair produced by ConvBlock('..CB..') into a single conv."""
    def walk(p, s):
        if not isinstance(p, dict):
            return p
        out = {}
        keys = sorted(p.keys())
        skip = set()
        for k in keys:
            if k in skip:
                continue
            v = p[k]
            # detect mNN conv followed by mMM bn
            if (isinstance(v, dict) and "conv" in v and k.startswith("m")
                    and k[1:].isdigit()):
                nxt = f"m{int(k[1:]) + 1:02d}"
                if (nxt in p and isinstance(p[nxt], dict) and "bn" in p[nxt]
                        and s and nxt in s and "bn" in s[nxt]):
                    out[k] = {"conv": merge_conv_bn(
                        v["conv"], p[nxt]["bn"], s[nxt]["bn"], eps)}
                    skip.add(nxt)
                    continue
            out[k] = walk(v, s.get(k) if isinstance(s, dict) else None)
        return out

    return walk(params, batch_stats or {})
