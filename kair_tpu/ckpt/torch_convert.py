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


def load_torch_state_dict(path: str, param_key: Optional[str] = None,
                          allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a plain {name: np.ndarray} dict.

    weights_only=True by default: zoo checkpoints come from external URLs
    (cli/download_models.py) and a pickled ``.pth`` can execute arbitrary
    code on load. Plain tensor state dicts load fine under weights_only;
    pass allow_pickle=True only for trusted local files that need it."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except (OSError, EOFError):
        raise                      # missing/corrupt file — not a pickle issue
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} is not a plain-tensor checkpoint (weights_only "
                "load failed). If the file is trusted, retry with "
                "allow_pickle=True — unpickling executes arbitrary "
                "code.") from e
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
    params = {f"conv{i}": {"conv": conv_leaf(sd, f"model.{t}")}
              for i, t in enumerate(conv_idx)}
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


# ----------------------------------------------------------------------------
# SRResNet family (reference: network_msrresnet.py, network_dpsr.py)
# ----------------------------------------------------------------------------

def convert_msrresnet0(sd: Dict[str, np.ndarray], nb: int = 16,
                       upscale: int = 4,
                       upsample_mode: str = "upconv") -> Dict[str, Any]:
    """MSRResNet0 / SRResNet / MSRResNet_prior (DPSR): torch Sequential keys
    ``model.0`` head, ``model.1.sub.{i}.res.{j}`` residual convs,
    ``model.1.sub.{nb}`` trunk conv, then upsampler/hr/tail convs in index
    order (network_msrresnet.py:38-83)."""
    params: Dict[str, Any] = {}
    params["head"] = {"conv": conv_leaf(sd, "model.0")}
    for i in range(nb):
        params[f"body{i:02d}"] = {"res": {
            "m00": {"conv": conv_leaf(sd, f"model.1.sub.{i}.res.0")},
            "m02": {"conv": conv_leaf(sd, f"model.1.sub.{i}.res.2")},
        }}
    params["body_tail"] = {"conv": conv_leaf(sd, f"model.1.sub.{nb}")}

    # remaining top-level conv indices in order: upsamplers, hr, tail
    rest = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("model.") and k.split(".")[1].isdigit()
                   and int(k.split(".")[1]) >= 2 and k.endswith("weight")})
    n_up = 1 if upscale == 3 else int(np.log2(upscale))
    up_conv_pos = {"upconv": "m01", "pixelshuffle": "m00", "convtranspose": "m00"}[upsample_mode]
    for u in range(n_up):
        if upsample_mode == "convtranspose":
            params[f"up{u}"] = {"up": {up_conv_pos: convT_leaf(sd, f"model.{rest[u]}")}}
        else:
            params[f"up{u}"] = {"up": {up_conv_pos: {"conv": conv_leaf(sd, f"model.{rest[u]}")}}}
    params["hr"] = {"m00": {"conv": conv_leaf(sd, f"model.{rest[n_up]}")}}
    params["tail"] = {"m00": {"conv": conv_leaf(sd, f"model.{rest[n_up + 1]}")}}
    return {"params": params}


def convert_msrresnet1(sd: Dict[str, np.ndarray], nb: int = 16,
                       upscale: int = 4) -> Dict[str, Any]:
    """MSRResNet1 (network_msrresnet.py:89-135): named torch modules."""
    params: Dict[str, Any] = {"conv_first": {"conv": conv_leaf(sd, "conv_first")}}
    for i in range(nb):
        params[f"trunk{i:02d}_conv1"] = {"conv": conv_leaf(sd, f"recon_trunk.{i}.conv1")}
        params[f"trunk{i:02d}_conv2"] = {"conv": conv_leaf(sd, f"recon_trunk.{i}.conv2")}
    params["upconv1"] = {"conv": conv_leaf(sd, "upconv1")}
    if upscale == 4:
        params["upconv2"] = {"conv": conv_leaf(sd, "upconv2")}
    params["HRconv"] = {"conv": conv_leaf(sd, "HRconv")}
    params["conv_last"] = {"conv": conv_leaf(sd, "conv_last")}
    return {"params": params}


def convert_srmd(sd: Dict[str, np.ndarray], nb: int = 12) -> Dict[str, Any]:
    """SRMD (network_srmd.py:26-77): plain stack + pixelshuffle tail conv."""
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.endswith(".weight") and sd[k].ndim == 4})
    assert len(conv_idx) == nb, f"expected {nb} convs, found {len(conv_idx)}"
    params: Dict[str, Any] = {"head": {"m00": {"conv": conv_leaf(sd, f"model.{conv_idx[0]}")}}}
    for i, t in enumerate(conv_idx[1:-1]):
        params[f"body{i:02d}"] = {"m00": {"conv": conv_leaf(sd, f"model.{t}")}}
    params["tail"] = {"up": {"m00": {"conv": conv_leaf(sd, f"model.{conv_idx[-1]}")}}}
    return {"params": params}


# ----------------------------------------------------------------------------
# RRDB family (reference: network_rrdb.py, network_rrdbnet.py)
# ----------------------------------------------------------------------------

def _rdb(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {f"conv{j}": {"conv": conv_leaf(sd, f"{prefix}.conv{j}")} for j in range(1, 6)}


def convert_rrdbnet(sd: Dict[str, np.ndarray], nb: int = 23,
                    sf: int = 4) -> Dict[str, Any]:
    """RRDBNet (ESRGAN/BSRGAN style, network_rrdbnet.py:74-104)."""
    params: Dict[str, Any] = {"conv_first": {"conv": conv_leaf(sd, "conv_first")}}
    for i in range(nb):
        params[f"rrdb{i:02d}"] = {
            f"rdb{k}": _rdb(sd, f"RRDB_trunk.{i}.RDB{k}") for k in (1, 2, 3)}
    params["trunk_conv"] = {"conv": conv_leaf(sd, "trunk_conv")}
    params["upconv1"] = {"conv": conv_leaf(sd, "upconv1")}
    if sf == 4:
        params["upconv2"] = {"conv": conv_leaf(sd, "upconv2")}
    params["HRconv"] = {"conv": conv_leaf(sd, "HRconv")}
    params["conv_last"] = {"conv": conv_leaf(sd, "conv_last")}
    return {"params": params}


def convert_rrdbnet_noup(sd: Dict[str, np.ndarray], nb: int = 23) -> Dict[str, Any]:
    """fork RRDBNet_noUp (network_rrdbnet.py:106-125)."""
    params: Dict[str, Any] = {"conv_first": {"conv": conv_leaf(sd, "conv_first")}}
    for i in range(nb):
        params[f"rrdb{i:02d}"] = {
            f"rdb{k}": _rdb(sd, f"RRDB_trunk.{i}.RDB{k}") for k in (1, 2, 3)}
    params["trunk_conv"] = {"conv": conv_leaf(sd, "trunk_conv")}
    params["HRconv"] = {"conv": conv_leaf(sd, "HRconv")}
    params["conv_last"] = {"conv": conv_leaf(sd, "conv_last")}
    return {"params": params}


def convert_rrdb_old(sd: Dict[str, np.ndarray], nb: int = 23,
                     upscale: int = 4,
                     upsample_mode: str = "upconv") -> Dict[str, Any]:
    """old-style RRDB generator (network_rrdb.py:14-54); ESRGAN zoo uses it."""
    params: Dict[str, Any] = {"head": {"conv": conv_leaf(sd, "model.0")}}
    for i in range(nb):
        rdbs = {}
        for k in (1, 2, 3):
            rdbs[f"rdb{k}"] = {
                f"conv{j}": {"conv": conv_leaf(sd, f"model.1.sub.{i}.RDB{k}.conv{j}.0")}
                for j in range(1, 5)}
            rdbs[f"rdb{k}"]["conv5"] = {"conv": conv_leaf(sd, f"model.1.sub.{i}.RDB{k}.conv5")}
        params[f"body{i:02d}"] = rdbs
    params["body_tail"] = {"conv": conv_leaf(sd, f"model.1.sub.{nb}")}
    rest = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("model.") and k.split(".")[1].isdigit()
                   and int(k.split(".")[1]) >= 2 and k.endswith("weight")})
    n_up = 1 if upscale == 3 else int(np.log2(upscale))
    up_conv_pos = {"upconv": "m01", "pixelshuffle": "m00", "convtranspose": "m00"}[upsample_mode]
    for u in range(n_up):
        if upsample_mode == "convtranspose":
            params[f"up{u}"] = {"up": {up_conv_pos: convT_leaf(sd, f"model.{rest[u]}")}}
        else:
            params[f"up{u}"] = {"up": {up_conv_pos: {"conv": conv_leaf(sd, f"model.{rest[u]}")}}}
    params["hr"] = {"m00": {"conv": conv_leaf(sd, f"model.{rest[n_up]}")}}
    params["tail"] = {"m00": {"conv": conv_leaf(sd, f"model.{rest[n_up + 1]}")}}
    return {"params": params}


# ----------------------------------------------------------------------------
# IMDN (reference: network_imdn.py:33-66)
# ----------------------------------------------------------------------------

def convert_imdn(sd: Dict[str, np.ndarray], nb: int = 8) -> Dict[str, Any]:
    params: Dict[str, Any] = {"head": {"conv": conv_leaf(sd, "model.0")}}
    for i in range(nb):
        p = f"model.1.sub.{i}"
        params[f"body{i:02d}"] = {
            "conv1": {"conv": conv_leaf(sd, f"{p}.conv1.0")},
            "conv2": {"conv": conv_leaf(sd, f"{p}.conv2.0")},
            "conv3": {"conv": conv_leaf(sd, f"{p}.conv3.0")},
            "conv4": {"conv": conv_leaf(sd, f"{p}.conv4")},
            "conv1x1": {"conv": conv_leaf(sd, f"{p}.conv1x1")},
        }
    params["body_tail"] = {"conv": conv_leaf(sd, f"model.1.sub.{nb}")}
    params["tail"] = {"up": {"m00": {"conv": conv_leaf(sd, "model.2")}}}
    return {"params": params}


# ----------------------------------------------------------------------------
# DRUNet / UNetRes (reference: network_unet.py:21-87)
# ----------------------------------------------------------------------------

def convert_unetres(sd: Dict[str, np.ndarray], nb: int = 4) -> Dict[str, Any]:
    """default strideconv/convtranspose configuration (the released DRUNet)."""
    params: Dict[str, Any] = {"head": {"conv": conv_leaf(sd, "m_head")}}

    def res_blocks(tprefix, oprefix, start=0):
        for i in range(nb):
            params[f"{oprefix}_b{i:02d}"] = {"res": {
                "m00": {"conv": conv_leaf(sd, f"{tprefix}.{start + i}.res.0")},
                "m02": {"conv": conv_leaf(sd, f"{tprefix}.{start + i}.res.2")},
            }}

    for d in (1, 2, 3):
        res_blocks(f"m_down{d}", f"down{d}")
        params[f"down{d}_pool"] = {"down": {"m00": {"conv": conv_leaf(sd, f"m_down{d}.{nb}")}}}
    res_blocks("m_body", "body")
    for u in (3, 2, 1):
        params[f"up{u}_up"] = {"up": {"m00": convT_leaf(sd, f"m_up{u}.0")}}
        res_blocks(f"m_up{u}", f"up{u}", start=1)
    params["tail"] = {"conv": conv_leaf(sd, "m_tail")}
    return {"params": params}


# ----------------------------------------------------------------------------
# USRNet (reference: network_usrnet_v1.py:226-280; zoo: usrnet.pth/usrgan.pth)
# ----------------------------------------------------------------------------

def convert_usrnet(sd: Dict[str, np.ndarray], n_iter: int = 8,
                   nb: int = 2) -> Dict[str, Any]:
    """HyPaNet 1x1 MLP (``h.mlp.{0,2,4}``) + bias-free ResUNet prior
    (``p.*``, UNetRes layout)."""
    p_sd = {k[2:]: v for k, v in sd.items() if k.startswith("p.")}
    prior = convert_unetres(p_sd, nb=nb)["params"]
    params: Dict[str, Any] = {"p": prior}
    params["h"] = {
        "fc1": {"conv": conv_leaf(sd, "h.mlp.0")},
        "fc2": {"conv": conv_leaf(sd, "h.mlp.2")},
        "fc3": {"conv": conv_leaf(sd, "h.mlp.4")},
    }
    return {"params": params}


# ----------------------------------------------------------------------------
# SwinIR (reference: network_swinir.py:618-852; zoo keys 'params'/'params_ema')
# ----------------------------------------------------------------------------

def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": t_linear(sd[prefix + ".weight"]), "bias": sd[prefix + ".bias"]}


def convert_swinir(sd: Dict[str, np.ndarray], depths, upsampler: str = "",
                   upscale: int = 1, resi_connection: str = "1conv",
                   patch_norm: bool = True) -> Dict[str, Any]:
    params: Dict[str, Any] = {"conv_first": {"conv": conv_leaf(sd, "conv_first")}}
    if patch_norm and "patch_embed.norm.weight" in sd:
        params["patch_norm"] = _ln(sd, "patch_embed.norm")
    if "absolute_pos_embed" in sd:
        # ape=True checkpoints: (1, num_patches, C) -> NHWC (1, S, S, C)
        a = sd["absolute_pos_embed"]
        s = int(round(a.shape[1] ** 0.5))
        assert s * s == a.shape[1], "non-square ape patch grid"
        params["absolute_pos_embed"] = a.reshape(1, s, s, a.shape[-1])
    for il, depth in enumerate(depths):
        layer: Dict[str, Any] = {}
        for j in range(depth):
            p = f"layers.{il}.residual_group.blocks.{j}"
            blk = {
                "norm1": _ln(sd, f"{p}.norm1"),
                "norm2": _ln(sd, f"{p}.norm2"),
                "qkv_kernel": t_linear(sd[f"{p}.attn.qkv.weight"]),
                "proj_kernel": t_linear(sd[f"{p}.attn.proj.weight"]),
                "proj_bias": sd[f"{p}.attn.proj.bias"],
                "rel_bias_table": sd[f"{p}.attn.relative_position_bias_table"],
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            }
            if f"{p}.attn.qkv.bias" in sd:
                blk["qkv_bias"] = sd[f"{p}.attn.qkv.bias"]
            layer[f"blk{j:02d}"] = blk
        if resi_connection == "1conv":
            layer["conv"] = {"conv": conv_leaf(sd, f"layers.{il}.conv")}
        else:
            layer["conv_a"] = {"conv": conv_leaf(sd, f"layers.{il}.conv.0")}
            layer["conv_b"] = {"conv": conv_leaf(sd, f"layers.{il}.conv.2")}
            layer["conv_c"] = {"conv": conv_leaf(sd, f"layers.{il}.conv.4")}
        params[f"layer{il}"] = layer
    params["norm"] = _ln(sd, "norm")
    if resi_connection == "1conv":
        params["conv_after_body"] = {"conv": conv_leaf(sd, "conv_after_body")}
    else:
        params["cab_a"] = {"conv": conv_leaf(sd, "conv_after_body.0")}
        params["cab_b"] = {"conv": conv_leaf(sd, "conv_after_body.2")}
        params["cab_c"] = {"conv": conv_leaf(sd, "conv_after_body.4")}

    if upsampler == "pixelshuffle":
        params["conv_before_upsample"] = {"conv": conv_leaf(sd, "conv_before_upsample.0")}
        # Upsample Sequential packs [conv, PixelShuffle] per step
        conv_ids = sorted({int(k.split(".")[1]) for k in sd
                           if k.startswith("upsample.") and k.endswith(".weight")})
        for i, t in enumerate(conv_ids):
            params[f"upsample{i}"] = {"conv": conv_leaf(sd, f"upsample.{t}")}
        params["conv_last"] = {"conv": conv_leaf(sd, "conv_last")}
    elif upsampler == "pixelshuffledirect":
        params["upsample_direct"] = {"conv": conv_leaf(sd, "upsample.0")}
    elif upsampler == "nearest+conv":
        params["conv_before_upsample"] = {"conv": conv_leaf(sd, "conv_before_upsample.0")}
        for nm in ("conv_up1", "conv_up2", "conv_hr", "conv_last"):
            params[nm] = {"conv": conv_leaf(sd, nm)}
    else:
        params["conv_last"] = {"conv": conv_leaf(sd, "conv_last")}
    return {"params": params}


# ----------------------------------------------------------------------------
# SpyNet + VRT (reference: network_vrt.py; zoo: 001_VRT_*.pth etc.)
# ----------------------------------------------------------------------------

def t_conv3d_133(w: np.ndarray) -> np.ndarray:
    """torch Conv3d weight (O,I,1,kh,kw) → 2-D HWIO (per-frame conv)."""
    assert w.shape[2] == 1
    return np.ascontiguousarray(w[:, :, 0].transpose(2, 3, 1, 0))


def convert_spynet(sd: Dict[str, np.ndarray],
                   prefix: str = "") -> Dict[str, Any]:
    """basic_module.{i}.basic_module.{0,2,4,6,8} 7x7 convs
    (network_vrt.py:342-357)."""
    params: Dict[str, Any] = {}
    for i in range(6):
        mod = {}
        for j, t in enumerate(range(0, 9, 2)):
            mod[f"conv{j}"] = {"conv": conv_leaf(
                sd, f"{prefix}basic_module.{i}.basic_module.{t}")}
        params[f"basic{i}"] = mod
    return params


def _vrt_tmsa_block(sd, p, mut_attn):
    blk = {
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn": {
            "rel_bias_table": sd[f"{p}.attn.relative_position_bias_table"],
            "qkv_self_kernel": t_linear(sd[f"{p}.attn.qkv_self.weight"]),
            "proj_kernel": t_linear(sd[f"{p}.attn.proj.weight"]),
            "proj_bias": sd[f"{p}.attn.proj.bias"],
        },
        "mlp": {"fc11": _dense(sd, f"{p}.mlp.fc11"),
                "fc12": _dense(sd, f"{p}.mlp.fc12"),
                "fc2": _dense(sd, f"{p}.mlp.fc2")},
    }
    if f"{p}.attn.qkv_self.bias" in sd:
        blk["attn"]["qkv_self_bias"] = sd[f"{p}.attn.qkv_self.bias"]
    if mut_attn:
        blk["attn"]["qkv_mut_kernel"] = t_linear(sd[f"{p}.attn.qkv_mut.weight"])
        if f"{p}.attn.qkv_mut.bias" in sd:
            blk["attn"]["qkv_mut_bias"] = sd[f"{p}.attn.qkv_mut.bias"]
    return blk


def _stack_trees(trees):
    """[{...}, {...}] → one tree with leaves stacked on a new leading axis
    (the nn.scan parameter layout)."""
    import jax

    return jax.tree_util.tree_map(lambda *ls: np.stack(ls), *trees)


def _vrt_tmsag(sd, p, depth, mut_attn, block_fn=None):
    """Even depths map onto the scanned TMSAPair layout
    (pairs/{a,b} with leaves stacked over depth//2); odd depths keep the
    per-block blk{j} layout — mirrors models/vrt.py TMSAG."""
    block_fn = block_fn or _vrt_tmsa_block
    if depth % 2 == 0 and depth > 0:
        a = [block_fn(sd, f"{p}.blocks.{2 * i}", mut_attn)
             for i in range(depth // 2)]
        b = [block_fn(sd, f"{p}.blocks.{2 * i + 1}", mut_attn)
             for i in range(depth // 2)]
        return {"pairs": {"a": _stack_trees(a), "b": _stack_trees(b)}}
    return {f"blk{j:02d}": block_fn(sd, f"{p}.blocks.{j}", mut_attn)
            for j in range(depth)}


def convert_vrt(sd: Dict[str, np.ndarray], depths, mul_attn_ratio=0.75,
                pa_frames=2, upscale=4) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    params["conv_first"] = {"conv": {"kernel": t_conv3d_133(sd["conv_first.weight"]),
                                     "bias": sd["conv_first.bias"]}}
    if pa_frames:
        params["spynet"] = convert_spynet(sd, "spynet.")

    reshapes = ["none", "down", "down", "down", "up", "up", "up"]
    for i in range(7):
        p = f"stage{i + 1}"
        st: Dict[str, Any] = {}
        if reshapes[i] == "none":
            st["resh_norm"] = _ln(sd, f"{p}.reshape.1")
        else:
            st["resh_norm"] = _ln(sd, f"{p}.reshape.1")
            st["resh_linear"] = _dense(sd, f"{p}.reshape.2")
        d1 = int(depths[i] * mul_attn_ratio)
        st["group1"] = _vrt_tmsag(sd, f"{p}.residual_group1", d1, True)
        st["group2"] = _vrt_tmsag(sd, f"{p}.residual_group2", depths[i] - d1, False)
        st["linear1"] = _dense(sd, f"{p}.linear1")
        st["linear2"] = _dense(sd, f"{p}.linear2")
        if pa_frames:
            st["pa_deform"] = {
                "dcn_kernel": t_conv(sd[f"{p}.pa_deform.weight"]),
                "dcn_bias": sd[f"{p}.pa_deform.bias"],
                "off0": {"conv": conv_leaf(sd, f"{p}.pa_deform.conv_offset.0")},
                "off1": {"conv": conv_leaf(sd, f"{p}.pa_deform.conv_offset.2")},
                "off2": {"conv": conv_leaf(sd, f"{p}.pa_deform.conv_offset.4")},
                "off3": conv_leaf(sd, f"{p}.pa_deform.conv_offset.6"),
            }
            st["pa_fuse"] = {"fc11": _dense(sd, f"{p}.pa_fuse.fc11"),
                             "fc12": _dense(sd, f"{p}.pa_fuse.fc12"),
                             "fc2": _dense(sd, f"{p}.pa_fuse.fc2")}
        params[f"stage{i + 1}"] = st

    params["stage8_norm"] = _ln(sd, "stage8.0.1")
    params["stage8_linear"] = _dense(sd, "stage8.0.2")
    for j in range(7, len(depths)):
        idx = j - 6          # stage8 ModuleList: [head, RTMSA...]
        params[f"stage8_{j - 7}"] = {
            "group": _vrt_tmsag(sd, f"stage8.{idx}.residual_group", depths[j], False),
            "linear": _dense(sd, f"stage8.{idx}.linear"),
        }
    params["norm"] = _ln(sd, "norm")
    params["conv_after_body"] = _dense(sd, "conv_after_body")

    if pa_frames == 0:
        # frame interpolation head (reference network_vrt.py:1386-1387):
        # 2-D convs — linear_fuse 1x1 + conv_last 7x7
        params["linear_fuse"] = {"conv": {
            "kernel": t_conv(sd["linear_fuse.weight"]),
            "bias": sd["linear_fuse.bias"]}}
        params["conv_last"] = {"conv": {
            "kernel": t_conv(sd["conv_last.weight"]),
            "bias": sd["conv_last.bias"]}}
        return {"params": params}
    if upscale > 1:
        params["conv_before_upsample"] = {"conv": {
            "kernel": t_conv3d_133(sd["conv_before_upsample.0.weight"]),
            "bias": sd["conv_before_upsample.0.bias"]}}
        up_ids = sorted({int(k.split(".")[1]) for k in sd
                         if k.startswith("upsample.") and k.endswith(".weight")})
        for u, t in enumerate(up_ids[:-1]):
            params[f"upsample{u}"] = {"conv": {
                "kernel": t_conv3d_133(sd[f"upsample.{t}.weight"]),
                "bias": sd[f"upsample.{t}.bias"]}}
        params["upsample_tail"] = {"conv": {
            "kernel": t_conv3d_133(sd[f"upsample.{up_ids[-1]}.weight"]),
            "bias": sd[f"upsample.{up_ids[-1]}.bias"]}}
    params["conv_last"] = {"conv": {"kernel": t_conv3d_133(sd["conv_last.weight"]),
                                    "bias": sd["conv_last.bias"]}}
    return {"params": params}


# ----------------------------------------------------------------------------
# RVRT (reference: network_rvrt.py; zoo: 001_RVRT_* etc.)
# ----------------------------------------------------------------------------

def _rvrt_stl_block(sd, p):
    blk = {
        "norm1": _ln(sd, f"{p}.norm1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn": {
            "rel_bias_table": sd[f"{p}.attn.relative_position_bias_table"],
            "qkv_self_kernel": t_linear(sd[f"{p}.attn.qkv_self.weight"]),
            "proj_kernel": t_linear(sd[f"{p}.attn.proj.weight"]),
            "proj_bias": sd[f"{p}.attn.proj.bias"],
        },
        "mlp_fc1": _dense(sd, f"{p}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{p}.mlp.fc2"),
    }
    if f"{p}.attn.qkv_self.bias" in sd:
        blk["attn"]["qkv_self_bias"] = sd[f"{p}.attn.qkv_self.bias"]
    return blk


def _rvrt_input_conv(sd, prefix, num_blocks, depth):
    """RSTBWithInputConv keys: main.1 conv, main.3 LN, main.5.{i} RSTBs,
    main.7 LN (network_rvrt.py:673-694)."""
    out = {
        "conv_in": {"conv": {"kernel": t_conv3d_133(sd[f"{prefix}.main.1.weight"]),
                             "bias": sd[f"{prefix}.main.1.bias"]}},
        "norm_in": _ln(sd, f"{prefix}.main.3"),
        "norm_out": _ln(sd, f"{prefix}.main.7"),
    }
    for i in range(num_blocks):
        p = f"{prefix}.main.5.{i}"
        out[f"rstb{i:02d}"] = {
            "group": _vrt_tmsag(sd, f"{p}.residual_group", depth, False,
                                block_fn=lambda s, q, _m: _rvrt_stl_block(s, q)),
            "linear": _dense(sd, f"{p}.linear"),
        }
    return out


def convert_rvrt(sd: Dict[str, np.ndarray], num_blocks=(1, 2, 1),
                 depths=(2, 2, 2), upscale=4) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    params["spynet"] = convert_spynet(sd, "spynet.")
    if upscale == 4:
        params["feat_extract"] = _rvrt_input_conv(sd, "feat_extract",
                                                  num_blocks[0], depths[0])
    else:
        # deblur/denoise head (network_rvrt.py:831-854): Sequential of two
        # stride-2 conv3d (indices 1, 3) then RSTBWithInputConv at index 6
        for ours, t in (("down0", 1), ("down1", 3)):
            params[ours] = {"conv": {
                "kernel": t_conv3d_133(sd[f"feat_extract.{t}.weight"]),
                "bias": sd[f"feat_extract.{t}.bias"]}}
        params["feat_extract"] = _rvrt_input_conv(sd, "feat_extract.6",
                                                  num_blocks[0], depths[0])
    for module in ("backward_1", "forward_1", "backward_2", "forward_2"):
        d = f"deform_align.{module}"
        da = {}
        for i, t in enumerate(range(0, 11, 2)):
            w = sd[f"{d}.conv_offset.{t}.weight"]
            leaf = {"kernel": t_conv3d_133(w), "bias": sd[f"{d}.conv_offset.{t}.bias"]}
            if i < 5:
                da[f"off{i}"] = {"conv": leaf}
            else:
                da["off5"] = leaf   # raw nn.Conv in our module
        for ours, theirs in (("proj_q", "proj_q.1"), ("proj_k", "proj_k.1"),
                             ("proj_v", "proj_v.1"), ("proj", "proj.1"),
                             ("mlp_fc1", "mlp.1.fc1"), ("mlp_fc2", "mlp.1.fc2")):
            da[ours] = _dense(sd, f"{d}.{theirs}")
        params[f"deform_{module}"] = da
        params[f"backbone_{module}"] = _rvrt_input_conv(
            sd, f"backbone.{module}", num_blocks[1], depths[1])
    params["reconstruction"] = _rvrt_input_conv(sd, "reconstruction",
                                                num_blocks[2], depths[2])
    params["conv_before_upsampler"] = {"conv": {
        "kernel": t_conv3d_133(sd["conv_before_upsampler.0.weight"]),
        "bias": sd["conv_before_upsampler.0.bias"]}}
    up_ids = sorted({int(k.split(".")[1]) for k in sd
                     if k.startswith("upsampler.") and k.endswith(".weight")})
    for u, t in enumerate(up_ids[:-1]):
        params[f"upsampler{u}"] = {"conv": {
            "kernel": t_conv3d_133(sd[f"upsampler.{t}.weight"]),
            "bias": sd[f"upsampler.{t}.bias"]}}
    params["upsampler_tail"] = {"conv": {
        "kernel": t_conv3d_133(sd[f"upsampler.{up_ids[-1]}.weight"]),
        "bias": sd[f"upsampler.{up_ids[-1]}.bias"]}}
    params["conv_last"] = {"conv": {"kernel": t_conv3d_133(sd["conv_last.weight"]),
                                    "bias": sd["conv_last.bias"]}}
    return {"params": params}


# ----------------------------------------------------------------------------
# GPEN FullGenerator (reference: network_faceenhancer.py:630-687;
# zoo: GPEN-512.pth etc.)
# ----------------------------------------------------------------------------

def _gpen_eql(sd, p):
    """EqualLinear: torch (out,in) raw weight → (in,out)."""
    return {"weight": t_linear(sd[f"{p}.weight"]), "bias": sd[f"{p}.bias"]}


def _gpen_modconv(sd, p):
    w = sd[f"{p}.weight"]          # (1, O, I, k, k)
    return {"weight": np.ascontiguousarray(w[0].transpose(2, 3, 1, 0)),
            "modulation": _gpen_eql(sd, f"{p}.modulation")}


def _gpen_styled(sd, p):
    return {"conv": _gpen_modconv(sd, f"{p}.conv"),
            "noise_weight": sd[f"{p}.noise.weight"],
            "act_bias": sd[f"{p}.activate.bias"]}


def _gpen_torgb(sd, p):
    return {"conv": _gpen_modconv(sd, f"{p}.conv"),
            "bias": sd[f"{p}.bias"].reshape(-1)}


def convert_gpen(sd: Dict[str, np.ndarray], size: int = 512,
                 n_mlp: int = 8) -> Dict[str, Any]:
    import math as _math

    log_size = int(_math.log2(size))
    params: Dict[str, Any] = {}

    # encoder: ecd0 = ConvLayer(3, ch, 1); ecd{i} downsample ConvLayers
    params["ecd0"] = {"conv": {"weight": t_conv(sd["ecd0.0.0.weight"])},
                      "act_bias": sd["ecd0.0.1.bias"]}
    n_ecd = log_size - 2
    for i in range(1, n_ecd + 1):
        params[f"ecd{i}"] = {
            "conv": {"weight": t_conv(sd[f"ecd{i}.0.1.weight"])},
            "act_bias": sd[f"ecd{i}.0.2.bias"]}

    # final linear: torch flattens NCHW (C,4,4); ours flattens NHWC (4,4,C)
    w = sd["final_linear.0.weight"]                    # (style_dim, C*16)
    c = w.shape[1] // 16
    w = w.reshape(-1, c, 4, 4).transpose(2, 3, 1, 0)   # (4,4,C,out)
    params["final_linear"] = {"weight": np.ascontiguousarray(
        w.reshape(16 * c, -1)), "bias": sd["final_linear.0.bias"]}

    g: Dict[str, Any] = {}
    for i in range(n_mlp):
        g[f"style{i}"] = _gpen_eql(sd, f"generator.style.{i + 1}")
    g["const_input"] = np.ascontiguousarray(
        sd["generator.input.input"].transpose(0, 2, 3, 1))
    g["conv1"] = _gpen_styled(sd, "generator.conv1")
    g["to_rgb1"] = _gpen_torgb(sd, "generator.to_rgb1")
    for j in range(log_size - 2):
        g[f"conv_up{j}"] = _gpen_styled(sd, f"generator.convs.{2 * j}")
        g[f"conv_same{j}"] = _gpen_styled(sd, f"generator.convs.{2 * j + 1}")
        g[f"to_rgbs{j}"] = _gpen_torgb(sd, f"generator.to_rgbs.{j}")
    params["generator"] = g
    return {"params": params}


# ----------------------------------------------------------------------------
# RetinaFace-R50 (reference: retinaface/facemodels/retinaface.py; checkpoint
# RetinaFace-R50.pth — torchvision resnet50 trunk under `body.`)
# ----------------------------------------------------------------------------

def convert_retinaface(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """RetinaFace-R50.pth → kair_tpu.models.retinaface.RetinaFace variables.

    Key schema (facemodels/retinaface.py:72-87 + net.py conv_bn Sequential
    indices): body.conv1/bn1/layer{1-4}.{i}.conv{1-3}+bn{1-3}(+downsample),
    fpn.output{1-3}/merge{1-2} as (conv=.0, bn=.1), ssh{1-3}.conv*X*_*
    likewise, and {Class,Bbox,Landmark}Head.{i}.conv1x1.

    The released checkpoint isn't fetchable in this environment; the
    structural parity test synthesises a state dict with this exact schema
    (tests/test_retinaface.py) so real weights work when dropped in."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def convbn(dst, tname, conv_idx="0", bn_idx="1"):
        p, s = bn_params(sd, f"{tname}.{bn_idx}")
        params[dst] = {"conv": {"kernel": t_conv(sd[f"{tname}.{conv_idx}.weight"])},
                       "bn": p}
        stats[dst] = {"bn": s}

    # ResNet50 trunk
    body_p: Dict[str, Any] = {"conv1": {"kernel": t_conv(sd["body.conv1.weight"])}}
    body_s: Dict[str, Any] = {}
    p, s = bn_params(sd, "body.bn1")
    body_p["bn1"], body_s["bn1"] = p, s
    for li, blocks in enumerate([3, 4, 6, 3]):
        for bi in range(blocks):
            t = f"body.layer{li + 1}.{bi}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci in range(1, 4):
                bp, bs = bn_params(sd, f"{t}.bn{ci}")
                blk_p[f"c{ci}"] = {"conv": {"kernel": t_conv(sd[f"{t}.conv{ci}.weight"])},
                                   "bn": bp}
                blk_s[f"c{ci}"] = {"bn": bs}
            if f"{t}.downsample.0.weight" in sd:
                dp, ds = bn_params(sd, f"{t}.downsample.1")
                blk_p["down"] = {"conv": {"kernel": t_conv(sd[f"{t}.downsample.0.weight"])},
                                 "bn": dp}
                blk_s["down"] = {"bn": ds}
            body_p[f"layer{li + 1}_b{bi}"] = blk_p
            body_s[f"layer{li + 1}_b{bi}"] = blk_s
    params["body"], stats["body"] = body_p, body_s

    for dst, t in [("output1", "fpn.output1"), ("output2", "fpn.output2"),
                   ("output3", "fpn.output3"), ("merge1", "fpn.merge1"),
                   ("merge2", "fpn.merge2")]:
        pp, ss = bn_params(sd, f"{t}.1")
        params.setdefault("fpn", {})[dst] = {
            "conv": {"kernel": t_conv(sd[f"{t}.0.weight"])}, "bn": pp}
        stats.setdefault("fpn", {})[dst] = {"bn": ss}

    for i in (1, 2, 3):
        for leaf in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2",
                     "conv7x7_3"):
            t = f"ssh{i}.{leaf}"
            pp, ss = bn_params(sd, f"{t}.1")
            params.setdefault(f"ssh{i}", {})[leaf] = {
                "conv": {"kernel": t_conv(sd[f"{t}.0.weight"])}, "bn": pp}
            stats.setdefault(f"ssh{i}", {})[leaf] = {"bn": ss}

    for i in range(3):
        for head, dst in [("BboxHead", f"bbox{i}"), ("ClassHead", f"class{i}"),
                          ("LandmarkHead", f"ldm{i}")]:
            t = f"{head}.{i}.conv1x1"
            params[dst] = {"kernel": t_conv(sd[f"{t}.weight"]),
                           "bias": sd[f"{t}.bias"]}

    return {"params": params, "batch_stats": stats}
