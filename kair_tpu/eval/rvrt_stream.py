"""Chunked RVRT inference for long videos — the TPU-native analog of the
reference's CPU feature cache (network_rvrt.py:1115-1155).

The reference keeps every branch's features for all t frames on the GPU and,
past ``cpu_cache_length``, moves them to CPU between uses. Here the
clip-recurrent propagation itself runs as a HOST loop over jitted per-stage
programs (RVRT.__call__ stage=...): only the carried clip state and the
current clip's inputs live on device, every produced clip is offloaded to
host memory immediately, and device memory is O(clip) instead of O(t).
Numerically identical to the monolithic forward (same ops, same order) —
asserted in tests/test_video_pipeline.py.

Per-stage programs compile once and are reused for every clip (static
shapes), so the host loop adds only transfer latency — amortised for the
long sequences this path exists for.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from kair_tpu.ops.warp import flow_warp

_ORDER = ["backward_1", "forward_1", "backward_2", "forward_2"]


@functools.partial(jax.jit)
def _compose_flows(f01, f12, f23):
    """First-order flow composition (reference network_rvrt.py:1002-1008)."""
    f02 = f12 + flow_warp(f01, f12)
    f13 = f23 + flow_warp(f12, f23)
    f03 = f23 + flow_warp(f02, f23)
    return jnp.stack([f02, f13], 1), jnp.stack([f12, f03], 1)


@jax.jit
def _warp_clip(fp, fl):
    flat = fp.reshape((-1,) + fp.shape[2:])
    fl_flat = fl.reshape((-1,) + fl.shape[2:])
    return flow_warp(flat, fl_flat).reshape(fp.shape)


# module-level jitted stage programs with the (hashable, frozen) flax
# module as a static arg: the jit cache persists ACROSS
# rvrt_forward_streamed calls, so a harness looping over many videos
# compiles each stage once per shape, not once per video
@functools.partial(jax.jit, static_argnums=(0,))
def _st_shallow(model, variables, clip):
    return model.apply(variables, stage="shallow", clip=clip)


@functools.partial(jax.jit, static_argnums=(0,))
def _st_flow(model, variables, l1, l2):
    return model.apply(variables, stage="flow", l1=l1, l2=l2)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _st_deform(model, variables, module, q, k, v, w1, w2, f1, f2):
    return model.apply(variables, stage="deform", module=module, q=q, k=k,
                       v=v, warped=[w1, w2], flows=[f1, f2],
                       update="_1" in module)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _st_backbone(model, variables, module, cat):
    return model.apply(variables, stage="backbone", module=module, cat=cat)


@functools.partial(jax.jit, static_argnums=(0,))
def _st_recon(model, variables, cat, lq):
    return model.apply(variables, stage="recon", cat=cat, lq=lq)


def rvrt_forward_streamed(model, variables, lqs: np.ndarray) -> np.ndarray:
    """Run RVRT on (N, T, H, W, 3) with per-clip device residency.

    Mirrors RVRT.__call__ / _propagate exactly (reference
    network_rvrt.py:963-1071) with host-side (numpy) feature storage."""
    clip = model.clip_size
    n, t, h, w, _ = lqs.shape
    assert t % clip == 0, "frame count must divide clip_size"
    assert model.upscale == 4, "streamed eval currently covers the SR head"
    n_clips = t // clip
    lqs = np.asarray(lqs, np.float32)

    shallow_fn = functools.partial(_st_shallow, model, variables)
    flow_fn = functools.partial(_st_flow, model, variables)
    deform_fns = {m: functools.partial(_st_deform, model, variables, m)
                  for m in _ORDER}
    backbone_fns = {m: functools.partial(_st_backbone, model, variables, m)
                    for m in _ORDER}
    recon_fn = functools.partial(_st_recon, model, variables)

    def clip_of(arr, i):
        return arr[:, i * clip:(i + 1) * clip]

    # shallow features + flows, offloaded per clip/pair
    feats: Dict[str, List[np.ndarray]] = {
        "shallow": [np.asarray(shallow_fn(clip_of(lqs, i)))
                    for i in range(n_clips)]}
    flows_b = [np.asarray(flow_fn(lqs[:, j], lqs[:, j + 1]))
               for j in range(t - 1)]
    flows_f = [np.asarray(flow_fn(lqs[:, j + 1], lqs[:, j]))
               for j in range(t - 1)]

    updated_flows: Dict[str, List[np.ndarray]] = {}
    for module in _ORDER:
        flows = flows_b if "backward" in module else flows_f
        if "backward" in module:
            flow_idx = list(range(0, t))[::-1]
            clip_idx = list(range(0, n_clips))[::-1]
        else:
            flow_idx = list(range(-1, t - 1))
            clip_idx = list(range(0, n_clips))
        if "_1" in module:
            updated_flows[f"{module}_n1"] = []
            updated_flows[f"{module}_n2"] = []

        feat_prop = jnp.zeros_like(feats["shallow"][0])
        last_key = list(feats)[-2] if len(feats) > 1 else "shallow"
        keys_before = [k for k in feats if k != module]
        feats[module] = []

        for i in range(len(clip_idx)):
            idx_c = clip_idx[i]
            if i > 0:
                if "_1" in module:
                    f01 = flows[flow_idx[clip * i - 1]]
                    f12 = flows[flow_idx[clip * i]]
                    f23 = flows[flow_idx[clip * i + 1]]
                    flow_n1, flow_n2 = _compose_flows(f01, f12, f23)
                else:
                    old = module.replace("_2", "_1")
                    flow_n1 = updated_flows[f"{old}_n1"][i - 1]
                    flow_n2 = updated_flows[f"{old}_n2"][i - 1]

                if "backward" in module:
                    feat_q = feats[last_key][idx_c][:, ::-1]
                    feat_k = feats[last_key][clip_idx[i - 1]][:, ::-1]
                else:
                    feat_q = feats[last_key][idx_c]
                    feat_k = feats[last_key][clip_idx[i - 1]]

                fpw1 = _warp_clip(feat_prop, flow_n1)
                fpw2 = _warp_clip(feat_prop[:, ::-1], flow_n2)
                if "_1" in module:
                    feat_prop, u1, u2 = deform_fns[module](
                        feat_q, feat_k, feat_prop, fpw1, fpw2,
                        flow_n1, flow_n2)
                    updated_flows[f"{module}_n1"].append(np.asarray(u1))
                    updated_flows[f"{module}_n2"].append(np.asarray(u2))
                else:
                    feat_prop = deform_fns[module](
                        feat_q, feat_k, feat_prop, fpw1, fpw2,
                        flow_n1, flow_n2)

            if "backward" in module:
                feat = [feats[k][idx_c][:, ::-1] for k in keys_before]
            else:
                feat = [feats[k][idx_c] for k in keys_before]
            cat = jnp.concatenate([jnp.asarray(f) for f in feat]
                                  + [feat_prop], axis=-1)
            feat_prop = feat_prop + backbone_fns[module](cat)
            feats[module].append(np.asarray(feat_prop))

        if "backward" in module:
            feats[module] = [f[:, ::-1] for f in feats[module][::-1]]

    outs = []
    for i in range(n_clips):
        cat = np.concatenate(
            [feats[k][i] for k in ["shallow"] + _ORDER], axis=-1)
        outs.append(np.asarray(recon_fn(jnp.asarray(cat),
                                        jnp.asarray(clip_of(lqs, i)))))
    return np.concatenate(outs, axis=1)
