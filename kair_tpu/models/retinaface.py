"""RetinaFace face detection — for the GPEN face-enhancement pipeline
(reference: retinaface/ — facemodels/retinaface.py:48-145,
facemodels/net.py FPN/SSH, layers/functions/prior_box.py:7-34,
utils_faces/box_utils.py:209-247, nms/py_cpu_nms.py:10-38).

ResNet-50 backbone (torchvision layout for weight conversion) → FPN → SSH
contexts → class/bbox/landmark heads. The anchor decode / NMS stage is
host-side numpy (tiny, irregular), the network is one jit.
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CFG_RE50 = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 256,
    "out_channel": 256,
}


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, self.leaky) if self.leaky > 0 else nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """torchvision ResNet bottleneck (1x1 → 3x3 → 1x1, expansion 4)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _ConvBN(self.planes, 1, 1, relu=True, dtype=self.dtype, name="c1")(x)
        out = _ConvBN(self.planes, 3, self.stride, relu=True, dtype=self.dtype,
                      name="c2")(out)
        out = _ConvBN(self.planes * 4, 1, 1, relu=False, dtype=self.dtype,
                      name="c3")(out)
        if self.downsample:
            identity = _ConvBN(self.planes * 4, 1, self.stride, relu=False,
                               dtype=self.dtype, name="down")(x)
        return nn.relu(out + identity)


class ResNet50Trunk(nn.Module):
    """layers 1-4; returns (layer2, layer3, layer4) features (the cfg
    return_layers of the reference, facemodels/retinaface.py:72)."""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        outs = []
        for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for bi in range(blocks):
                x = Bottleneck(planes, stride if bi == 0 else 1,
                               downsample=(bi == 0), dtype=self.dtype,
                               name=f"layer{li + 1}_b{bi}")(x)
            if li >= 1:
                outs.append(x)
        return outs  # C3 (512ch), C4 (1024ch), C5 (2048ch)


class FPN(nn.Module):
    """reference facemodels/net.py:68-100."""
    out_channels: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats):
        leaky = 0.1 if self.out_channels <= 64 else 0.0
        o1 = _ConvBN(self.out_channels, 1, leaky=leaky, dtype=self.dtype,
                     name="output1")(feats[0])
        o2 = _ConvBN(self.out_channels, 1, leaky=leaky, dtype=self.dtype,
                     name="output2")(feats[1])
        o3 = _ConvBN(self.out_channels, 1, leaky=leaky, dtype=self.dtype,
                     name="output3")(feats[2])
        from kair_tpu.ops.blocks import upsample_nearest
        up3 = jax.image.resize(o3, o2.shape, "nearest")
        o2 = _ConvBN(self.out_channels, 3, leaky=leaky, dtype=self.dtype,
                     name="merge2")(o2 + up3)
        up2 = jax.image.resize(o2, o1.shape, "nearest")
        o1 = _ConvBN(self.out_channels, 3, leaky=leaky, dtype=self.dtype,
                     name="merge1")(o1 + up2)
        return [o1, o2, o3]


class SSH(nn.Module):
    """reference facemodels/net.py:40-66."""
    out_channel: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        leaky = 0.1 if self.out_channel <= 64 else 0.0
        c3 = _ConvBN(self.out_channel // 2, 3, relu=False, dtype=self.dtype,
                     name="conv3X3")(x)
        c5_1 = _ConvBN(self.out_channel // 4, 3, leaky=leaky, dtype=self.dtype,
                       name="conv5X5_1")(x)
        c5 = _ConvBN(self.out_channel // 4, 3, relu=False, dtype=self.dtype,
                     name="conv5X5_2")(c5_1)
        c7_2 = _ConvBN(self.out_channel // 4, 3, leaky=leaky, dtype=self.dtype,
                       name="conv7X7_2")(c5_1)
        c7 = _ConvBN(self.out_channel // 4, 3, relu=False, dtype=self.dtype,
                     name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    """reference facemodels/retinaface.py:48-145 (ResNet50 config)."""
    out_channel: int = 256
    num_anchors: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        feats = ResNet50Trunk(dtype=self.dtype, name="body")(x)
        fpn = FPN(self.out_channel, dtype=self.dtype, name="fpn")(feats)
        features = [SSH(self.out_channel, dtype=self.dtype, name=f"ssh{i + 1}")(f)
                    for i, f in enumerate(fpn)]

        def head(feat, ch_out, name):
            y = nn.Conv(self.num_anchors * ch_out, (1, 1), dtype=self.dtype,
                        name=name)(feat)
            return y.reshape(y.shape[0], -1, ch_out)

        bbox = jnp.concatenate(
            [head(f, 4, f"bbox{i}") for i, f in enumerate(features)], axis=1)
        cls = jnp.concatenate(
            [head(f, 2, f"class{i}") for i, f in enumerate(features)], axis=1)
        ldm = jnp.concatenate(
            [head(f, 10, f"ldm{i}") for i, f in enumerate(features)], axis=1)
        return bbox, jax.nn.softmax(cls, axis=-1), ldm


# ----------------------------------------------------------------------------
# anchors / decode / NMS (host-side; reference prior_box.py + box_utils.py)
# ----------------------------------------------------------------------------

def prior_box(image_size: Tuple[int, int], cfg: dict = CFG_RE50) -> np.ndarray:
    anchors = []
    fmaps = [[math.ceil(image_size[0] / s), math.ceil(image_size[1] / s)]
             for s in cfg["steps"]]
    for k, f in enumerate(fmaps):
        for i, j in product(range(f[0]), range(f[1])):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / image_size[1]
                s_ky = min_size / image_size[0]
                cx = (j + 0.5) * cfg["steps"][k] / image_size[1]
                cy = (i + 0.5) * cfg["steps"][k] / image_size[0]
                anchors.append([cx, cy, s_kx, s_ky])
    out = np.asarray(anchors, np.float32)
    if cfg["clip"]:
        out = np.clip(out, 0, 1)
    return out


def decode_boxes(loc: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    boxes = np.concatenate([
        priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
        priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])], axis=1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def decode_landms(pre: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    return np.concatenate(
        [priors[:, :2] + pre[:, 2 * i: 2 * i + 2] * variances[0] * priors[:, 2:]
         for i in range(5)], axis=1)


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """reference py_cpu_nms.py:10-38."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


def detect_faces(apply_fn, img_bgr_float: np.ndarray,
                 cfg: dict = CFG_RE50,
                 confidence_threshold: float = 0.9,
                 nms_threshold: float = 0.4, top_k: int = 5000,
                 keep_top_k: int = 750):
    """Detection pipeline (reference retinaface_detection.py:63-139):
    subtract (104,117,123) BGR means, forward, decode, filter, NMS.
    apply_fn: NHWC float → (bbox, scores, landms)."""
    h, w = img_bgr_float.shape[:2]
    x = img_bgr_float - np.array([104.0, 117.0, 123.0], np.float32)
    loc, conf, landms = apply_fn(x[None].astype(np.float32))
    loc, conf, landms = map(np.asarray, (loc[0], conf[0], landms[0]))

    priors = prior_box((h, w), cfg)
    boxes = decode_boxes(loc, priors, cfg["variance"]) * \
        np.array([w, h, w, h], np.float32)
    lms = decode_landms(landms, priors, cfg["variance"]) * \
        np.array([w, h] * 5, np.float32)
    scores = conf[:, 1]

    inds = scores > confidence_threshold
    boxes, lms, scores = boxes[inds], lms[inds], scores[inds]
    order = scores.argsort()[::-1][:top_k]
    boxes, lms, scores = boxes[order], lms[order], scores[order]
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    keep = nms(dets, nms_threshold)
    return dets[keep][:keep_top_k], lms[keep][:keep_top_k]
