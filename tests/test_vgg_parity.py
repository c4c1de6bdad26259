"""VGG19 perceptual-feature numeric parity (random-weight oracle).

Pretrained torchvision weights are unavailable (zero egress), but the conv
GRAPH + input/range normalization (reference loss.py:55-134
VGGFeatureExtractor semantics over torchvision vgg19.features) can be
verified with the same random weights on both sides: build the public
vgg19.features Sequential layout in torch, convert its state dict, and
compare feature maps at the tap points the reference uses."""

import numpy as np
import pytest


def _torch_vgg19_features():
    """torchvision.models.vgg19().features layout (public architecture:
    Simonyan & Zisserman 2014), random-init."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


@pytest.mark.parametrize("taps,use_input_norm,use_range_norm", [
    ((34,), True, False),                 # default perceptual tap (loss.py:60)
    ((2, 7, 16, 25, 34), True, True),     # list mode + range norm
])
def test_vgg19_feature_parity(taps, use_input_norm, use_range_norm):
    import torch
    from kair_tpu.models.vgg import VGG19Features, convert_vgg19_features

    torch.manual_seed(21)
    feats = _torch_vgg19_features()
    feats.eval()
    rng = np.random.RandomState(21)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    if use_range_norm:
        x = x * 2 - 1                    # [-1,1] inputs for range-norm mode

    # reference VGGFeatureExtractor semantics (loss.py:100-134)
    xt = torch.from_numpy(x)
    if use_range_norm:
        xt = (xt + 1.0) / 2.0
    if use_input_norm:
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        xt = (xt - mean) / std
    wants = []
    with torch.no_grad():
        h = xt
        for i, m in enumerate(feats):
            h = m(h)
            if i in taps:
                wants.append(h.numpy())

    sd = {f"features.{k}": v.numpy() for k, v in feats.state_dict().items()}
    variables = convert_vgg19_features(sd)
    model = VGG19Features(feature_layers=taps,
                          use_input_norm=use_input_norm,
                          use_range_norm=use_range_norm)
    got = model.apply(variables, x.transpose(0, 2, 3, 1))
    if not isinstance(got, (list, tuple)):
        got = [got]
    assert len(got) == len(wants)
    for g, w in zip(got, wants):
        np.testing.assert_allclose(np.asarray(g), w.transpose(0, 2, 3, 1),
                                   atol=1e-3, rtol=1e-4)
