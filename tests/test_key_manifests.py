"""Converter hardening against the released-zoo key manifests.

Zero egress blocks downloading most released ``.pth`` files, but their key
sets are exactly the reference model state_dicts at the released configs
(all loaders are strict — main_test_swinir.py:170-175, model_base.py:201-216).
``tests/make_key_manifests.py`` records those as name→shape JSON;
here every converter is run against a zero-filled state dict with exactly
the manifest's keys, asserting:

  1. no released key would be silently dropped (each key is consumed by
     the converter, or is a known recomputed-in-graph buffer), and
  2. the converted pytree matches our flax model's param tree exactly
     (same paths, same shapes) — so a strict load would succeed.

Together these make the converter key-maps released-checkpoint-complete
without the checkpoints (VERDICT r3 #8).
"""

import json
import os
import re

import numpy as np
import pytest

from kair_tpu.ckpt import torch_convert as tc

MANIFESTS = os.path.join(os.path.dirname(__file__), "fixtures", "manifests")

# buffers the converters deliberately recompute in-graph rather than load
# (torch registers them as persistent buffers so they appear in state_dict):
#   relative_position_index / attn_mask — integer window geometry, rebuilt
#     from shapes (swinir.py window indexing; vrt.py label-factored masks)
#   kernel — StyleGAN FIR blur taps, fixed (1,3,3,1) constants (gpen.py)
#   num_batches_tracked — BN bookkeeping, meaningless at inference
#   spynet.{mean,std} — ImageNet normalization constants, hardcoded in
#     models/spynet.py (network_vrt.py:382 registers them as buffers)
#   position_bias — VRT's fixed sine position encoding, recomputed in-graph
#     (network_vrt.py:619 registers the precomputed table as a buffer)
IGNORE = re.compile(
    r"(\.|^)(relative_position_index|attn_mask|kernel|num_batches_tracked"
    r"|position_bias)$"
    r"|(\.|^)spynet\.(mean|std)$")


class RecordingDict(dict):
    """Tracks which keys a converter actually reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if super().__contains__(key):
            self.read.add(key)
        return super().get(key, default)

    def items(self):
        # a converter that copies k:v pairs into a re-keyed sub-dict (e.g.
        # convert_usrnet stripping the "p." prefix) has read those values
        self.read.update(super().keys())
        return super().items()


def load_manifest(name):
    with open(os.path.join(MANIFESTS, f"{name}.json")) as f:
        shapes = json.load(f)
    return RecordingDict({k: np.zeros(v, np.float32)
                          for k, v in shapes.items()})


def _swinir(**kw):
    from kair_tpu.models.swinir import SwinIR
    return SwinIR(**kw)


def _vrt(**kw):
    from kair_tpu.models.vrt import VRT
    return VRT(**kw)


def _rvrt(**kw):
    from kair_tpu.models.rvrt import RVRT
    return RVRT(**kw)


# name -> (converter(sd), model_builder(), example input shapes, slow)
# model_builder/None skips the shape check (converter-consumption only).
CASES = {
    # ---- CNN zoos -------------------------------------------------------
    "dncnn_25": (
        lambda sd: tc.convert_dncnn(sd, nb=17),
        lambda: __import__("kair_tpu.models.dncnn", fromlist=["DnCNN"]
                           ).DnCNN(1, 1, 64, 17, "R"),
        [(1, 40, 40, 1)], False),
    "dncnn_color_blind": (
        lambda sd: tc.convert_dncnn(sd, nb=20),
        lambda: __import__("kair_tpu.models.dncnn", fromlist=["DnCNN"]
                           ).DnCNN(3, 3, 64, 20, "R"),
        [(1, 40, 40, 3)], False),
    "fdncnn_gray": (
        lambda sd: tc.convert_dncnn(sd, nb=20),
        lambda: __import__("kair_tpu.models.dncnn", fromlist=["FDnCNN"]
                           ).FDnCNN(2, 1, 64, 20),
        [(1, 40, 40, 2)], False),
    "ffdnet_gray": (
        lambda sd: tc.convert_ffdnet(sd, nb=15),
        lambda: __import__("kair_tpu.models.ffdnet", fromlist=["FFDNet"]
                           ).FFDNet(1, 1, 64, 15),
        [(1, 40, 40, 1), (1,)], False),
    "ffdnet_color": (
        lambda sd: tc.convert_ffdnet(sd, nb=12),
        lambda: __import__("kair_tpu.models.ffdnet", fromlist=["FFDNet"]
                           ).FFDNet(3, 3, 96, 12),
        [(1, 40, 40, 3), (1,)], False),
    "srmd_x4": (
        lambda sd: tc.convert_srmd(sd, nb=12),
        lambda: __import__("kair_tpu.models.srresnet", fromlist=["SRMD"]
                           ).SRMD(19, 3, 128, 12, 4, "R", "pixelshuffle"),
        [(1, 24, 24, 19)], False),
    "dpsr_x4": (
        lambda sd: tc.convert_msrresnet0(sd, nb=16, upscale=4,
                                         upsample_mode="pixelshuffle"),
        lambda: __import__("kair_tpu.models.srresnet",
                           fromlist=["MSRResNet0"]
                           ).MSRResNet0(4, 3, 96, 16, 4, "R", "pixelshuffle"),
        [(1, 24, 24, 4)], False),
    "msrresnet_x4": (
        lambda sd: tc.convert_msrresnet0(sd, nb=16, upscale=4,
                                         upsample_mode="upconv"),
        lambda: __import__("kair_tpu.models.srresnet",
                           fromlist=["MSRResNet0"]
                           ).MSRResNet0(3, 3, 64, 16, 4, "R", "upconv"),
        [(1, 24, 24, 3)], False),
    "esrgan_x4": (
        lambda sd: tc.convert_rrdb_old(sd, nb=23, upscale=4,
                                       upsample_mode="upconv"),
        lambda: __import__("kair_tpu.models.rrdbnet", fromlist=["RRDB"]
                           ).RRDB(3, 3, 64, 23, 32, 4, "L", "upconv"),
        [(1, 24, 24, 3)], False),
    "imdn_x4": (
        lambda sd: tc.convert_imdn(sd, nb=8),
        lambda: __import__("kair_tpu.models.imdn", fromlist=["IMDN"]
                           ).IMDN(3, 3, 64, 8, 4, "L", "pixelshuffle"),
        [(1, 24, 24, 3)], False),
    "drunet_gray": (
        lambda sd: tc.convert_unetres(sd, nb=4),
        lambda: __import__("kair_tpu.models.drunet", fromlist=["UNetRes"]
                           ).UNetRes(2, 1, (64, 128, 256, 512), 4),
        [(1, 64, 64, 2)], False),
    "drunet_color": (
        lambda sd: tc.convert_unetres(sd, nb=4),
        lambda: __import__("kair_tpu.models.drunet", fromlist=["UNetRes"]
                           ).UNetRes(4, 3, (64, 128, 256, 512), 4),
        [(1, 64, 64, 4)], False),
    "usrnet": (
        lambda sd: tc.convert_usrnet(sd, n_iter=8, nb=2),
        lambda: __import__("kair_tpu.models.usrnet", fromlist=["USRNet"]
                           ).USRNet(n_iter=8, h_nc=64, in_nc=4, out_nc=3,
                                    nc=(64, 128, 256, 512), nb=2),
        None, False),      # multi-input apply; consumption + tree-vs-tree
    "spynet_sintel_final": (
        # convert_spynet returns the bare tree (it nests under VRT/RVRT);
        # standalone use wraps it
        lambda sd: {"params": tc.convert_spynet(sd)},
        lambda: __import__("kair_tpu.models.spynet", fromlist=["SpyNet"]
                           ).SpyNet(),
        [(1, 64, 64, 3), (1, 64, 64, 3)], False),
    # ---- SwinIR released configs ---------------------------------------
    "swinir_classical_sr_x4": (
        lambda sd: tc.convert_swinir(sd, depths=(6,) * 6,
                                     upsampler="pixelshuffle", upscale=4),
        lambda: _swinir(upscale=4, in_chans=3, embed_dim=180,
                        depths=(6,) * 6, num_heads=(6,) * 6, window_size=8,
                        mlp_ratio=2.0, upsampler="pixelshuffle"),
        [(1, 16, 16, 3)], True),
    "swinir_lightweight_sr_x4": (
        lambda sd: tc.convert_swinir(sd, depths=(6,) * 4,
                                     upsampler="pixelshuffledirect",
                                     upscale=4),
        lambda: _swinir(upscale=4, in_chans=3, embed_dim=60,
                        depths=(6,) * 4, num_heads=(6,) * 4, window_size=8,
                        mlp_ratio=2.0, upsampler="pixelshuffledirect"),
        [(1, 16, 16, 3)], True),
    "swinir_real_sr_x4": (
        lambda sd: tc.convert_swinir(sd, depths=(6,) * 6,
                                     upsampler="nearest+conv", upscale=4),
        lambda: _swinir(upscale=4, in_chans=3, embed_dim=180,
                        depths=(6,) * 6, num_heads=(6,) * 6, window_size=8,
                        mlp_ratio=2.0, upsampler="nearest+conv"),
        [(1, 16, 16, 3)], True),
    "swinir_gray_dn": (
        lambda sd: tc.convert_swinir(sd, depths=(6,) * 6, upsampler="",
                                     upscale=1),
        lambda: _swinir(upscale=1, in_chans=1, embed_dim=180,
                        depths=(6,) * 6, num_heads=(6,) * 6, window_size=8,
                        mlp_ratio=2.0, upsampler=""),
        [(1, 16, 16, 1)], True),
    "swinir_jpeg_car": (
        lambda sd: tc.convert_swinir(sd, depths=(6,) * 6, upsampler="",
                                     upscale=1),
        lambda: _swinir(upscale=1, in_chans=1, embed_dim=180,
                        depths=(6,) * 6, num_heads=(6,) * 6, window_size=7,
                        mlp_ratio=2.0, upsampler="", img_range=255.0),
        [(1, 14, 14, 1)], True),
    # ---- VRT released configs ------------------------------------------
    "vrt_001_reds_6frames": (
        lambda sd: tc.convert_vrt(sd, depths=(8,) * 7 + (4,) * 6,
                                  pa_frames=2, upscale=4),
        lambda: _vrt(upscale=4, window_size=(6, 8, 8),
                     depths=(8,) * 7 + (4,) * 6,
                     embed_dims=(120,) * 7 + (180,) * 6,
                     num_heads=(6,) * 13, pa_frames=2,
                     deformable_groups=12, indep_reconsts=(11, 12)),
        [(1, 6, 64, 64, 3)], True),
    "vrt_005_deblur_dvd": (
        lambda sd: tc.convert_vrt(sd, depths=(8,) * 7 + (4,) * 4,
                                  pa_frames=2, upscale=1),
        lambda: _vrt(upscale=1, window_size=(6, 8, 8),
                     depths=(8,) * 7 + (4,) * 4,
                     embed_dims=(96,) * 7 + (120,) * 4,
                     num_heads=(6,) * 11, pa_frames=2,
                     deformable_groups=16, indep_reconsts=(9, 10)),
        [(1, 6, 64, 64, 3)], True),
    "vrt_008_denoising_davis": (
        lambda sd: tc.convert_vrt(sd, depths=(8,) * 7 + (4,) * 4,
                                  pa_frames=2, upscale=1),
        lambda: _vrt(upscale=1, window_size=(6, 8, 8),
                     depths=(8,) * 7 + (4,) * 4,
                     embed_dims=(96,) * 7 + (120,) * 4,
                     num_heads=(6,) * 11, pa_frames=2,
                     deformable_groups=16, nonblind_denoising=True,
                     indep_reconsts=(9, 10)),
        [(1, 6, 64, 64, 4)], True),
    "vrt_009_fi_vimeo": (
        lambda sd: tc.convert_vrt(sd, depths=(8,) * 7 + (4,) * 4,
                                  pa_frames=0, upscale=1),
        lambda: _vrt(upscale=1, out_chans=3, window_size=(4, 8, 8),
                     depths=(8,) * 7 + (4,) * 4,
                     embed_dims=(96,) * 7 + (120,) * 4,
                     num_heads=(6,) * 11, pa_frames=0,
                     indep_reconsts=()),
        [(1, 4, 64, 64, 3)], True),
    # ---- RVRT released configs -----------------------------------------
    "rvrt_001_reds_30frames": (
        lambda sd: tc.convert_rvrt(sd, num_blocks=(1, 2, 1),
                                   depths=(2, 2, 2), upscale=4),
        lambda: _rvrt(upscale=4, clip_size=2, window_size=(2, 8, 8),
                      num_blocks=(1, 2, 1), depths=(2, 2, 2),
                      embed_dims=(144,) * 3, num_heads=(6,) * 3,
                      inputconv_groups=(1,) * 6, deformable_groups=12,
                      attention_heads=12, attention_window=(3, 3)),
        [(1, 4, 64, 64, 3)], True),
    "rvrt_006_denoising_davis": (
        lambda sd: tc.convert_rvrt(sd, num_blocks=(1, 2, 1),
                                   depths=(2, 2, 2), upscale=1),
        lambda: _rvrt(upscale=1, clip_size=2, window_size=(2, 8, 8),
                      num_blocks=(1, 2, 1), depths=(2, 2, 2),
                      embed_dims=(192,) * 3, num_heads=(6,) * 3,
                      inputconv_groups=(1, 3, 4, 6, 8, 4),
                      deformable_groups=12, attention_heads=12,
                      attention_window=(3, 3), nonblind_denoising=True),
        # the deblur head feeds spynet a 4x-downsampled frame, so the
        # abstract init needs >=256px for the 6-level pyramid
        [(1, 4, 256, 256, 4)], True),
    # ---- GPEN -----------------------------------------------------------
    "gpen_bfr_512": (
        lambda sd: tc.convert_gpen(sd, size=512, n_mlp=8),
        lambda: __import__("kair_tpu.models.gpen",
                           fromlist=["FullGenerator"]
                           ).FullGenerator(size=512, style_dim=512, n_mlp=8,
                                           channel_multiplier=2),
        [(1, 512, 512, 3)], True),
}


def _all_names():
    return sorted(CASES)


@pytest.mark.parametrize("name", _all_names())
def test_manifest_keys_consumed(name):
    """Every released key is read by the converter or is a known
    recomputed-in-graph buffer — nothing silently dropped."""
    conv, _, _, _ = CASES[name]
    sd = load_manifest(name)
    tree = conv(sd)
    assert tree and "params" in tree
    unread = {k for k in sd if k not in sd.read and not IGNORE.search(k)}
    assert not unread, (f"{name}: {len(unread)} released keys never read by "
                        f"the converter: {sorted(unread)[:10]}")


def _shape_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_shape_tree(v, path))
        else:
            out[path] = tuple(getattr(v, "shape", ()))
    return out


def _init_shapes(model, in_shapes):
    import jax
    import jax.numpy as jnp

    args = [jnp.zeros(s, jnp.float32) for s in in_shapes]
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                  *args))
    return _shape_tree({"params": variables["params"]})


@pytest.mark.parametrize("name", [n for n in _all_names()
                                  if CASES[n][1] and CASES[n][2]
                                  and not CASES[n][3]])
def test_manifest_shapes_small(name):
    _check_shapes(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n in _all_names()
                                  if CASES[n][1] and CASES[n][2]
                                  and CASES[n][3]])
def test_manifest_shapes_large(name):
    _check_shapes(name)


def _check_shapes(name):
    """Converted tree == our model's param tree, path for path."""
    conv, build, in_shapes, _ = CASES[name]
    sd = load_manifest(name)
    got = _shape_tree(conv(sd))
    want = _init_shapes(build(), in_shapes)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{name}: tree mismatch\n missing({len(missing)}): {missing[:8]}\n"
        f" extra({len(extra)}): {extra[:8]}")
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{name}: shape mismatches: {dict(list(bad.items())[:8])}"


def test_usrnet_tree_vs_model():
    """USRNet has a multi-input apply; compare converter output against the
    x-FFT model tree via its own init with explicit inputs."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.usrnet import USRNet

    conv, build, _, _ = CASES["usrnet"]
    got = _shape_tree(conv(load_manifest("usrnet")))
    model = build()
    variables = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 9, 9, 1)), 2, jnp.zeros((1, 1, 1, 1))))
    want = _shape_tree({"params": variables["params"]})
    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in want)
