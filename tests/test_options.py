"""Shipped training recipes (`options/`) must parse and build out of the box.

The reference ships ready-to-run JSON recipes (`options/train_dncnn.json`,
`options/swinir/*.json`, `options/vrt/001_...json`); this guards our
TPU-tuned equivalents: every file parses through the option layer, its
netG builds through the registry, and its trainer class resolves.  The
SPECT template set must expand through the config generator and produce
parseable configs (fork: SPECToptions/config_generator.py).
"""

import glob
import json
import os

import pytest

from kair_tpu import config as opt_util
from kair_tpu.cli.config_generator import generate_all, remove_json_comments
from kair_tpu.models.registry import define_g
from kair_tpu.train.select import define_trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPTION_FILES = sorted(
    glob.glob(os.path.join(REPO, "options", "*.json"))
    + glob.glob(os.path.join(REPO, "options", "swinir", "*.json"))
    + glob.glob(os.path.join(REPO, "options", "vrt", "*.json"))
)


def test_options_shipped():
    assert len(OPTION_FILES) >= 8, OPTION_FILES


@pytest.mark.parametrize("path", OPTION_FILES, ids=os.path.basename)
def test_option_parses_and_builds(path):
    opt = opt_util.parse(path, is_train=True)
    assert opt["task"]
    assert "train" in opt and "datasets" in opt
    # netG must resolve through the registry (constructs the flax module
    # definition only — no params are materialised).
    model = define_g(opt)
    assert model is not None
    # trainer class must resolve for the declared model kind; perceptual-loss
    # trainers refuse to run without converted VGG19 weights (weights-gated
    # in this zero-egress environment) — that gate firing still proves the
    # config reached the trainer intact.
    try:
        trainer = define_trainer(opt)
        assert trainer is not None
    except ValueError as e:
        assert "VGG19 weights" in str(e)
    # milestones / max_iter plumbing must have produced usable ints
    tr = opt["train"]
    if tr.get("G_scheduler_type") == "MultiStepLR":
        ms = tr.get("G_scheduler_milestones")
        assert ms and all(isinstance(m, int) for m in ms)


def test_gan_option_has_discriminator():
    opt = opt_util.parse(
        os.path.join(REPO, "options", "train_msrresnet_gan.json"), is_train=True)
    assert opt["netD"]["net_type"] == "discriminator_vgg_96"
    from kair_tpu.models.registry import define_d
    assert define_d(opt) is not None


def test_spect_templates_generate(tmp_path):
    spect = os.path.join(REPO, "options", "spect")
    written = generate_all(
        os.path.join(spect, "base_template.json"),
        os.path.join(spect, "network_configs.json"),
        os.path.join(spect, "experiment_configs.json"),
        str(tmp_path))
    assert len(written) >= 3
    for name, path in written.items():
        opt = opt_util.parse(path, is_train=True)
        # max_iter must derive from max_epoch + start/end indices
        assert opt["train"]["max_iter"] > 0
        assert opt["train"]["G_scheduler_milestones"]
        assert define_g(opt) is not None


def test_vrt_option_tpu_knobs():
    opt = opt_util.parse(
        os.path.join(REPO, "options", "vrt",
                     "001_train_vrt_videosr_bi_reds_6frames.json"), is_train=True)
    assert opt["netG"]["fuse_block"] is True
    assert opt["netG"]["deform_impl"] in ("auto", "gather", "mxu", "fused")
    assert opt["train"]["fix_iter"] == 20000
    assert opt["model"] == "vrt"
