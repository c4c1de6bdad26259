"""Tests for the option/config system semantics (vs reference utils_option.py)."""

import json
import os

from kair_tpu import config


OPT_JSON = """
{
  "task": "dncnn25"  // task name
  , "model": "plain"
  , "gpu_ids": [0, 1]
  , "scale": 1
  , "n_channels": 1
  , "datasets": {
    "train": {
      "name": "train_dataset"
      , "dataset_type": "dncnn"
      , "dataroot_H": "~/trainsets/trainH"  // path comment
      , "H_size": 40
      , "dataloader_batch_size": 16
      , "start_index": 0
      , "end_index": 400
    },
    "test": {
      "name": "test_dataset"
      , "dataset_type": "dncnn"
      , "dataroot_H": "testsets/set12"
    }
  }
  , "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1, "nc": 64, "nb": 17}
  , "path": {"root": "denoising", "pretrained_netG": null}
  , "train": {
      "max_epoch": 10
      , "G_scheduler_milestones_percent": [0.5, 0.75]
      , "G_lossfn_type": "l1"
      , "E_decay": 0.999
  }
}
"""


def write_opt(tmp_path):
    p = tmp_path / "opt.json"
    p.write_text(OPT_JSON)
    return str(p)


def test_comments_and_nonedict(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=True)
    assert opt["task"] == "dncnn25"
    assert opt["missing_key"] is None           # NoneDict
    assert opt["netG"]["missing"] is None       # nested NoneDict


def test_broadcast_and_paths(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=True)
    assert opt["datasets"]["train"]["scale"] == 1
    assert opt["datasets"]["train"]["n_channels"] == 1
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["dataroot_H"] == os.path.expanduser("~/trainsets/trainH")
    assert opt["path"]["task"] == os.path.join("denoising", "dncnn25")
    assert opt["path"]["models"].endswith("models")
    assert opt["netG"]["scale"] == 1


def test_derived_max_iter_and_milestones(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=True)
    # ceil(400/16)=25 iters/epoch * 10 epochs = 250
    assert opt["train"]["max_iter"] == 250
    assert opt["train"]["G_scheduler_milestones"] == [125, 187]


def test_defaults(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=True)
    t = opt["train"]
    assert t["G_optimizer_type"] == "adam"
    assert t["G_optimizer_betas"] == [0.9, 0.999]
    assert t["G_param_strict"] is True
    assert t["E_decay"] == 0.999
    assert t["F_feature_layer"] == 34
    assert opt["num_gpu"] == 2
    assert opt["dist"] is False


def test_test_mode_paths(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=False)
    assert opt["path"]["images"].endswith("test_images")
    assert "models" not in opt["path"]


def test_find_last_checkpoint(tmp_path):
    d = tmp_path / "models"
    d.mkdir()
    for it in (100, 250, 50):
        (d / f"{it}_G.pth").write_bytes(b"x")
    (d / "300_E.ckpt").write_bytes(b"x")
    it, path = config.find_last_checkpoint(str(d), "G")
    assert it == 250 and path.endswith("250_G.pth")
    it, path = config.find_last_checkpoint(str(d), "E")
    assert it == 300 and path.endswith("300_E.ckpt")
    it, path = config.find_last_checkpoint(str(d), "optimizerG", pretrained_path=None)
    assert it == 0 and path is None


def test_save_snapshot(tmp_path):
    opt = config.parse(write_opt(tmp_path), is_train=True)
    opt["path"]["options"] = str(tmp_path / "opts")
    dump = config.save(opt)
    assert os.path.exists(dump)
    with open(dump) as f:
        loaded = json.load(f)
    assert loaded["task"] == "dncnn25"
