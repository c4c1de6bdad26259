"""Auxiliary subsystems: BN merge, receptive field, config generator,
metrics logger, eval harness, patch datasets, LPIPS architecture."""

import json
import os

import numpy as np
import pytest


def test_bn_merge_matches_bn_forward():
    """ConvBlock('CBR') with BN folded == original eval forward."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.ops.blocks import ConvBlock
    from kair_tpu.utils.bnorm import merge_bn_convblocks

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 12, 12, 4), jnp.float32)
    model_bn = ConvBlock(8, mode="CBR")
    v = model_bn.init(jax.random.PRNGKey(0), x)
    # give BN non-trivial stats/affine
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = {"m01": {"bn": {"mean": jnp.asarray(rng.rand(8), jnp.float32),
                            "var": jnp.asarray(rng.rand(8) + 0.5, jnp.float32)}}}
    params = dict(v["params"])
    params["m01"] = {"bn": {"scale": jnp.asarray(rng.rand(8) + 0.5, jnp.float32),
                            "bias": jnp.asarray(rng.rand(8), jnp.float32)}}
    want = model_bn.apply({"params": params, "batch_stats": stats}, x, train=False)

    merged = merge_bn_convblocks(params, stats)
    model_r = ConvBlock(8, mode="CR")
    got = model_r.apply({"params": {"m00": merged["m00"]}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_receptive_field():
    from kair_tpu.utils.receptivefield import effective_receptive_field

    # 17 conv3x3 layers (DnCNN): rf = 1 + 17*2 = 35
    assert effective_receptive_field([(3, 1, 1)] * 17) == 35


def test_config_generator(tmp_path):
    from kair_tpu.cli.config_generator import generate_all, remove_json_comments

    (tmp_path / "template.json").write_text(
        '{\n  "task": "{{TASK}}",  // name\n  "netG": "{{NETWORK_CONFIG}}",\n'
        '  "lr": "{{LR}}", "pre": "{{PRE}}"\n}')
    (tmp_path / "networks.json").write_text(
        '{"dncnn": {"net_type": "dncnn", "nb": 17}}')
    (tmp_path / "exps.json").write_text(json.dumps({"experiments": {
        "exp_a": {"TASK": "a", "NETWORK_CONFIG": "dncnn", "LR": 1e-4,
                  "PRE": None}}}))
    written = generate_all(str(tmp_path / "template.json"),
                           str(tmp_path / "networks.json"),
                           str(tmp_path / "exps.json"), str(tmp_path / "out"))
    cfg = json.loads(remove_json_comments(open(written["exp_a"]).read()))
    assert cfg["task"] == "a"
    assert cfg["netG"]["nb"] == 17
    assert cfg["lr"] == 1e-4
    assert cfg["pre"] is None


def test_metrics_logger(tmp_path):
    from kair_tpu.utils.metrics_log import MetricsLogger

    ml = MetricsLogger(str(tmp_path))
    for step in range(5):
        ml.log(step, {"psnr": 20 + step, "ssim": 0.5 + step * 0.05,
                      "loss": 1.0 / (step + 1)})
    assert ml.best("psnr")["step"] == 4
    paths = ml.plot_correlations()
    assert all(os.path.exists(p) for p in paths) and paths
    # reload persists history
    ml2 = MetricsLogger(str(tmp_path))
    assert len(ml2.rows) == 5


def test_eval_harness():
    from kair_tpu.eval.harness import evaluate_images

    rng = np.random.default_rng(0)
    h = [rng.poisson(50, (32, 32, 2)).astype(np.float64) for _ in range(3)]
    e_good = [x + rng.normal(0, 1, x.shape) for x in h]
    e_bad = [x + rng.normal(0, 20, x.shape) for x in h]
    m_good = evaluate_images(e_good, h)
    m_bad = evaluate_images(e_bad, h)
    assert m_good["psnr"] > m_bad["psnr"]
    assert m_good["ssim"] > m_bad["ssim"]
    assert m_good["pll"] > m_bad["pll"]
    m_poisson = evaluate_images(e_good, h, add_poisson_noise=True)
    assert m_poisson["psnr"] < m_good["psnr"]  # re-noised is worse


def test_patch_datasets(tmp_path):
    import cv2
    from kair_tpu.data.datasets import define_dataset

    root = tmp_path / "H"; root.mkdir()
    rootL = tmp_path / "L"; rootL.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        img = (rng.rand(80, 80, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f"{i}.png"), img)
        cv2.imwrite(str(rootL / f"{i}.png"), img // 2)
    ds = define_dataset({"dataset_type": "dnpatch", "dataroot_H": str(root),
                         "n_channels": 1, "H_size": 32,
                         "num_patches_per_image": 4, "sigma": 25})
    assert len(ds) == 8
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["L"].shape == (32, 32, 1)
    ds2 = define_dataset({"dataset_type": "plainpatch",
                          "dataroot_H": str(root), "dataroot_L": str(rootL),
                          "H_size": 16, "num_patches_per_image": 2})
    ex2 = ds2.get_example(1, np.random.default_rng(1))
    assert ex2["L"].shape == (16, 16, 3)
    assert ex2["L"].mean() < ex2["H"].mean()  # L is the darker image


def test_lpips_architecture():
    """No pretrained weights in this env: check the architecture runs and
    the loader refuses random weights."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.lpips_jax import LPIPSAlex, load_lpips

    m = LPIPSAlex()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, x)
    d = m.apply(v, x, x)
    assert d.shape == (1,)
    assert float(d[0]) == 0.0  # identical inputs → zero distance
    with pytest.raises(FileNotFoundError):
        load_lpips(None, None)
