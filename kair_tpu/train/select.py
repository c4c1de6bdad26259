"""Trainer registry — counterpart of models/select_model.py:9-33
(plain | plain2 | plain4 | gan | vrt)."""

from __future__ import annotations

from typing import Any, Optional


def define_trainer(opt: dict, dtype: Optional[Any] = None):
    model = (opt.get("model") or "plain").lower()
    if model == "plain":
        from kair_tpu.train.trainer import PlainTrainer
        return PlainTrainer(opt, extra_keys=(), dtype=dtype)
    if model == "plain2":
        # (L, C) feed — FFDNet noise-level conditioning (model_plain2.py:9-19)
        from kair_tpu.train.trainer import PlainTrainer
        return PlainTrainer(opt, extra_keys=("C",), dtype=dtype)
    if model == "plain4":
        # (L, k, sf, sigma) feed — USRNet (model_plain4.py:8-23)
        from kair_tpu.train.trainer import PlainTrainer
        return PlainTrainer(opt, extra_keys=("k", "sf", "sigma"), dtype=dtype)
    if model == "gan":
        from kair_tpu.train.gan import GanTrainer
        return GanTrainer(opt, dtype=dtype)
    if model == "vrt":
        from kair_tpu.train.video import VideoTrainer
        return VideoTrainer(opt, dtype=dtype)
    raise NotImplementedError(f"model [{model}] is not defined")
