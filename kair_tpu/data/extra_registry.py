"""Registry extension point for dataset types implemented in their own
modules (usrnet / srmd / dpsr / blindsr / jpeg / video / spect)."""

from __future__ import annotations


def build(t: str, opt_ds: dict):
    if t in ("usrnet",):
        from kair_tpu.data.dataset_usrnet import DatasetUSRNet
        return DatasetUSRNet(opt_ds)
    if t in ("srmd",):
        from kair_tpu.data.dataset_srmd import DatasetSRMD
        return DatasetSRMD(opt_ds)
    if t in ("dpsr",):
        from kair_tpu.data.dataset_srmd import DatasetDPSR
        return DatasetDPSR(opt_ds)
    if t in ("dnpatch",):
        from kair_tpu.data.dataset_patch import DatasetDnPatch
        return DatasetDnPatch(opt_ds)
    if t in ("plainpatch",):
        from kair_tpu.data.dataset_patch import DatasetPlainPatch
        return DatasetPlainPatch(opt_ds)
    if t in ("blindsr",):
        from kair_tpu.data.dataset_blindsr import DatasetBlindSR
        return DatasetBlindSR(opt_ds)
    if t in ("jpeg",):
        from kair_tpu.data.dataset_jpeg import DatasetJPEG
        return DatasetJPEG(opt_ds)
    if t in ("spect",):
        from kair_tpu.data.dataset_spect import DatasetSPECT
        return DatasetSPECT(opt_ds)
    if t in ("spectpatch",):
        from kair_tpu.data.dataset_spect import DatasetSPECTPatch
        return DatasetSPECTPatch(opt_ds)
    if t in ("videorecurrenttraindataset", "video_train"):
        from kair_tpu.data.dataset_video import VideoRecurrentTrainDataset
        return VideoRecurrentTrainDataset(opt_ds)
    if t in ("videorecurrenttestdataset", "video_test"):
        from kair_tpu.data.dataset_video import VideoRecurrentTestDataset
        return VideoRecurrentTestDataset(opt_ds)
    raise NotImplementedError(f"dataset type [{t}] is not implemented yet")
