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
    if t in ("videorecurrenttrainnonblinddenoisingdataset", "video_train_dn"):
        from kair_tpu.data.dataset_video import (
            VideoRecurrentTrainNonblindDenoisingDataset)
        return VideoRecurrentTrainNonblindDenoisingDataset(opt_ds)
    if t in ("videorecurrenttrainvimeodataset", "video_train_vimeo"):
        from kair_tpu.data.dataset_video import VideoRecurrentTrainVimeoDataset
        return VideoRecurrentTrainVimeoDataset(opt_ds)
    if t in ("videorecurrenttrainvimeovfidataset", "video_train_vimeo_vfi"):
        from kair_tpu.data.dataset_video import (
            VideoRecurrentTrainVimeoVFIDataset)
        return VideoRecurrentTrainVimeoVFIDataset(opt_ds)
    if t in ("singlevideorecurrenttestdataset", "video_test_single"):
        from kair_tpu.data.dataset_video import SingleVideoRecurrentTestDataset
        return SingleVideoRecurrentTestDataset(opt_ds)
    if t in ("videotestvimeo90kdataset", "video_test_vimeo"):
        from kair_tpu.data.dataset_video import VideoTestVimeo90KDataset
        return VideoTestVimeo90KDataset(opt_ds)
    if t in ("vfi_davis",):
        from kair_tpu.data.dataset_video import VFI_DAVIS
        return VFI_DAVIS(opt_ds["dataroot_lq"])
    if t in ("vfi_ucf101",):
        from kair_tpu.data.dataset_video import VFI_UCF101
        return VFI_UCF101(opt_ds["dataroot_lq"])
    if t in ("vfi_vid4",):
        from kair_tpu.data.dataset_video import VFI_Vid4
        return VFI_Vid4(opt_ds["dataroot_lq"])
    raise NotImplementedError(f"dataset type [{t}] is not implemented yet")
