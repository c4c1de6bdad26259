"""Video restoration testing entry — counterpart of the reference
main_test_vrt.py:24-157 and main_test_rvrt.py:24-140: pick a task preset,
load the released torch checkpoint via the converters, select the test
dataset from the folder name (Vimeo/DAVIS/UCF101/Vid4/folder), run
temporally+spatially tiled inference, report PSNR/SSIM (+Y channel).

    python -m kair_tpu.cli.test_video \
        --task 001_VRT_videosr_bi_REDS_6frames \
        --model_path model_zoo/vrt/001_VRT_videosr_bi_REDS_6frames.pth \
        --folder_lq testsets/REDS4/sharp_bicubic --folder_gt testsets/REDS4/GT \
        --tile 40 128 128 --tile_overlap 2 20 20
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# task → model config (reference main_test_vrt.py:158-253,
# main_test_rvrt.py:141-198); values: (family, ctor kwargs, scale,
# window_size, nonblind)
VRT_TASKS = {
    "001_VRT_videosr_bi_REDS_6frames": dict(
        upscale=4, window_size=(6, 8, 8), depths=(8,) * 7 + (4,) * 6,
        embed_dims=(120,) * 7 + (180,) * 6, num_heads=(6,) * 13,
        pa_frames=2, deformable_groups=12),
    "002_VRT_videosr_bi_REDS_16frames": dict(
        upscale=4, window_size=(8, 8, 8), depths=(8,) * 7 + (4,) * 6,
        embed_dims=(120,) * 7 + (180,) * 6, num_heads=(6,) * 13,
        pa_frames=6, deformable_groups=24),
    "003_VRT_videosr_bi_Vimeo_7frames": dict(
        upscale=4, window_size=(8, 8, 8), depths=(8,) * 7 + (4,) * 6,
        embed_dims=(120,) * 7 + (180,) * 6, num_heads=(6,) * 13,
        pa_frames=4, deformable_groups=16),
    "004_VRT_videosr_bd_Vimeo_7frames": dict(
        upscale=4, window_size=(8, 8, 8), depths=(8,) * 7 + (4,) * 6,
        embed_dims=(120,) * 7 + (180,) * 6, num_heads=(6,) * 13,
        pa_frames=4, deformable_groups=16),
    "005_VRT_videodeblurring_DVD": dict(
        upscale=1, window_size=(6, 8, 8), depths=(8,) * 7 + (4,) * 4,
        embed_dims=(96,) * 7 + (120,) * 4, num_heads=(6,) * 11,
        pa_frames=2, deformable_groups=16),
    "006_VRT_videodeblurring_GoPro": dict(
        upscale=1, window_size=(6, 8, 8), depths=(8,) * 7 + (4,) * 4,
        embed_dims=(96,) * 7 + (120,) * 4, num_heads=(6,) * 11,
        pa_frames=2, deformable_groups=16),
    "007_VRT_videodeblurring_REDS": dict(
        upscale=1, window_size=(6, 8, 8), depths=(8,) * 7 + (4,) * 4,
        embed_dims=(96,) * 7 + (120,) * 4, num_heads=(6,) * 11,
        pa_frames=2, deformable_groups=16),
    "008_VRT_videodenoising_DAVIS": dict(
        upscale=1, window_size=(6, 8, 8), depths=(8,) * 7 + (4,) * 4,
        embed_dims=(96,) * 7 + (120,) * 4, num_heads=(6,) * 11,
        pa_frames=2, deformable_groups=16, nonblind_denoising=True),
    "009_VRT_videofi_Vimeo_4frames": dict(
        upscale=1, out_chans=3, window_size=(4, 8, 8),
        depths=(8,) * 7 + (4,) * 4, embed_dims=(96,) * 7 + (120,) * 4,
        num_heads=(6,) * 11, pa_frames=0, indep_reconsts=()),
}

RVRT_TASKS = {
    "001_RVRT_videosr_bi_REDS_30frames": dict(
        upscale=4, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(144, 144, 144), num_heads=(6, 6, 6),
        inputconv_groups=(1, 1, 1, 1, 1, 1), deformable_groups=12,
        attention_heads=12),
    "002_RVRT_videosr_bi_Vimeo_14frames": dict(
        upscale=4, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(144, 144, 144), num_heads=(6, 6, 6),
        inputconv_groups=(1, 1, 1, 1, 1, 1), deformable_groups=12,
        attention_heads=12),
    "003_RVRT_videosr_bd_Vimeo_14frames": dict(
        upscale=4, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(144, 144, 144), num_heads=(6, 6, 6),
        inputconv_groups=(1, 1, 1, 1, 1, 1), deformable_groups=12,
        attention_heads=12),
    "004_RVRT_videodeblurring_DVD_16frames": dict(
        upscale=1, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(192, 192, 192), num_heads=(6, 6, 6),
        inputconv_groups=(1, 3, 3, 3, 3, 3), deformable_groups=12,
        attention_heads=12),
    "005_RVRT_videodeblurring_GoPro_16frames": dict(
        upscale=1, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(192, 192, 192), num_heads=(6, 6, 6),
        inputconv_groups=(1, 3, 3, 3, 3, 3), deformable_groups=12,
        attention_heads=12),
    "006_RVRT_videodenoising_DAVIS_16frames": dict(
        upscale=1, clip_size=2, window_size=(2, 8, 8), num_blocks=(1, 2, 1),
        depths=(2, 2, 2), embed_dims=(192, 192, 192), num_heads=(6, 6, 6),
        inputconv_groups=(1, 3, 4, 6, 8, 4), deformable_groups=12,
        attention_heads=12, nonblind_denoising=True),
}


def build_task(task: str, model_path: str, fuse: bool = False,
               deform: str = "gather"):
    """(jitted forward, scale, window_size, nonblind) for a task preset.
    fuse=True enables the fused Pallas attention blocks (TMSA mutual+GEGLU
    groups for VRT; self-only STL blocks for RVRT)."""
    import jax
    from kair_tpu.ckpt import torch_convert as tc

    if task in VRT_TASKS:
        from kair_tpu.models.vrt import VRT
        cfg = VRT_TASKS[task]
        model = VRT(**cfg, fuse_block=fuse, deform_impl=deform)
        sd = tc.load_torch_state_dict(model_path, "params")
        variables = tc.convert_vrt(sd, depths=cfg["depths"],
                                   pa_frames=cfg["pa_frames"],
                                   upscale=cfg["upscale"])
    elif task in RVRT_TASKS:
        from kair_tpu.models.rvrt import RVRT
        cfg = RVRT_TASKS[task]
        model = RVRT(**cfg, fuse_block=fuse, deform_impl=deform)
        sd = tc.load_torch_state_dict(model_path, "params")
        variables = tc.convert_rvrt(sd, num_blocks=cfg["num_blocks"],
                                    depths=cfg["depths"],
                                    upscale=cfg["upscale"])
    else:
        known = sorted(VRT_TASKS) + sorted(RVRT_TASKS)
        raise KeyError(f"unknown task '{task}'; known tasks: {known}")

    fwd = jax.jit(lambda a: model.apply(variables, a))
    return (fwd, cfg["upscale"], cfg["window_size"],
            bool(cfg.get("nonblind_denoising")))


def select_dataset(args):
    """Dataset choice from folder names (reference main_test_vrt.py:46-70)."""
    from kair_tpu.data import dataset_video as dv

    lq = (args.folder_lq or "").lower()
    if "vimeo" in lq:
        meta = args.meta_info_file or os.path.join(
            os.path.dirname(args.folder_gt or args.folder_lq), "meta.txt")
        if "videofi" in args.task:
            return dv.VideoTestVimeo90KDataset({
                "dataroot_gt": args.folder_gt, "dataroot_lq": args.folder_gt,
                "meta_info_file": meta, "pad_sequence": False,
                "num_frame": 7, "temporal_scale": 2})
        return dv.VideoTestVimeo90KDataset({
            "dataroot_gt": args.folder_gt, "dataroot_lq": args.folder_lq,
            "meta_info_file": meta, "pad_sequence": True, "num_frame": 7})
    if "videofi" in args.task:
        if "davis" in lq:
            return dv.VFI_DAVIS(args.folder_gt)
        if "ucf101" in lq:
            return dv.VFI_UCF101(args.folder_gt)
        if "vid4" in lq:
            return dv.VFI_Vid4(args.folder_gt)
    if args.folder_gt is not None:
        return dv.VideoRecurrentTestDataset({
            "dataroot_gt": args.folder_gt, "dataroot_lq": args.folder_lq,
            "sigma": args.sigma})
    return dv.SingleVideoRecurrentTestDataset(
        {"dataroot_lq": args.folder_lq})


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str,
                        default="001_VRT_videosr_bi_REDS_6frames")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--sigma", type=int, default=0,
                        help="noise level for non-blind denoising tasks")
    parser.add_argument("--folder_lq", type=str, required=True)
    parser.add_argument("--folder_gt", type=str, default=None)
    parser.add_argument("--meta_info_file", type=str, default=None)
    parser.add_argument("--tile", type=int, nargs="+", default=[40, 128, 128],
                        help="[frames, h, w]; 0 to test that axis whole")
    parser.add_argument("--tile_overlap", type=int, nargs="+",
                        default=[2, 20, 20])
    parser.add_argument("--fuse", action="store_true",
                        help="fused Pallas attention blocks")
    parser.add_argument("--deform", choices=["gather", "mxu", "fused"],
                        default="gather",
                        help="deformable sampling path (Pallas 2-hot-matmul"
                             " kernel on small frames; 'fused' = one-pass "
                             "sample+attend GDA, rvrt only)")
    parser.add_argument("--save_result", action="store_true")
    parser.add_argument("--results", type=str, default="results")
    args = parser.parse_args(argv)

    from kair_tpu.eval.video_test import test_video
    from kair_tpu.utils import image as im
    from kair_tpu.utils.logger import setup_logger

    logger = setup_logger("test_video")
    fwd, scale, window_size, nonblind = build_task(
        args.task, args.model_path, fuse=args.fuse, deform=args.deform)
    if nonblind and args.sigma == 0:
        logger.warning("task %s is non-blind denoising but --sigma is 0; "
                       "pass e.g. --sigma 10", args.task)
    dataset = select_dataset(args)
    if len(dataset) == 0:
        raise SystemExit(f"No dataset found at {args.folder_lq}")

    save_dir = os.path.join(args.results, args.task)
    totals = {"psnr": [], "ssim": [], "psnr_y": [], "ssim_y": []}
    for idx in range(len(dataset)):
        ex = dataset.get_example(idx, None)
        lq, gt = ex["L"][None], ex.get("H")
        out = test_video(fwd, lq, sf=scale, window_size=window_size,
                         num_frame_testing=args.tile[0],
                         num_frame_overlapping=args.tile_overlap[0],
                         size_patch_testing=args.tile[1],
                         patch_overlap=args.tile_overlap[1])
        if "videofi" in args.task:
            out = out[:, :1]                      # reference :93-95
        elif "videosr" in args.task and "vimeo" in args.folder_lq.lower():
            out = out[:, 3:4]                     # centre frame only

        folder = str(ex.get("folder", idx))
        per = {"psnr": [], "ssim": [], "psnr_y": [], "ssim_y": []}
        for i in range(out.shape[1]):
            img = im.nhwc_to_uint(out[:, i])
            if args.save_result:
                os.makedirs(os.path.join(save_dir, folder), exist_ok=True)
                im.imsave(img, os.path.join(save_dir, folder, f"{i:08d}.png"))
            if gt is not None:
                img_gt = (np.clip(gt[i], 0, 1) * 255.0).round().astype(np.uint8)
                per["psnr"].append(im.calculate_psnr(img, img_gt, border=0))
                per["ssim"].append(im.calculate_ssim(img, img_gt, border=0))
                y = im.rgb2ycbcr(img.astype(np.float32) / 255.0) * 255.0
                y_gt = im.rgb2ycbcr(img_gt.astype(np.float32) / 255.0) * 255.0
                per["psnr_y"].append(im.calculate_psnr(y, y_gt, border=0))
                per["ssim_y"].append(im.calculate_ssim(y, y_gt, border=0))
        if gt is not None:
            means = {k: float(np.mean(v)) for k, v in per.items()}
            for k in totals:
                totals[k].append(means[k])
            logger.info(
                f"Testing {folder:20s} ({idx:2d}/{len(dataset)}) - "
                f"PSNR: {means['psnr']:.2f} dB; SSIM: {means['ssim']:.4f}; "
                f"PSNR_Y: {means['psnr_y']:.2f} dB; "
                f"SSIM_Y: {means['ssim_y']:.4f}")
        else:
            logger.info(f"Testing {folder:20s} ({idx:2d}/{len(dataset)})")

    if totals["psnr"]:
        avg = {k: float(np.mean(v)) for k, v in totals.items()}
        logger.info(
            f"{save_dir} -- Average PSNR: {avg['psnr']:.2f} dB; "
            f"SSIM: {avg['ssim']:.4f}; PSNR_Y: {avg['psnr_y']:.2f} dB; "
            f"SSIM_Y: {avg['ssim_y']:.4f}")
        return avg
    return None


if __name__ == "__main__":
    main()
