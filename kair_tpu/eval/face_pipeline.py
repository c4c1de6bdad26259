"""Blind face enhancement pipeline: detect → align → GPEN → paste back
(reference main_test_face_enhancement.py:77-139).

The torch-free orchestration (mask building, alignment, inverse-affine
paste-back with progressive mask accumulation) mirrors the reference
exactly; the compute stages are injected callables so the pipeline is
testable against the reference without released weights:

  detector(img_bgr_uint8) -> (facebs (N,5 incl. score), landms (N,10))
  enhancer(face_rgb_uint8 (size,size,3)) -> enhanced uint8, same shape
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

from kair_tpu.utils.alignfaces import (get_reference_facial_points,
                                       warp_and_crop_face)


def make_blend_mask(size: int = 512) -> np.ndarray:
    """Soft rectangular blend mask (reference :85-89): anti-aliased
    rectangle (26,26)-(486,486) at 512, blurred twice with a (101,101)
    sigma-11 Gaussian. The reference always builds at 512 and resizes to
    the face size afterwards, so the feather width is a fixed fraction of
    the face — build at 512 and resize here too (ADVICE r3)."""
    import cv2

    mask = np.zeros((512, 512), np.float32)
    cv2.rectangle(mask, (26, 26), (486, 486), (1, 1, 1), -1, cv2.LINE_AA)
    mask = cv2.GaussianBlur(mask, (101, 101), 11)
    mask = cv2.GaussianBlur(mask, (101, 101), 11)
    if size != 512:
        mask = cv2.resize(mask, (size, size))
    return mask


_SMOOTH3 = np.array([[0.0625, 0.125, 0.0625],
                     [0.125, 0.25, 0.125],
                     [0.0625, 0.125, 0.0625]], np.float32)


def enhance_faces(img_rgb: np.ndarray,
                  detector: Callable,
                  enhancer: Callable,
                  size: int = 512,
                  threshold: float = 0.9):
    """Full-image face enhancement (reference process(), :102-139).

    img_rgb uint8 (H, W, 3). Returns (enhanced_img uint8, orig_faces,
    enhanced_faces)."""
    import cv2

    img_bgr = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR)
    facebs, landms = detector(img_bgr)

    reference_5pts = get_reference_facial_points(
        (size, size), inner_padding_factor=0.25, outer_padding=(0, 0),
        default_square=True)
    blend_mask = make_blend_mask(size)

    orig_faces: List[np.ndarray] = []
    enhanced_faces: List[np.ndarray] = []
    height, width = img_rgb.shape[:2]
    full_mask = np.zeros((height, width), np.float32)
    full_img = np.zeros(img_rgb.shape, np.uint8)

    for faceb, facial5points in zip(facebs, landms):
        if faceb[4] < threshold:
            continue
        fh, fw = (faceb[3] - faceb[1]), (faceb[2] - faceb[0])
        facial5points = np.reshape(facial5points, (2, 5))

        of, tfm_inv = warp_and_crop_face(
            img_rgb, facial5points, reference_pts=reference_5pts,
            crop_size=(size, size))
        ef = enhancer(of)
        orig_faces.append(of)
        enhanced_faces.append(ef)

        tmp_mask = cv2.resize(blend_mask, ef.shape[:2])
        tmp_mask = cv2.warpAffine(tmp_mask, tfm_inv, (width, height), flags=3)
        if min(fh, fw) < 100:       # Gaussian filter for small faces
            ef = cv2.filter2D(ef, -1, _SMOOTH3)
        tmp_img = cv2.warpAffine(ef, tfm_inv, (width, height), flags=3)

        mask = tmp_mask - full_mask
        full_mask[np.where(mask > 0)] = tmp_mask[np.where(mask > 0)]
        full_img[np.where(mask > 0)] = tmp_img[np.where(mask > 0)]

    full_mask = full_mask[:, :, np.newaxis]
    out = cv2.convertScaleAbs(img_rgb * (1 - full_mask)
                              + full_img * full_mask)
    return out, orig_faces, enhanced_faces


def make_gpen_enhancer(apply_fn, size: int = 512) -> Callable:
    """GPEN single-face enhancer (reference faceenhancer.process, :62-75):
    resize → [-1,1] → FullGenerator → [0,1] → uint8. apply_fn maps an
    NHWC float32 batch in [-1,1] to the enhanced batch."""
    import cv2

    def enhance(face_rgb: np.ndarray) -> np.ndarray:
        f = cv2.resize(face_rgb, (size, size))
        x = f.astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        y = np.asarray(apply_fn(x[None]))[0]
        y = np.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return (y * 255.0 + 0.5).astype(np.uint8)

    return enhance


def make_retinaface_detector(apply_fn, threshold: float = 0.9) -> Callable:
    """RetinaFace detector callable (reference RetinaFaceDetection.detect):
    img_bgr uint8 → (facebs (N,5), landms (N,10) in [x1..x5, y1..y5]
    layout, retinaface_detection.py:120-123).

    Deliberate divergence: the reference re-sorts landms ascending by score
    but leaves dets descending (:115-119), mispairing boxes and landmarks
    on multi-face images; we keep them aligned."""
    from kair_tpu.models.retinaface import detect_faces

    def detect(img_bgr: np.ndarray):
        dets, lms = detect_faces(apply_fn, img_bgr.astype(np.float32),
                                 confidence_threshold=threshold)
        # interleaved (x1,y1,...) → (x1..x5, y1..y5)
        lms = lms.reshape(-1, 5, 2).transpose(0, 2, 1).reshape(-1, 10)
        return dets, lms

    return detect
