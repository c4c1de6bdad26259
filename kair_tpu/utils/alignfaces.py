"""Face alignment for the GPEN pipeline (reference: utils/utils_alignfaces.py
and main_test_face_enhancement.py): Umeyama similarity transform from the 5
detected landmarks to the canonical facial template, warp/crop, and paste
back with mask blending."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# canonical 5-point template for a 112x112 crop (reference
# utils_alignfaces.py get_reference_facial_points defaults)
REFERENCE_FACIAL_POINTS = np.array([
    [30.29459953, 51.69630051],
    [65.53179932, 51.50139999],
    [48.02519989, 71.73660278],
    [33.54930115, 92.3655014],
    [62.72990036, 92.20410156]], np.float32)
DEFAULT_CROP_SIZE = (96, 112)


def get_reference_facial_points(output_size=(256, 256)) -> np.ndarray:
    """Scale the canonical template to output_size (square path of the
    reference :99-183)."""
    tmp = REFERENCE_FACIAL_POINTS.copy()
    tmp_size = np.array(DEFAULT_CROP_SIZE, np.float32)
    # square-pad the 96x112 template then scale
    diff = max(tmp_size) - tmp_size
    tmp += diff[None, :] / 2
    tmp_size = np.array([max(tmp_size)] * 2, np.float32)
    scale = np.array(output_size, np.float32) / tmp_size
    return tmp * scale[None, :]


def umeyama(src: np.ndarray, dst: np.ndarray,
            estimate_scale: bool = True) -> np.ndarray:
    """Least-squares similarity transform (reference _umeyama :22-91,
    Umeyama IEEE PAMI 1991). Returns 3x3 homogeneous matrix."""
    num, dim = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_d = src - src_mean
    dst_d = dst - dst_mean
    A = dst_d.T @ src_d / num
    d = np.ones((dim,), np.float64)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    T = np.eye(dim + 1, dtype=np.float64)
    U, S, V = np.linalg.svd(A)
    rank = np.linalg.matrix_rank(A)
    if rank == 0:
        return T * np.nan
    if rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(V) > 0:
            T[:dim, :dim] = U @ V
        else:
            s = d[dim - 1]
            d[dim - 1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ V
            d[dim - 1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ V
    if estimate_scale:
        scale = 1.0 / src_d.var(axis=0).sum() * (S @ d)
    else:
        scale = 1.0
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean.T)
    T[:dim, :dim] *= scale
    return T


def warp_and_crop_face(src_img: np.ndarray, facial_pts: np.ndarray,
                       reference_pts: Optional[np.ndarray] = None,
                       crop_size: Tuple[int, int] = (256, 256)):
    """Align a face to the template (reference :207-258). Returns the crop
    and the 2x3 affine used (for pasting back)."""
    import cv2

    if reference_pts is None:
        reference_pts = get_reference_facial_points(crop_size)
    pts = np.asarray(facial_pts, np.float64).reshape(5, 2)
    tfm3 = umeyama(pts, np.asarray(reference_pts, np.float64))
    tfm = tfm3[:2]
    face = cv2.warpAffine(src_img, tfm, crop_size)
    return face, tfm


def paste_face_back(img: np.ndarray, face: np.ndarray,
                    tfm: np.ndarray) -> np.ndarray:
    """Inverse-warp the enhanced face and blend with a soft mask
    (main_test_face_enhancement.py paste-back behaviour)."""
    import cv2

    h, w = img.shape[:2]
    inv = cv2.invertAffineTransform(tfm)
    warped = cv2.warpAffine(face, inv, (w, h))
    mask = np.ones(face.shape[:2], np.float32)
    mask = cv2.warpAffine(mask, inv, (w, h))
    mask = cv2.erode(mask, np.ones((5, 5), np.uint8))
    mask = cv2.GaussianBlur(mask, (0, 0), 3)[..., None]
    return (warped * mask + img * (1 - mask)).astype(img.dtype)
