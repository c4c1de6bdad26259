"""Face-enhancement pipeline vs the reference orchestration
(main_test_face_enhancement.py:77-139) with mocked detector/enhancer —
end-to-end compositional parity without released weights."""

import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF = "/root/reference"


def _import_ref_alignfaces():
    """Import the reference's alignment module. It imports skimage only for
    an unused alias (utils_alignfaces.py:8 — the similarity path uses its
    own _umeyama), so stub it if absent."""
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        skimage.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = skimage.transform
    sys.path.insert(0, REF)
    try:
        from utils import utils_alignfaces
        return utils_alignfaces
    finally:
        sys.path.remove(REF)


def _reference_process(img_rgb, facebs, landms, enhancer, size, threshold):
    """The reference pipeline loop, executed with the REFERENCE's own
    alignment module as oracle (torch-free part of
    main_test_face_enhancement.py:77-139)."""
    ref_mod = _import_ref_alignfaces()
    get_reference_facial_points = ref_mod.get_reference_facial_points
    warp_and_crop_face = ref_mod.warp_and_crop_face

    mask = np.zeros((512, 512), np.float32)
    cv2.rectangle(mask, (26, 26), (486, 486), (1, 1, 1), -1, cv2.LINE_AA)
    mask = cv2.GaussianBlur(mask, (101, 101), 11)
    mask = cv2.GaussianBlur(mask, (101, 101), 11)
    kernel = np.array(([0.0625, 0.125, 0.0625],
                       [0.125, 0.25, 0.125],
                       [0.0625, 0.125, 0.0625]), dtype="float32")
    reference_5pts = get_reference_facial_points(
        (size, size), 0.25, (0, 0), True)

    height, width = img_rgb.shape[:2]
    full_mask = np.zeros((height, width), dtype=np.float32)
    full_img = np.zeros(img_rgb.shape, dtype=np.uint8)
    orig_faces, enhanced_faces = [], []
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
        tmp_mask = cv2.resize(mask, ef.shape[:2])
        tmp_mask = cv2.warpAffine(tmp_mask, tfm_inv, (width, height), flags=3)
        if min(fh, fw) < 100:
            ef = cv2.filter2D(ef, -1, kernel)
        tmp_img = cv2.warpAffine(ef, tfm_inv, (width, height), flags=3)
        m = tmp_mask - full_mask
        full_mask[np.where(m > 0)] = tmp_mask[np.where(m > 0)]
        full_img[np.where(m > 0)] = tmp_img[np.where(m > 0)]
    full_mask = full_mask[:, :, np.newaxis]
    out = cv2.convertScaleAbs(img_rgb * (1 - full_mask)
                              + full_img * full_mask)
    return out, orig_faces, enhanced_faces


def _fixture():
    rng = np.random.RandomState(11)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    # two synthetic faces (similarity transforms of the canonical template)
    # + one below-threshold detection
    from kair_tpu.utils.alignfaces import get_reference_facial_points
    tmpl = get_reference_facial_points((512, 512), 0.25, (0, 0), True)

    def face_at(scale, tx, ty):
        pts = tmpl * scale + np.array([tx, ty])          # (5,2)
        x0, y0 = pts.min(0) - 8
        x1, y1 = pts.max(0) + 8
        return pts, [x0, y0, x1, y1]

    pts_a, box_a = face_at(0.12, 40, 30)                 # small face (<100)
    pts_b, box_b = face_at(0.35, 150, 60)                # large face
    facebs = np.array([box_a + [0.98], box_b + [0.95],
                       box_b + [0.5]], np.float32)
    landms = np.stack([
        np.concatenate([pts_a[:, 0], pts_a[:, 1]]),      # [xs, ys] layout
        np.concatenate([pts_b[:, 0], pts_b[:, 1]]),
        np.concatenate([pts_b[:, 0], pts_b[:, 1]]),
    ]).astype(np.float32)

    def enhancer(face):
        # deterministic stand-in for GPEN: channel roll + contrast bump
        f = face.astype(np.float32)
        f = np.clip(1.2 * f[:, :, ::-1] + 5.0, 0, 255)
        return f.astype(np.uint8)

    return img, facebs, landms, enhancer


def test_face_pipeline_matches_reference():
    from kair_tpu.eval.face_pipeline import enhance_faces

    img, facebs, landms, enhancer = _fixture()
    detector = lambda img_bgr: (facebs, landms)

    want, want_of, want_ef = _reference_process(
        img, facebs, landms, enhancer, 512, 0.9)
    got, got_of, got_ef = enhance_faces(img, detector, enhancer,
                                        size=512, threshold=0.9)
    assert len(got_of) == len(want_of) == 2
    for a, b in zip(got_of, want_of):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(got_ef, want_ef):
        np.testing.assert_array_equal(a, b)
    # blended output: allow ±1 uint8 from float rounding differences
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_reference_points_match_reference_module():
    """get_reference_facial_points == the reference's for the GPEN crop."""
    from kair_tpu.utils.alignfaces import get_reference_facial_points
    ref_fn = _import_ref_alignfaces().get_reference_facial_points
    ours = get_reference_facial_points((512, 512), 0.25, (0, 0), True)
    theirs = np.asarray(ref_fn((512, 512), 0.25, (0, 0), True), np.float64)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
