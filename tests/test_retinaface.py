"""RetinaFace architecture + detection pipeline + alignment tests."""

import numpy as np
import pytest


def test_retinaface_shapes():
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.retinaface import RetinaFace, prior_box

    model = RetinaFace()
    x = jnp.zeros((1, 128, 160, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    bbox, cls, ldm = model.apply(v, x)
    n_priors = prior_box((128, 160)).shape[0]
    assert bbox.shape == (1, n_priors, 4)
    assert cls.shape == (1, n_priors, 2)
    assert ldm.shape == (1, n_priors, 10)
    np.testing.assert_allclose(np.asarray(cls.sum(-1)), 1.0, atol=1e-5)


def test_priorbox_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference/retinaface")
    from layers.functions.prior_box import PriorBox
    from kair_tpu.models.retinaface import CFG_RE50, prior_box

    cfg = dict(CFG_RE50)
    ref = PriorBox({"min_sizes": cfg["min_sizes"], "steps": cfg["steps"],
                    "clip": cfg["clip"]}, image_size=(96, 128)).forward().numpy()
    got = prior_box((96, 128))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_decode_and_nms():
    from kair_tpu.models.retinaface import decode_boxes, decode_landms, nms

    priors = np.array([[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]], np.float32)
    loc = np.zeros((2, 4), np.float32)
    boxes = decode_boxes(loc, priors, [0.1, 0.2])
    np.testing.assert_allclose(boxes[0], [0.4, 0.4, 0.6, 0.6], atol=1e-6)
    lm = decode_landms(np.zeros((2, 10), np.float32), priors, [0.1, 0.2])
    np.testing.assert_allclose(lm[0], [0.5] * 10, atol=1e-6)

    dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
                     [50, 50, 60, 60, 0.7]], np.float32)
    keep = nms(dets, 0.4)
    assert keep == [0, 2]


def test_face_alignment_roundtrip():
    import cv2
    from kair_tpu.utils.alignfaces import (get_reference_facial_points,
                                           paste_face_back, warp_and_crop_face)

    rng = np.random.RandomState(0)
    img = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
    ref = get_reference_facial_points((256, 256))
    assert ref.shape == (5, 2)
    # a synthetic face at a known similarity transform of the template
    pts = ref * 0.5 + np.array([40, 30])
    face, tfm_inv = warp_and_crop_face(img, pts, crop_size=(256, 256))
    assert face.shape == (256, 256, 3)
    # warping the reference points by tfm_inv recovers the source points
    hom = np.concatenate([ref, np.ones((5, 1))], axis=1)
    mapped = hom @ tfm_inv.T
    np.testing.assert_allclose(mapped, pts, atol=1e-3)
    back = paste_face_back(img.astype(np.float32), face.astype(np.float32),
                           tfm_inv)
    assert back.shape == img.shape
