"""RetinaFace architecture + detection pipeline + alignment tests."""

import numpy as np
import pytest


@pytest.mark.slow
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


def test_retinaface_converter_structural():
    """convert_retinaface on a SYNTHESISED RetinaFace-R50 state dict (the
    exact torch key schema, facemodels/retinaface.py:72-87): the converted
    tree must match the flax model's own init structure and shapes, and
    the model must run — so the real checkpoint works the moment it is
    present (zero-egress here)."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.ckpt.torch_convert import convert_retinaface
    from kair_tpu.models.retinaface import RetinaFace

    rng = np.random.RandomState(0)
    sd = {}

    def w(*shape):
        # tame magnitudes: 50 random layers otherwise overflow f32
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    def add_convbn(name, cin, cout, k):
        sd[f"{name}.0.weight"] = w(cout, cin, k, k)
        sd[f"{name}.1.weight"] = (1 + 0.1 * rng.randn(cout)).astype(np.float32)
        sd[f"{name}.1.bias"] = w(cout)
        sd[f"{name}.1.running_mean"] = w(cout)
        sd[f"{name}.1.running_var"] = (1 + 0.1 * np.abs(
            rng.randn(cout))).astype(np.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = (1 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[f"{name}.bias"] = w(c)
        sd[f"{name}.running_mean"] = w(c)
        sd[f"{name}.running_var"] = (1 + 0.1 * np.abs(
            rng.randn(c))).astype(np.float32)

    sd["body.conv1.weight"] = w(64, 3, 7, 7)
    add_bn("body.bn1", 64)
    cin = 64
    for li, (planes, blocks) in enumerate([(64, 3), (128, 4), (256, 6),
                                           (512, 3)]):
        for bi in range(blocks):
            t = f"body.layer{li + 1}.{bi}"
            sd[f"{t}.conv1.weight"] = w(planes, cin, 1, 1)
            add_bn(f"{t}.bn1", planes)
            sd[f"{t}.conv2.weight"] = w(planes, planes, 3, 3)
            add_bn(f"{t}.bn2", planes)
            sd[f"{t}.conv3.weight"] = w(planes * 4, planes, 1, 1)
            add_bn(f"{t}.bn3", planes * 4)
            if bi == 0:
                sd[f"{t}.downsample.0.weight"] = w(planes * 4, cin, 1, 1)
                add_bn(f"{t}.downsample.1", planes * 4)
            cin = planes * 4
    for i, cin_f in enumerate([512, 1024, 2048]):
        add_convbn(f"fpn.output{i + 1}", cin_f, 256, 1)
    add_convbn("fpn.merge1", 256, 256, 3)
    add_convbn("fpn.merge2", 256, 256, 3)
    for i in (1, 2, 3):
        add_convbn(f"ssh{i}.conv3X3", 256, 128, 3)
        add_convbn(f"ssh{i}.conv5X5_1", 256, 64, 3)
        add_convbn(f"ssh{i}.conv5X5_2", 64, 64, 3)
        add_convbn(f"ssh{i}.conv7X7_2", 64, 64, 3)
        add_convbn(f"ssh{i}.conv7x7_3", 64, 64, 3)
    for i in range(3):
        for head, co in [("ClassHead", 4), ("BboxHead", 8),
                         ("LandmarkHead", 20)]:
            sd[f"{head}.{i}.conv1x1.weight"] = w(co, 256, 1, 1)
            sd[f"{head}.{i}.conv1x1.bias"] = w(co)

    variables = convert_retinaface(sd)
    model = RetinaFace()
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                    jnp.float32)
    ref_vars = model.init(jax.random.PRNGKey(0), x)
    got_shapes = jax.tree_util.tree_map(lambda a: np.shape(a), variables)
    want_shapes = jax.tree_util.tree_map(lambda a: np.shape(a), ref_vars)
    assert got_shapes == want_shapes
    bbox, cls, ldm = model.apply(variables, x)
    assert np.isfinite(np.asarray(bbox)).all()
