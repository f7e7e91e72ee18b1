import jax.numpy as jnp
import numpy as np

from dtlr_tpu.utils import boxes as B


def _rand_boxes(rng, n):
    cx = rng.uniform(0.2, 0.8, n)
    cy = rng.uniform(0.2, 0.8, n)
    w = rng.uniform(0.05, 0.3, n)
    h = rng.uniform(0.05, 0.3, n)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_cxcywh_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_boxes(rng, 32)
    out = B.box_xyxy_to_cxcywh(B.box_cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_giou_matches_iou_for_identical():
    rng = np.random.default_rng(1)
    b = B.box_cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 8)))
    giou = B.generalized_box_iou(b, b)
    np.testing.assert_allclose(np.asarray(jnp.diag(giou)), 1.0, atol=1e-5)


def test_iou_disjoint_is_zero():
    a = jnp.asarray([[0.0, 0.0, 0.1, 0.1]])
    c = jnp.asarray([[0.5, 0.5, 0.9, 0.9]])
    iou, _ = B.pairwise_box_iou(a, c)
    assert float(iou[0, 0]) == 0.0
    giou = B.generalized_box_iou(a, c)
    assert float(giou[0, 0]) < 0.0  # GIoU penalizes the gap


def test_giou_matches_torchvision_formula():
    # golden values computed by hand for one pair
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    iou, union = B.pairwise_box_iou(a, b)
    np.testing.assert_allclose(float(iou[0, 0]), 1.0 / 7.0, atol=1e-6)
    giou = B.generalized_box_iou(a, b)
    # enclosing box area 9, union 7 -> giou = 1/7 - 2/9
    np.testing.assert_allclose(float(giou[0, 0]), 1.0 / 7.0 - 2.0 / 9.0, atol=1e-6)


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    y = B.inverse_sigmoid(x)
    np.testing.assert_allclose(np.asarray(1 / (1 + np.exp(-y))), np.asarray(x), atol=1e-4)
