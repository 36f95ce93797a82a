"""Tests for detection building blocks: boxes, NMS, losses, ATSS, anchors,
ROIAlign."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection import anchors as anchor_lib
from fiber_tpu.detection import atss, boxes, losses, roi_align


def test_box_iou_known_values():
    a = jnp.array([[0., 0., 10., 10.]])
    b = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.],
                   [20., 20., 30., 30.]])
    iou = boxes.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]),
                               [1.0, 25. / 175., 0.0], atol=1e-6)


def test_giou_properties():
    a = jnp.array([[0., 0., 10., 10.]])
    same = boxes.pairwise_giou(a, a)
    np.testing.assert_allclose(np.asarray(same), [1.0], atol=1e-6)
    far = boxes.pairwise_giou(a, jnp.array([[100., 100., 110., 110.]]))
    assert far[0] < 0  # disjoint boxes have negative GIoU


def test_nms_suppresses_overlaps():
    b = jnp.array([
        [0., 0., 10., 10.],
        [1., 1., 11., 11.],    # overlaps box 0 heavily
        [50., 50., 60., 60.],
        [51., 51., 61., 61.],  # overlaps box 2 heavily
    ])
    s = jnp.array([0.9, 0.8, 0.95, 0.3])
    keep, ok = boxes.nms(b, s, iou_threshold=0.5, max_outputs=4)
    kept = [int(k) for k, o in zip(keep, ok) if bool(o)]
    assert kept == [2, 0]


def test_nms_respects_validity_mask():
    b = jnp.array([[0., 0., 10., 10.], [50., 50., 60., 60.]])
    s = jnp.array([0.5, 0.9])
    keep, ok = boxes.nms(b, s, 0.5, 2, valid=jnp.array([True, False]))
    kept = [int(k) for k, o in zip(keep, ok) if bool(o)]
    assert kept == [0]


def test_ml_nms_keeps_cross_class_overlaps():
    b = jnp.array([[0., 0., 10., 10.], [1., 1., 11., 11.]])
    s = jnp.array([0.9, 0.8])
    labels = jnp.array([0, 1])
    keep, ok = boxes.ml_nms(b, s, labels, 0.5, 2)
    assert int(ok.sum()) == 2  # different classes -> both survive


def test_box_encode_decode_roundtrip():
    anchors = jnp.array([[10., 10., 50., 60.], [0., 0., 100., 100.]])
    gt = jnp.array([[12., 8., 48., 66.], [10., 20., 80., 90.]])
    deltas = boxes.encode_boxes(gt, anchors)
    back = boxes.decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


def test_sigmoid_focal_loss_matches_manual():
    logits = jnp.array([[2.0, -1.0]])
    targets = jnp.array([1])  # class 1 (1-based) = first column positive
    out = losses.sigmoid_focal_loss(logits, targets, num_classes=2)
    p = jax.nn.sigmoid(2.0)
    expected_pos = -0.25 * (1 - p) ** 2 * np.log(p)
    np.testing.assert_allclose(float(out[0, 0]), expected_pos, rtol=1e-5)
    p2 = jax.nn.sigmoid(-1.0)
    expected_neg = -0.75 * p2 ** 2 * np.log(1 - p2)
    np.testing.assert_allclose(float(out[0, 1]), expected_neg, rtol=1e-5)


def test_token_focal_loss_masks_text():
    logits = jnp.zeros((2, 4))
    targets = jnp.array([[1., 0., 0., 0.], [0., 1., 0., 0.]])
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 0, 0]])
    out = losses.token_sigmoid_focal_loss(logits, targets, text_mask=mask)
    assert float(out[:, 2:].sum()) == 0.0
    assert float(out[:, :2].sum()) > 0.0


def test_centerness():
    # centered anchor -> centerness 1
    t = jnp.array([[5., 5., 5., 5.]])
    np.testing.assert_allclose(np.asarray(losses.centerness_targets(t)),
                               [1.0], atol=1e-6)
    t = jnp.array([[1., 5., 9., 5.]])
    np.testing.assert_allclose(np.asarray(losses.centerness_targets(t)),
                               [np.sqrt(1. / 9.)], atol=1e-6)


def test_anchor_generator_shapes_and_centers():
    a = anchor_lib.grid_anchors(4, 4, stride=8, size=64)
    assert a.shape == (16, 4)
    # first anchor centered at (0, 0) with side 64
    np.testing.assert_allclose(a[0], [-32, -32, 32, 32])
    # second anchor shifted by stride in x
    np.testing.assert_allclose(a[1], [-24, -32, 40, 32])


def test_atss_assignment_prefers_matching_anchor():
    level_sizes = (16, 4)
    lvl0 = anchor_lib.grid_anchors(4, 4, stride=8, size=8)
    lvl1 = anchor_lib.grid_anchors(2, 2, stride=16, size=16)
    anchors = jnp.asarray(np.concatenate([lvl0, lvl1]))
    gt = jnp.array([[4., 4., 14., 14.], [0., 0., 0., 0.]])
    valid = jnp.array([True, False])
    out = atss.atss_assign(anchors, level_sizes, gt, valid, topk=4)
    assert bool(out.pos_mask.any())
    # every positive anchor is assigned to gt 0 (gt 1 is padding)
    assert int(jnp.where(out.pos_mask, out.assigned_gt, 0).max()) == 0
    # the anchor whose center is inside gt0 and closest should be positive
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    d = jnp.linalg.norm(centers - jnp.array([9., 9.]), axis=-1)
    best = int(jnp.argmin(jnp.where(out.pos_mask, d, 1e9)))
    assert bool(out.pos_mask[best])


def test_atss_batched():
    level_sizes = (16,)
    anchors = jnp.asarray(anchor_lib.grid_anchors(4, 4, stride=8, size=8))
    gt = jnp.stack([jnp.array([[4., 4., 14., 14.]]),
                    jnp.array([[16., 16., 30., 30.]])])
    valid = jnp.ones((2, 1), bool)
    out = atss.batched_atss_assign(anchors, level_sizes, gt, valid, topk=4)
    assert out.pos_mask.shape == (2, 16)
    assert bool(out.pos_mask[0].any()) and bool(out.pos_mask[1].any())


def test_roi_align_constant_field():
    feat = jnp.ones((8, 8, 3)) * 5.0
    rois = jnp.array([[0., 0., 16., 16.]])  # full image at scale 0.5
    out = roi_align.roi_align(feat, rois, output_size=2, spatial_scale=0.5)
    assert out.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_gradient_flows():
    feat = jnp.arange(8 * 8 * 1, dtype=jnp.float32).reshape(8, 8, 1)
    rois = jnp.array([[2., 2., 6., 6.]])

    def f(feat):
        return roi_align.roi_align(feat, rois, 2, 1.0).sum()

    g = jax.grad(f)(feat)
    assert jnp.isfinite(g).all()
    assert float(jnp.abs(g).sum()) > 0
