"""Shape/grad tests for the alternative detection heads (RPN / RetinaNet /
FCOS / plain ATSS) and the DETR set loss (ref registry
modeling/rpn/__init__.py:10-25, layers/set_loss.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.detection import alt_heads
from fiber_tpu.detection.anchors import fpn_anchors
from fiber_tpu.detection.matcher import balanced_sample, match_quality
from fiber_tpu.detection.set_loss import hungarian_match, set_criterion

FEAT_SIZES = ((8, 8), (4, 4))
STRIDES = (8, 16)
SIZES = (64, 128)
C_IN = 16
B = 2


def _features(rng):
    return [jax.random.normal(k, (B, h, w, C_IN))
            for k, (h, w) in zip(jax.random.split(rng, len(FEAT_SIZES)),
                                 FEAT_SIZES)]


def _gts():
    gt_boxes = jnp.asarray([[[4., 4., 30., 30.], [10., 20., 60., 50.]],
                            [[8., 8., 40., 44.], [0., 0., 0., 0.]]])
    gt_labels = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True], [True, False]])
    return gt_boxes, gt_labels, gt_valid


def _anchors():
    per_level = fpn_anchors(FEAT_SIZES, strides=STRIDES, sizes=SIZES)
    return per_level, jnp.concatenate(
        [jnp.asarray(a) for a in per_level], axis=0)


def test_matcher_semantics():
    quality = jnp.asarray([[0.8, 0.2, 0.45, 0.05],
                           [0.1, 0.6, 0.35, 0.02]])
    valid = jnp.asarray([True, True])
    m = match_quality(quality, valid, high=0.5, low=0.3)
    np.testing.assert_array_equal(np.asarray(m), [0, 1, -2, -1])
    # low-quality restore: anchor 2 is gt-0's... best tie handling
    m2 = match_quality(quality, valid, high=0.9, low=0.9,
                       allow_low_quality=True)
    # each gt's best anchor is restored despite thresholds
    assert int(m2[0]) == 0 and int(m2[1]) == 1


def test_balanced_sample_budget():
    pos = jnp.asarray([True] * 3 + [False] * 17)
    neg = jnp.asarray([False] * 3 + [True] * 17)
    ps, ns = balanced_sample(pos, neg, jax.random.PRNGKey(0), 8, 0.5)
    assert int(ps.sum()) == 3          # fewer positives than budget
    assert int(ns.sum()) == 5          # remainder filled with negatives
    assert not bool((ps & ~pos).any())
    assert not bool((ns & ~neg).any())


@pytest.mark.parametrize("name", ["RPN", "RETINA", "FCOS", "ATSS"])
def test_head_shapes_and_grads(name):
    rng = jax.random.PRNGKey(0)
    feats = _features(rng)
    gt_boxes, gt_labels, gt_valid = _gts()
    per_level, anchors = _anchors()
    level_sizes = [a.shape[0] for a in per_level]
    num_classes = 4

    head = alt_heads.build_head(name, channels=16, num_classes=num_classes,
                                num_levels=len(FEAT_SIZES))
    variables = head.init(jax.random.PRNGKey(1), feats)

    def loss_fn(params):
        out = head.apply({"params": params}, feats)
        if name == "RPN":
            losses = alt_heads.rpn_loss(out, anchors, gt_boxes, gt_valid,
                                        jax.random.PRNGKey(2),
                                        batch_per_image=32)
        elif name == "RETINA":
            losses = alt_heads.retinanet_loss(out, anchors, gt_boxes,
                                              gt_labels, gt_valid,
                                              num_classes)
        elif name == "FCOS":
            losses = alt_heads.fcos_loss(out, FEAT_SIZES, gt_boxes,
                                         gt_labels, gt_valid, num_classes,
                                         strides=STRIDES)
        else:
            losses = alt_heads.plain_atss_loss(out, anchors, level_sizes,
                                               gt_boxes, gt_labels,
                                               gt_valid, num_classes)
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total)), losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_rpn_proposals_shapes():
    rng = jax.random.PRNGKey(3)
    feats = _features(rng)
    per_level, _ = _anchors()
    head = alt_heads.build_head("RPN", channels=16, num_classes=1)
    variables = head.init(jax.random.PRNGKey(1), feats)
    out = head.apply(variables, feats)
    boxes, scores, ok = alt_heads.rpn_proposals(
        out, [jnp.asarray(a) for a in per_level],
        jnp.asarray([[64., 64.]] * B), pre_nms_top_n=50,
        post_nms_top_n=10)
    assert boxes.shape == (B, 10, 4)
    assert scores.shape == (B, 10)
    assert bool(ok.any())
    # proposals are clipped to the image
    assert float(boxes.max()) <= 63.0 + 1e-5
    assert float(boxes.min()) >= 0.0


def test_hungarian_match_is_optimal():
    cost = jnp.asarray([[[3., 1.], [2., 4.], [0.5, 9.]]])  # (1, Q=3, G=2)
    valid = jnp.asarray([[True, True]])
    m = hungarian_match(cost, valid)
    # optimal: gt0 -> query 2 (0.5), gt1 -> query 0 (1.0)
    np.testing.assert_array_equal(np.asarray(m), [[2, 0]])


def test_set_criterion_grads():
    rng = np.random.default_rng(0)
    Q, C = 8, 4
    gt_boxes, gt_labels, gt_valid = _gts()
    logits = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
    x1 = rng.uniform(0, 40, (B, Q, 1))
    y1 = rng.uniform(0, 40, (B, Q, 1))
    boxes = jnp.asarray(np.concatenate(
        [x1, y1, x1 + 10, y1 + 12], axis=-1), jnp.float32)

    def loss_fn(lg, bx):
        out = set_criterion(lg, bx, gt_boxes,
                            jnp.maximum(gt_labels - 1, 0), gt_valid,
                            jnp.asarray([[64., 64.]] * B), num_classes=C)
        return out["loss_ce"] + out["loss_giou"] + out["loss_bbox"]

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(logits, boxes)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
