"""ROI heads (box/mask/keypoint) + mask/keypoint structures
(ref modeling/roi_heads/**, structures/segmentation_mask.py,
structures/keypoint.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from fiber_tpu.detection import roi_heads
from fiber_tpu.detection.structures import (Keypoints, SegmentationMasks,
                                            rasterize_polygons)

C_IN = 16
STRIDES = (4, 8, 16, 32)
IMG = 64


def _features(rng):
    keys = jax.random.split(rng, len(STRIDES))
    return [jax.random.normal(k, (IMG // s, IMG // s, C_IN))
            for k, s in zip(keys, STRIDES)]


def test_fpn_level_assignment():
    boxes = jnp.asarray([[0, 0, 16, 16],       # tiny -> lowest level
                         [0, 0, 448, 448]])    # huge -> highest level
    lvl = roi_heads.assign_fpn_level(boxes, k_min=2, k_max=5)
    assert int(lvl[0]) == 0
    assert int(lvl[1]) == 3


def test_multilevel_roi_align_selects_right_level():
    feats = _features(jax.random.PRNGKey(0))
    small = jnp.asarray([[4., 4., 20., 20.]])
    pooled = roi_heads.multilevel_roi_align(feats, small, 7,
                                            strides=STRIDES)
    from fiber_tpu.detection.roi_align import roi_align
    direct = roi_align(feats[0], small, 7, spatial_scale=1.0 / STRIDES[0])
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(direct),
                               atol=1e-6)


def test_box_head_train_and_infer():
    rng = jax.random.PRNGKey(1)
    feats = _features(rng)
    num_classes = 4  # incl. background
    R = 20
    props = jax.random.uniform(rng, (R, 2)) * 40
    proposals = jnp.concatenate(
        [props, props + 8 + jax.random.uniform(rng, (R, 2)) * 16], axis=1)
    prop_valid = jnp.ones((R,), bool)
    gt_boxes = jnp.asarray([[4., 4., 30., 30.], [20., 10., 50., 44.]])
    gt_labels = jnp.asarray([1, 3], jnp.int32)
    gt_valid = jnp.asarray([True, True])

    sample = roi_heads.sample_proposals(proposals, prop_valid, gt_boxes,
                                        gt_labels, gt_valid,
                                        jax.random.PRNGKey(2),
                                        batch_size=16)
    assert bool(sample["pos"].any())  # gt boxes appended -> positives exist

    head = roi_heads.BoxHead(num_classes=num_classes)
    pooled = roi_heads.multilevel_roi_align(feats, sample["boxes"], 7,
                                            strides=STRIDES)
    variables = head.init(jax.random.PRNGKey(3), pooled)

    def loss_fn(params):
        cls, reg = head.apply({"params": params}, pooled)
        losses = roi_heads.box_head_loss(cls, reg, sample["labels"],
                                         sample["reg_targets"],
                                         sample["selected"], sample["pos"])
        return losses["loss_classifier"] + losses["loss_box_reg"], losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total)), losses
    assert sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads)) > 0

    cls, reg = head.apply(variables, pooled)
    boxes, scores, labels, ok = roi_heads.box_head_inference(
        cls, reg, sample["boxes"], jnp.ones((cls.shape[0],), bool),
        jnp.asarray([IMG, IMG], jnp.float32), num_classes,
        score_thresh=0.0, max_detections=10)
    assert boxes.shape == (10, 4)
    assert labels.shape == (10,)
    assert bool(ok.any())


def test_mask_head_and_targets():
    masks = np.zeros((2, IMG, IMG), bool)
    masks[0, 8:24, 8:24] = True
    masks[1, 30:50, 20:60] = True
    sm = SegmentationMasks(jnp.asarray(masks), jnp.asarray([True, True]))
    boxes = jnp.asarray([[8., 8., 24., 24.], [20., 30., 60., 50.]])
    targets = sm.crop_and_resize(boxes, 28)
    assert targets.shape == (2, 28, 28)
    assert float(targets[0].mean()) > 0.8  # box tightly covers the mask

    head = roi_heads.MaskHead(num_classes=3)
    pooled = jax.random.normal(jax.random.PRNGKey(0), (2, 14, 14, C_IN))
    variables = head.init(jax.random.PRNGKey(1), pooled)
    logits = head.apply(variables, pooled)
    assert logits.shape == (2, 28, 28, 3)
    loss = roi_heads.mask_head_loss(logits, targets,
                                    jnp.asarray([1, 2], jnp.int32),
                                    jnp.asarray([True, True]))
    assert np.isfinite(float(loss))


def test_keypoint_head():
    head = roi_heads.KeypointHead(num_keypoints=17, channels=32, n_convs=2)
    pooled = jax.random.normal(jax.random.PRNGKey(0), (3, 14, 14, C_IN))
    variables = head.init(jax.random.PRNGKey(1), pooled)
    logits = head.apply(variables, pooled)
    assert logits.shape == (3, 56, 56, 17)

    kps = np.zeros((3, 17, 3), np.float32)
    kps[:, :, 0] = 20
    kps[:, :, 1] = 30
    kps[:, :, 2] = 2
    kp = Keypoints(jnp.asarray(kps), jnp.asarray([True, True, False]))
    boxes = jnp.asarray([[10., 20., 40., 50.]] * 3)
    bins, vis = kp.to_heatmap_targets(boxes, 56)
    assert bins.shape == (3, 17)
    assert bool(vis[0].all()) and not bool(vis[2].any())
    loss = roi_heads.keypoint_head_loss(
        logits, bins, vis, jnp.asarray([True, True, True]))
    assert np.isfinite(float(loss))


def test_polygon_rasterization_and_flip():
    # axis-aligned square polygon
    poly = [np.asarray([10, 10, 30, 10, 30, 30, 10, 30], np.float64)]
    mask = rasterize_polygons(poly, 40, 40)
    assert mask[20, 20] and not mask[5, 5]
    assert abs(mask.sum() - 400) < 50  # ~20x20

    sm = SegmentationMasks.from_polygons([poly], 40, 40, pad_to=3)
    assert sm.masks.shape == (3, 40, 40)
    assert bool(sm.valid[0]) and not bool(sm.valid[1])
    flipped = sm.hflip()
    assert bool(flipped.masks[0, 20, 40 - 21])

    small = sm.resize(20, 20)
    assert small.masks.shape == (3, 20, 20)
    assert bool(small.masks[0, 10, 10])


def test_keypoint_hflip_swaps_sides():
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 1] = [10, 5, 2]   # left_eye
    kps[0, 2] = [50, 5, 2]   # right_eye
    kp = Keypoints(jnp.asarray(kps), jnp.asarray([True]))
    f = kp.hflip(width=64)
    # left_eye slot now holds the mirrored right_eye
    np.testing.assert_allclose(np.asarray(f.kps[0, 1]), [13., 5., 2.])
    np.testing.assert_allclose(np.asarray(f.kps[0, 2]), [53., 5., 2.])


def test_heatmap_decode_round_trip_and_keypoint_ap():
    """to_heatmap_targets -> one-hot heatmap -> heatmaps_to_keypoints
    recovers each joint within half a heatmap bin of the GT, and the
    decoded predictions score keypoint mAP 1.0 (closing the
    train-target / decode / evaluate loop; ref inference.py
    heatmaps_to_keypoints + keypoint.py keypoints_to_heat_map)."""
    from fiber_tpu.detection.evaluation import coco_map
    rng = np.random.default_rng(0)
    R, K, HM = 3, 5, 56
    boxes = np.array([[10., 20., 90., 120.],
                      [0., 0., 64., 64.],
                      [30., 40., 150., 100.]], np.float32)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    # GT joints strictly inside each box
    u = rng.uniform(0.1, 0.9, (R, K, 2))
    kps = np.zeros((R, K, 3), np.float32)
    kps[..., 0] = boxes[:, 0, None] + u[..., 0] * w[:, None]
    kps[..., 1] = boxes[:, 1, None] + u[..., 1] * h[:, None]
    kps[..., 2] = 2
    kp = Keypoints(jnp.asarray(kps), jnp.ones(R, bool))
    bins, vis = kp.to_heatmap_targets(jnp.asarray(boxes), HM)
    assert bool(np.asarray(vis).all())

    # heatmap with the target bin as the peak
    logits = np.full((R, HM, HM, K), -5.0, np.float32)
    b = np.asarray(bins)
    for r in range(R):
        for k in range(K):
            logits[r, b[r, k] // HM, b[r, k] % HM, k] = 5.0
    dec, scores = roi_heads.heatmaps_to_keypoints(
        jnp.asarray(logits), jnp.asarray(boxes))
    dec = np.asarray(dec)
    assert dec.shape == (R, K, 3) and np.asarray(scores).shape == (R, K)
    # within one bin of the GT coordinate
    assert (np.abs(dec[..., 0] - kps[..., 0])
            < (w[:, None] / HM) + 1e-4).all()
    assert (np.abs(dec[..., 1] - kps[..., 1])
            < (h[:, None] / HM) + 1e-4).all()

    preds = [{"boxes": boxes[r:r + 1], "scores": np.array([0.9]),
              "labels": np.array([1]), "keypoints": dec[r:r + 1]}
             for r in range(R)]
    gts = [{"boxes": boxes[r:r + 1], "labels": np.array([1]),
            "keypoints": kps[r:r + 1]} for r in range(R)]
    m = coco_map(preds, gts, iou_type="keypoints",
                 kpt_sigmas=np.full(K, 0.1))
    assert abs(m["mAP"] - 1.0) < 1e-6
