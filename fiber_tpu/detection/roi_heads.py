"""ROI heads: Faster-RCNN box head, Mask R-CNN mask head, keypoint head.

Behavioral spec: modeling/roi_heads/** — box_head (FPN2MLPFeatureExtractor:
multi-level ROIAlign + 2 FC; FastRCNNPredictor: softmax cls + per-class
reg; FastRCNNLossComputation: matcher 0.5/0.5, 512@0.25 sampling),
mask_head (MaskRCNNFPNFeatureExtractor: 4 convs + deconv; per-class 28^2
BCE on projected gt masks), keypoint_head (8 convs + deconv, per-joint
spatial softmax CE).  TPU redesign: fixed-size proposal sets with validity
masks, one vmapped ROIAlign per image, losses as masked sums — no dynamic
nonzero()/cat() control flow.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.detection.boxes import (box_iou_legacy, decode_boxes,
                                       encode_boxes, ml_nms)
from fiber_tpu.detection.matcher import (BELOW_LOW, balanced_sample,
                                         match_quality)
from fiber_tpu.detection.roi_align import roi_align


def assign_fpn_level(boxes: jax.Array, k_min: int = 2, k_max: int = 5,
                     canonical_scale: float = 224.0,
                     canonical_level: int = 4) -> jax.Array:
    """FPN paper level assignment (ref roi_heads' LevelMapper):
    k = floor(k0 + log2(sqrt(wh)/224))."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    s = jnp.sqrt(w * h)
    k = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-8))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32) - k_min


def multilevel_roi_align(features: Sequence[jax.Array], boxes: jax.Array,
                         output_size: int,
                         strides: Sequence[int] = (4, 8, 16, 32)
                         ) -> jax.Array:
    """Pool each box from its assigned FPN level (single image).

    features: per-level (H_l, W_l, C); boxes (R, 4).  Pools from every
    level then selects by assignment — static shape, no scatter; with
    R ~ 512 and 4 levels the redundant pools are cheap gathers relative
    to the head FLOPs."""
    lvl = assign_fpn_level(boxes, k_min=int(math.log2(strides[0])),
                           k_max=int(math.log2(strides[-1])))
    pooled = jnp.stack([
        roi_align(f, boxes, output_size, spatial_scale=1.0 / s)
        for f, s in zip(features, strides)], axis=0)  # (L, R, P, P, C)
    return jnp.take_along_axis(
        pooled, lvl[None, :, None, None, None], axis=0)[0]


# ---------------------------------------------------------------------
# Box head
# ---------------------------------------------------------------------
class BoxHead(nn.Module):
    """2-FC feature extractor + cls/reg predictors
    (ref box_head/roi_box_feature_extractors.py FPN2MLPFeatureExtractor +
    roi_box_predictors.py FPNPredictor)."""
    num_classes: int          # including background at index 0
    representation_size: int = 1024
    pool_size: int = 7
    class_agnostic_reg: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """pooled (R, P, P, C) -> (cls_logits (R, C+bg), reg (R, 4 or 4C))."""
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       name="cls_score")(x)
        n_reg = 4 if self.class_agnostic_reg else 4 * self.num_classes
        reg = nn.Dense(n_reg, dtype=self.dtype, name="bbox_pred")(x)
        return cls, reg


def sample_proposals(proposals: jax.Array, prop_valid: jax.Array,
                     gt_boxes: jax.Array, gt_labels: jax.Array,
                     gt_valid: jax.Array, rng: jax.Array,
                     batch_size: int = 512, pos_fraction: float = 0.25,
                     fg_iou: float = 0.5, bg_iou: float = 0.5
                     ) -> Dict[str, jax.Array]:
    """Match + subsample proposals for box-head training (ref
    box_head/loss.py FastRCNNLossComputation.subsample).  Single image;
    vmap over the batch.  gt boxes are appended to the proposal set like
    the reference's add_gt_proposals."""
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    quality = box_iou_legacy(gt_boxes, all_boxes)
    quality = jnp.where(all_valid[None, :], quality, -1.0)
    matches = match_quality(quality, gt_valid, fg_iou, bg_iou)
    pos = (matches >= 0) & all_valid
    neg = (matches == BELOW_LOW) & all_valid
    pos_sel, neg_sel = balanced_sample(pos, neg, rng, batch_size,
                                       pos_fraction)
    sel = pos_sel | neg_sel
    labels = jnp.where(pos_sel,
                       gt_labels[jnp.maximum(matches, 0)], 0)
    reg_targets = encode_boxes(gt_boxes[jnp.maximum(matches, 0)],
                               all_boxes)
    return {"boxes": all_boxes, "selected": sel, "pos": pos_sel,
            "labels": labels.astype(jnp.int32),
            "reg_targets": reg_targets}


def box_head_loss(cls_logits: jax.Array, reg: jax.Array,
                  labels: jax.Array, reg_targets: jax.Array,
                  selected: jax.Array, pos: jax.Array,
                  class_agnostic_reg: bool = False
                  ) -> Dict[str, jax.Array]:
    """Softmax CE over sampled rois + smooth-L1 at the matched class's
    reg slot (ref box_head/loss.py:125-170)."""
    n_sel = jnp.maximum(selected.sum().astype(jnp.float32), 1.0)
    lsm = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lsm, labels[..., None], -1)[..., 0]
    loss_cls = jnp.where(selected, nll, 0.0).sum() / n_sel

    if class_agnostic_reg:
        reg_sel = reg.reshape(reg.shape[:-1] + (1, 4))[..., 0, :]
    else:
        reg_c = reg.reshape(reg.shape[:-1] + (-1, 4))
        reg_sel = jnp.take_along_axis(
            reg_c, labels[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    d = jnp.abs(reg_sel.astype(jnp.float32) - reg_targets)
    beta = 1.0
    l1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)
    loss_reg = jnp.where(pos, l1, 0.0).sum() / n_sel
    return {"loss_classifier": loss_cls, "loss_box_reg": loss_reg}


def box_head_inference(cls_logits: jax.Array, reg: jax.Array,
                       proposals: jax.Array, prop_valid: jax.Array,
                       image_size: jax.Array, num_classes: int,
                       score_thresh: float = 0.05,
                       nms_thresh: float = 0.5, max_detections: int = 100,
                       class_agnostic_reg: bool = False):
    """Per-class decode + NMS (ref box_head/inference.py PostProcessor).
    Single image; vmap over the batch.  Returns (boxes, scores, labels,
    valid) fixed-size."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    R = proposals.shape[0]
    C = num_classes - 1  # foreground classes
    if class_agnostic_reg:
        boxes_per_class = jnp.broadcast_to(
            decode_boxes(reg.reshape(R, 4), proposals)[:, None, :],
            (R, C, 4))
    else:
        reg_c = reg.reshape(R, num_classes, 4)[:, 1:, :]
        boxes_per_class = decode_boxes(
            reg_c, jnp.broadcast_to(proposals[:, None, :], (R, C, 4)))
    h, w = image_size[0], image_size[1]
    boxes_per_class = jnp.stack([
        jnp.clip(boxes_per_class[..., 0], 0, w - 1),
        jnp.clip(boxes_per_class[..., 1], 0, h - 1),
        jnp.clip(boxes_per_class[..., 2], 0, w - 1),
        jnp.clip(boxes_per_class[..., 3], 0, h - 1)], axis=-1)
    scores = probs[:, 1:]                               # (R, C)
    valid = (scores > score_thresh) & prop_valid[:, None]

    flat_boxes = boxes_per_class.reshape(R * C, 4)
    flat_scores = jnp.where(valid, scores, 0.0).reshape(R * C)
    flat_labels = jnp.broadcast_to(
        jnp.arange(1, C + 1)[None, :], (R, C)).reshape(R * C)
    keep, ok = ml_nms(flat_boxes, flat_scores, flat_labels, nms_thresh,
                      max_detections, valid=valid.reshape(-1))
    return (flat_boxes[keep], jnp.where(ok, flat_scores[keep], 0.0),
            flat_labels[keep].astype(jnp.int32), ok)


# ---------------------------------------------------------------------
# Mask head
# ---------------------------------------------------------------------
class MaskHead(nn.Module):
    """4 convs + 2x deconv + per-class 1x1 (ref mask_head
    MaskRCNNFPNFeatureExtractor + MaskRCNNC4Predictor)."""
    num_classes: int           # foreground classes
    channels: int = 256
    n_convs: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jax.Array) -> jax.Array:
        """pooled (R, P, P, C) -> mask logits (R, 2P, 2P, num_classes)."""
        x = pooled
        for i in range(self.n_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     name="conv5_mask")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="mask_fcn_logits")(x)


def mask_head_loss(mask_logits: jax.Array, mask_targets: jax.Array,
                   labels: jax.Array, pos: jax.Array
                   ) -> jax.Array:
    """Per-class BCE at positive rois (ref mask_head/loss.py): the target
    is the gt mask projected into the roi (SegmentationMasks.crop_and_
    resize), supervised only at the matched class's channel."""
    idx = jnp.maximum(labels - 1, 0)
    logits = jnp.take_along_axis(
        mask_logits, idx[:, None, None, None], axis=-1)[..., 0]
    logits = logits.astype(jnp.float32)
    t = mask_targets.astype(jnp.float32)
    bce = (jnp.maximum(logits, 0) - logits * t
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    per_roi = bce.mean(axis=(1, 2))
    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    return jnp.where(pos, per_roi, 0.0).sum() / n_pos


# ---------------------------------------------------------------------
# Keypoint head
# ---------------------------------------------------------------------
class KeypointHead(nn.Module):
    """8 convs + deconv + upsample to per-joint heatmaps
    (ref keypoint_head KeypointRCNNFeatureExtractor + predictor)."""
    num_keypoints: int = 17
    channels: int = 512
    n_convs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jax.Array) -> jax.Array:
        """pooled (R, P, P, C) -> heatmap logits (R, 4P, 4P, K)."""
        x = pooled
        for i in range(self.n_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype,
                                name=f"conv_fcn{i + 1}")(x))
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="kps_score_lowres")(x)
        R, H, W, K = x.shape
        return jax.image.resize(x, (R, H * 2, W * 2, K), "bilinear")


def keypoint_head_loss(kp_logits: jax.Array, target_bins: jax.Array,
                       target_vis: jax.Array, pos: jax.Array
                       ) -> jax.Array:
    """Spatial softmax CE per visible joint
    (ref keypoint_head/loss.py)."""
    R, H, W, K = kp_logits.shape
    logits = kp_logits.astype(jnp.float32).reshape(R, H * W, K)
    logits = logits.transpose(0, 2, 1)                  # (R, K, HW)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lsm, target_bins[..., None], -1)[..., 0]
    vis = target_vis & pos[:, None]
    n_vis = jnp.maximum(vis.sum().astype(jnp.float32), 1.0)
    return jnp.where(vis, nll, 0.0).sum() / n_vis


def heatmaps_to_keypoints(kp_logits: jax.Array, rois: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """Decode per-roi keypoint heatmaps to image coordinates.

    Reference semantics (keypoint_head/inference.py heatmaps_to_keypoints):
    cv2-cubic-resize each heatmap to the roi's ceil(w) x ceil(h), argmax
    per joint, and map the discrete bin back with the Heckbert +0.5
    center convention.  The per-roi dynamic resize is shape-dynamic and
    host-bound; this TPU redesign argmaxes at the fixed heatmap
    resolution and applies the same +0.5 / width-correction mapping with
    correction = roi_size / heatmap_size, which is the min_size=0 limit
    of the reference formula without the cubic upsample (sub-bin
    placement differs by at most half a heatmap bin; the loss trains the
    argmax bin itself via to_heatmap_targets, so the peak bin matches).

    Args:
      kp_logits: (R, H, W, K) heatmap logits from KeypointHead.
      rois: (R, 4) xyxy boxes in image coordinates.
    Returns:
      keypoints (R, K, 3) float32 [x, y, visibility=1] and
      scores (R, K) float32 (peak logit per joint).
    """
    R, H, W, K = kp_logits.shape
    logits = kp_logits.astype(jnp.float32)
    flat = logits.reshape(R, H * W, K)
    pos = jnp.argmax(flat, axis=1)                       # (R, K)
    x_int = (pos % W).astype(jnp.float32)
    y_int = (pos // W).astype(jnp.float32)
    scores = jnp.max(flat, axis=1)                       # (R, K)
    x1, y1 = rois[:, 0], rois[:, 1]
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    x = (x_int + 0.5) * (w / W)[:, None] + x1[:, None]
    y = (y_int + 0.5) * (h / H)[:, None] + y1[:, None]
    vis = jnp.ones_like(x)
    return jnp.stack([x, y, vis], axis=-1), scores
