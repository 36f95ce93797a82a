"""Alternative (non-VL) dense detection heads: RPN, RetinaNet, FCOS and
plain ATSS, plus the head registry.

Behavioral spec: modeling/rpn/__init__.py:10-25 (registry),
rpn/rpn.py (RPNModule: objectness+reg, 256-anchor balanced sampling,
matcher 0.7/0.3), rpn/retina.py (RetinaNetModule: focal + smooth-L1,
matcher 0.5/0.4), rpn/fcos.py + rpn/loss.py:313-477 (FCOSLossComputation:
point-in-box assignment with per-level size-of-interest ranges, min-area
tie-break, IoU loss weighted by centerness), rpn/atss.py (class-based ATSS
head).  All losses are static-shape programs over padded GT with validity
masks; the matchers/samplers come from fiber_tpu.detection.matcher.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.detection.atss import batched_atss_assign
from fiber_tpu.detection.boxes import (box_iou_legacy, decode_boxes,
                                       encode_boxes, nms)
from fiber_tpu.detection.losses import (centerness_bce, sigmoid_focal_loss,
                                        smooth_l1_loss)
from fiber_tpu.detection.matcher import (BELOW_LOW, balanced_sample,
                                         match_quality)

INF = 1e8


def _prior_bias(p: float = 0.01) -> nn.initializers.Initializer:
    return nn.initializers.constant(-math.log((1 - p) / p))


class ConvTower(nn.Module):
    """n 3x3 convs (+ optional GroupNorm) with ReLU — the shared tower
    pattern of the dense heads (SyncBN of the reference -> GN on TPU)."""
    channels: int
    n_convs: int = 4
    use_gn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_convs):
            x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=math.gcd(32, self.channels),
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


# ---------------------------------------------------------------------
# RPN (ref rpn/rpn.py RPNHead + RPNModule)
# ---------------------------------------------------------------------
class RPNHead(nn.Module):
    """Single shared conv + objectness/reg predictors per level."""
    channels: int
    num_anchors: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]
                 ) -> Dict[str, List[jax.Array]]:
        conv = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="bbox_pred")
        logits, bbox = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            bbox.append(reg(t))
        return {"objectness": logits, "bbox_reg": bbox}


def rpn_loss(head_out: Dict[str, List[jax.Array]], anchors: jax.Array,
             gt_boxes: jax.Array, gt_valid: jax.Array, rng: jax.Array,
             batch_per_image: int = 256, positive_fraction: float = 0.5,
             fg_iou: float = 0.7, bg_iou: float = 0.3
             ) -> Dict[str, jax.Array]:
    """Binary objectness + smooth-L1 on sampled anchors
    (ref rpn/loss.py RPNLossComputation with Matcher(0.7, 0.3, True))."""
    B = gt_boxes.shape[0]
    obj = jnp.concatenate(
        [x.reshape(B, -1) for x in head_out["objectness"]], axis=1)
    reg = jnp.concatenate(
        [x.reshape(B, -1, 4) for x in head_out["bbox_reg"]], axis=1)

    def per_image(gt, valid, rng):
        quality = box_iou_legacy(gt, anchors)
        matches = match_quality(quality, valid, fg_iou, bg_iou,
                                allow_low_quality=True)
        pos = matches >= 0
        neg = matches == BELOW_LOW
        pos_sel, neg_sel = balanced_sample(pos, neg, rng,
                                           batch_per_image,
                                           positive_fraction)
        matched_gt = gt[jnp.maximum(matches, 0)]
        targets = encode_boxes(matched_gt, anchors)
        return pos, pos_sel, neg_sel, targets

    rngs = jax.random.split(rng, B)
    pos, pos_sel, neg_sel, targets = jax.vmap(per_image)(
        gt_boxes, gt_valid, rngs)

    sampled = pos_sel | neg_sel
    n_sampled = jnp.maximum(sampled.sum().astype(jnp.float32), 1.0)
    labels = pos_sel.astype(jnp.float32)
    obj = obj.astype(jnp.float32)
    bce = (jnp.maximum(obj, 0) - obj * labels
           + jnp.log1p(jnp.exp(-jnp.abs(obj))))
    loss_obj = jnp.where(sampled, bce, 0.0).sum() / n_sampled
    l1 = smooth_l1_loss(reg.astype(jnp.float32), targets).sum(-1)
    loss_reg = jnp.where(pos_sel, l1, 0.0).sum() / n_sampled
    return {"loss_objectness": loss_obj, "loss_rpn_box_reg": loss_reg}


def rpn_proposals(head_out: Dict[str, List[jax.Array]],
                  anchors_per_level: Sequence[jax.Array],
                  image_sizes: jax.Array,
                  pre_nms_top_n: int = 1000, post_nms_top_n: int = 256,
                  nms_thresh: float = 0.7, min_size: float = 0.0
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode + per-level top-k + NMS -> (B, post_nms, 4) proposals with
    scores and validity (ref rpn/inference.py RPNPostProcessor)."""
    B = head_out["objectness"][0].shape[0]
    all_boxes, all_scores = [], []
    for lvl, anchors in enumerate(anchors_per_level):
        scores = jax.nn.sigmoid(
            head_out["objectness"][lvl].reshape(B, -1).astype(jnp.float32))
        reg = head_out["bbox_reg"][lvl].reshape(B, -1, 4)
        k = min(pre_nms_top_n, scores.shape[1])
        top, idx = jax.lax.top_k(scores, k)
        deltas = jnp.take_along_axis(reg, idx[..., None], axis=1)
        boxes = decode_boxes(deltas, anchors[idx])
        h = image_sizes[:, 0:1].astype(boxes.dtype)
        w = image_sizes[:, 1:2].astype(boxes.dtype)
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w - 1),
                           jnp.clip(boxes[..., 1], 0, h - 1),
                           jnp.clip(boxes[..., 2], 0, w - 1),
                           jnp.clip(boxes[..., 3], 0, h - 1)], axis=-1)
        all_boxes.append(boxes)
        all_scores.append(top)
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)

    def per_image(b, s):
        keep, ok = nms(b, s, nms_thresh, post_nms_top_n)
        return b[keep], jnp.where(ok, s[keep], 0.0), ok

    return jax.vmap(per_image)(boxes, scores)


# ---------------------------------------------------------------------
# RetinaNet (ref rpn/retina.py + rpn/loss.py RetinaNetLossComputation)
# ---------------------------------------------------------------------
class RetinaNetHead(nn.Module):
    channels: int
    num_classes: int
    num_anchors: int = 1
    n_convs: int = 4
    use_gn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]
                 ) -> Dict[str, List[jax.Array]]:
        cls_tower = ConvTower(self.channels, self.n_convs, self.use_gn,
                              self.dtype, name="cls_tower")
        box_tower = ConvTower(self.channels, self.n_convs, self.use_gn,
                              self.dtype, name="bbox_tower")
        cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                      padding=1, dtype=self.dtype,
                      bias_init=_prior_bias(), name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                      dtype=self.dtype, name="bbox_pred")
        logits, bbox = [], []
        for f in features:
            logits.append(cls(cls_tower(f)))
            bbox.append(reg(box_tower(f)))
        return {"box_cls": logits, "bbox_reg": bbox}


def retinanet_loss(head_out: Dict[str, List[jax.Array]],
                   anchors: jax.Array, gt_boxes: jax.Array,
                   gt_labels: jax.Array, gt_valid: jax.Array,
                   num_classes: int, fg_iou: float = 0.5,
                   bg_iou: float = 0.4, gamma: float = 2.0,
                   alpha: float = 0.25, beta: float = 0.11
                   ) -> Dict[str, jax.Array]:
    """Focal cls over all non-ignored anchors + smooth-L1 at positives
    (ref rpn/loss.py:190-311 RetinaNetLossComputation)."""
    B = gt_boxes.shape[0]
    cls = jnp.concatenate(
        [x.reshape(B, -1, num_classes) for x in head_out["box_cls"]],
        axis=1)
    reg = jnp.concatenate(
        [x.reshape(B, -1, 4) for x in head_out["bbox_reg"]], axis=1)

    def per_image(gt, labels, valid):
        quality = box_iou_legacy(gt, jnp.asarray(anchors))
        matches = match_quality(quality, valid, fg_iou, bg_iou,
                                allow_low_quality=True)
        pos = matches >= 0
        ignore = matches == -2  # BETWEEN
        cls_t = jnp.where(pos, labels[jnp.maximum(matches, 0)], 0)
        cls_t = jnp.where(ignore, -1, cls_t)  # -1 = ignored in focal
        targets = encode_boxes(gt[jnp.maximum(matches, 0)],
                               jnp.asarray(anchors))
        return pos, cls_t.astype(jnp.int32), targets

    pos, cls_t, targets = jax.vmap(per_image)(gt_boxes, gt_labels,
                                              gt_valid)
    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    focal = sigmoid_focal_loss(cls.reshape(-1, num_classes),
                               cls_t.reshape(-1), num_classes,
                               gamma=gamma, alpha=alpha)
    loss_cls = focal.sum() / n_pos
    l1 = smooth_l1_loss(reg.astype(jnp.float32), targets,
                        beta=beta).sum(-1)
    loss_reg = jnp.where(pos, l1, 0.0).sum() / n_pos
    return {"loss_retina_cls": loss_cls, "loss_retina_reg": loss_reg}


# ---------------------------------------------------------------------
# FCOS (ref rpn/fcos.py FCOSHead + rpn/loss.py:313-477)
# ---------------------------------------------------------------------
class FCOSHead(nn.Module):
    channels: int
    num_classes: int
    n_convs: int = 4
    num_levels: int = 5
    norm_reg_targets: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]
                 ) -> Dict[str, List[jax.Array]]:
        cls_tower = ConvTower(self.channels, self.n_convs, True,
                              self.dtype, name="cls_tower")
        box_tower = ConvTower(self.channels, self.n_convs, True,
                              self.dtype, name="bbox_tower")
        cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                      dtype=self.dtype, bias_init=_prior_bias(),
                      name="cls_logits")
        reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                      name="bbox_pred")
        ctr = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                      name="centerness")
        scales = self.param("scales", nn.initializers.ones,
                            (self.num_levels,), jnp.float32)
        logits, bbox, centerness = [], [], []
        for lvl, f in enumerate(features):
            ct = cls_tower(f)
            bt = box_tower(f)
            logits.append(cls(ct))
            centerness.append(ctr(bt))
            r = reg(bt).astype(jnp.float32) * scales[lvl]
            bbox.append(r if self.norm_reg_targets else jnp.exp(r))
        return {"box_cls": logits, "bbox_reg": bbox,
                "centerness": centerness}


def fcos_locations(feat_sizes: Sequence[Tuple[int, int]],
                   strides: Sequence[int] = (8, 16, 32, 64, 128)
                   ) -> List[jax.Array]:
    """Per-level (H*W, 2) point locations at stride/2 offsets
    (ref fcos.py compute_locations)."""
    out = []
    for (h, w), s in zip(feat_sizes, strides):
        ys = (jnp.arange(h, dtype=jnp.float32) * s) + s // 2
        xs = (jnp.arange(w, dtype=jnp.float32) * s) + s // 2
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        out.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return out


FCOS_SIZE_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                    (512, INF))


def fcos_assign(locations: jax.Array, level_ranges: jax.Array,
                gt_boxes: jax.Array, gt_labels: jax.Array,
                gt_valid: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Point assignment (ref loss.py:371-477 prepare_targets): a location
    is positive for a gt when it lies inside the box and the max ltrb
    falls in the level's size-of-interest range; ties resolve to the
    minimal-area gt.  locations (N, 2); level_ranges (N, 2)."""
    xs, ys = locations[:, 0], locations[:, 1]
    l = xs[:, None] - gt_boxes[None, :, 0]
    t = ys[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - xs[:, None]
    b = gt_boxes[None, :, 3] - ys[:, None]
    ltrb = jnp.stack([l, t, r, b], axis=-1)          # (N, G, 4)
    inside = ltrb.min(axis=-1) > 0
    max_reg = ltrb.max(axis=-1)
    in_range = ((max_reg >= level_ranges[:, None, 0])
                & (max_reg <= level_ranges[:, None, 1]))
    area = ((gt_boxes[:, 2] - gt_boxes[:, 0])
            * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    candidate = inside & in_range & gt_valid[None, :]
    masked_area = jnp.where(candidate, area[None, :], INF)
    assigned = jnp.argmin(masked_area, axis=1)
    pos = candidate.any(axis=1)
    labels = jnp.where(pos, gt_labels[assigned], 0)
    reg_targets = jnp.take_along_axis(
        ltrb, assigned[:, None, None].repeat(4, -1), axis=1)[:, 0]
    return labels.astype(jnp.int32), reg_targets, pos


def fcos_loss(head_out: Dict[str, List[jax.Array]],
              feat_sizes: Sequence[Tuple[int, int]],
              gt_boxes: jax.Array, gt_labels: jax.Array,
              gt_valid: jax.Array, num_classes: int,
              strides: Sequence[int] = (8, 16, 32, 64, 128)
              ) -> Dict[str, jax.Array]:
    """Focal cls + centerness-weighted IoU reg + centerness BCE
    (ref loss.py:430-477 FCOSLossComputation.__call__)."""
    B = gt_boxes.shape[0]
    locs = fcos_locations(feat_sizes, strides)
    ranges = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(FCOS_SIZE_RANGES[i], jnp.float32),
                         (l.shape[0], 2))
        for i, l in enumerate(locs)], axis=0)
    locations = jnp.concatenate(locs, axis=0)

    labels, reg_t, pos = jax.vmap(
        lambda g, lab, v: fcos_assign(locations, ranges, g, lab, v))(
        gt_boxes, gt_labels, gt_valid)

    cls = jnp.concatenate(
        [x.reshape(B, -1, num_classes) for x in head_out["box_cls"]],
        axis=1).astype(jnp.float32)
    reg = jnp.concatenate(
        [x.reshape(B, -1, 4) for x in head_out["bbox_reg"]],
        axis=1).astype(jnp.float32)
    ctr = jnp.concatenate(
        [x.reshape(B, -1) for x in head_out["centerness"]],
        axis=1).astype(jnp.float32)

    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    focal = sigmoid_focal_loss(cls.reshape(-1, num_classes),
                               labels.reshape(-1), num_classes)
    loss_cls = focal.sum() / n_pos

    # centerness targets from ltrb (ref compute_centerness_targets)
    lr = jnp.minimum(reg_t[..., 0], reg_t[..., 2]) / jnp.maximum(
        jnp.maximum(reg_t[..., 0], reg_t[..., 2]), 1e-9)
    tb = jnp.minimum(reg_t[..., 1], reg_t[..., 3]) / jnp.maximum(
        jnp.maximum(reg_t[..., 1], reg_t[..., 3]), 1e-9)
    ctr_t = jnp.sqrt(jnp.clip(lr * tb, 0.0))
    ctr_t = jnp.where(pos, ctr_t, 0.0)
    sum_ctr = jnp.maximum(ctr_t.sum(), 1e-6)

    # IoU loss between ltrb predictions and targets (ref layers/iou_loss.py)
    pw = reg[..., 0] + reg[..., 2]
    ph = reg[..., 1] + reg[..., 3]
    tw = reg_t[..., 0] + reg_t[..., 2]
    th = reg_t[..., 1] + reg_t[..., 3]
    iw = (jnp.minimum(reg[..., 0], reg_t[..., 0])
          + jnp.minimum(reg[..., 2], reg_t[..., 2]))
    ih = (jnp.minimum(reg[..., 1], reg_t[..., 1])
          + jnp.minimum(reg[..., 3], reg_t[..., 3]))
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = pw * ph + tw * th - inter
    iou = (inter + 1.0) / (union + 1.0)
    loss_reg = (jnp.where(pos, -jnp.log(iou) * ctr_t, 0.0).sum()
                / sum_ctr)

    loss_ctr = jnp.where(pos, centerness_bce(ctr, ctr_t),
                         0.0).sum() / n_pos
    return {"loss_fcos_cls": loss_cls, "loss_fcos_reg": loss_reg,
            "loss_fcos_centerness": loss_ctr}


# ---------------------------------------------------------------------
# Plain (class-based) ATSS head — VLDyHead minus language
# (ref rpn/atss.py ATSSModule)
# ---------------------------------------------------------------------
class PlainAtssHead(nn.Module):
    channels: int
    num_classes: int
    n_convs: int = 4
    num_levels: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]
                 ) -> Dict[str, List[jax.Array]]:
        cls_tower = ConvTower(self.channels, self.n_convs, True,
                              self.dtype, name="cls_tower")
        box_tower = ConvTower(self.channels, self.n_convs, True,
                              self.dtype, name="bbox_tower")
        cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                      dtype=self.dtype, bias_init=_prior_bias(),
                      name="cls_logits")
        reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                      name="bbox_pred")
        ctr = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                      name="centerness")
        scales = self.param("scales", nn.initializers.ones,
                            (self.num_levels,), jnp.float32)
        logits, bbox, centerness = [], [], []
        for lvl, f in enumerate(features):
            ct = cls_tower(f)
            bt = box_tower(f)
            logits.append(cls(ct))
            bbox.append(reg(bt).astype(jnp.float32) * scales[lvl])
            centerness.append(ctr(bt))
        return {"box_cls": logits, "bbox_reg": bbox,
                "centerness": centerness}


def plain_atss_loss(head_out: Dict[str, List[jax.Array]],
                    anchors: jax.Array, level_sizes: Sequence[int],
                    gt_boxes: jax.Array, gt_labels: jax.Array,
                    gt_valid: jax.Array, num_classes: int,
                    reg_loss_weight: float = 2.0
                    ) -> Dict[str, jax.Array]:
    """Class-based ATSS: focal over C classes + GIoU + centerness, same
    assignment as the VL head (ref rpn/loss.py ATSSLossComputation with
    box_cls instead of dot-product logits)."""
    from fiber_tpu.detection.atss_loss import (_giou_decoded,
                                               centerness_from_targets)
    B = gt_boxes.shape[0]
    cls = jnp.concatenate(
        [x.reshape(B, -1, num_classes) for x in head_out["box_cls"]],
        axis=1).astype(jnp.float32)
    reg = jnp.concatenate(
        [x.reshape(B, -1, 4) for x in head_out["bbox_reg"]], axis=1)
    ctr = jnp.concatenate(
        [x.reshape(B, -1) for x in head_out["centerness"]],
        axis=1).astype(jnp.float32)

    assign = batched_atss_assign(anchors, level_sizes, gt_boxes, gt_valid)
    pos = assign.pos_mask
    labels = jnp.where(
        pos, jnp.take_along_axis(gt_labels, assign.assigned_gt, axis=1), 0)
    n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    focal = sigmoid_focal_loss(cls.reshape(-1, num_classes),
                               labels.reshape(-1).astype(jnp.int32),
                               num_classes)
    loss_cls = focal.sum() / n_pos

    anchors_b = jnp.broadcast_to(anchors[None], (B,) + anchors.shape)
    ctr_t = jnp.where(pos, centerness_from_targets(assign.reg_targets,
                                                   anchors_b), 0.0)
    sum_ctr = jnp.maximum(ctr_t.sum(), 1e-6)
    giou = _giou_decoded(reg.astype(jnp.float32), assign.reg_targets,
                         anchors_b)
    loss_reg = (jnp.where(pos, (1.0 - giou) * ctr_t, 0.0).sum()
                / sum_ctr) * reg_loss_weight
    loss_ctr = jnp.where(pos, centerness_bce(ctr, ctr_t),
                         0.0).sum() / n_pos
    return {"loss_cls": loss_cls, "loss_reg": loss_reg,
            "loss_centerness": loss_ctr}


# ---------------------------------------------------------------------
# Registry (ref modeling/rpn/__init__.py:10-25 build_rpn)
# ---------------------------------------------------------------------
def build_head(name: str, channels: int, num_classes: int,
               num_anchors: int = 1, **kw) -> nn.Module:
    name = name.upper()
    if name == "VLDYHEAD":
        from fiber_tpu.detection.dyhead import VLDyHead
        cls = VLDyHead
        kwargs = dict(kw)
    else:
        cls = {"RPN": RPNHead, "RETINA": RetinaNetHead,
               "FCOS": FCOSHead, "ATSS": PlainAtssHead}.get(name)
        if cls is None:
            raise KeyError(f"unknown head {name!r} "
                           "(RPN|RETINA|FCOS|ATSS|VLDYHEAD)")
        kwargs = dict(channels=channels, num_classes=num_classes,
                      num_anchors=num_anchors, **kw)
    fields = {f.name for f in cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return cls(**kwargs)
