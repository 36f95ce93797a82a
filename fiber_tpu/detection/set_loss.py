"""DETR-style set prediction loss: Hungarian matching + class/box criterion.

Behavioral spec: layers/set_loss.py:115-388 (HungarianMatcher /
SetCriterion).  TPU-native redesign:

* targets are padded (B, G, ...) tensors with a validity mask — no
  per-image python lists;
* the three cost terms (focal/softmax class cost, normalized-L1, -GIoU)
  are one batched static-shape computation;
* the Hungarian solve itself is combinatorial host work in the reference
  too (it moves C to CPU and calls scipy, set_loss.py:217-221) — here it
  runs through `jax.pure_callback` so the whole loss stays inside one jit
  program with a single host round-trip for the (B, Q, G) cost matrix;
* matched-pair losses are gathers + masked sums, normalized by the global
  box count (the reference's all_reduce is the global sum under pjit).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_area_float(boxes: jax.Array) -> jax.Array:
    return ((boxes[..., 2] - boxes[..., 0])
            * (boxes[..., 3] - boxes[..., 1]))


def generalized_box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) xyxy -> (N, M) GIoU (float convention,
    ref set_loss.py:31-52)."""
    area_a = box_area_float(a)
    area_b = box_area_float(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / union
    elt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    erb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    ewh = jnp.maximum(erb - elt, 0)
    enclose = ewh[..., 0] * ewh[..., 1]
    return iou - (enclose - union) / enclose


def _hungarian_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """scipy assignment per image: cost (B, Q, G), n_valid (B,).
    Returns (B, G) query index matched to each gt column (0 for padding).
    """
    from scipy.optimize import linear_sum_assignment
    B, Q, G = cost.shape
    out = np.zeros((B, G), np.int32)
    for b in range(B):
        g = int(n_valid[b])
        if g == 0:
            continue
        c = np.nan_to_num(cost[b, :, :g], nan=0.0, posinf=0.0, neginf=0.0)
        rows, cols = linear_sum_assignment(c)
        out[b, cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """(B, Q, G) cost + (B, G) validity -> (B, G) matched query index.
    Pure-callback to the same scipy solver the reference uses."""
    n_valid = gt_valid.astype(jnp.int32).sum(axis=1)
    B, _, G = cost.shape
    # the match is a non-differentiable decision (the reference runs it
    # under torch.no_grad, set_loss.py:150): stop gradients so the
    # callback never sits on a tangent path
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, G), jnp.int32),
        jax.lax.stop_gradient(cost.astype(jnp.float32)),
        jax.lax.stop_gradient(n_valid), vmap_method="sequential")


def _focal_class_cost(probs: jax.Array, gt_labels: jax.Array,
                      alpha: float, gamma: float) -> jax.Array:
    """(B, Q, C) sigmoid probs x (B, G) labels -> (B, Q, G) focal cost
    (ref set_loss.py:190-195)."""
    neg = (1 - alpha) * (probs ** gamma) * (-jnp.log(1 - probs + 1e-8))
    pos = alpha * ((1 - probs) ** gamma) * (-jnp.log(probs + 1e-8))
    diff = pos - neg                                 # (B, Q, C)
    return jnp.take_along_axis(
        diff, gt_labels[:, None, :].astype(jnp.int32), axis=2)


def set_matching_cost(pred_logits: jax.Array, pred_boxes: jax.Array,
                      gt_boxes: jax.Array, gt_labels: jax.Array,
                      image_sizes_xyxy: jax.Array,
                      cost_class: float = 1.0, cost_bbox: float = 1.0,
                      cost_giou: float = 1.0, use_focal: bool = False,
                      focal_alpha: float = 0.25, focal_gamma: float = 2.0
                      ) -> jax.Array:
    """(B, Q, G) matching cost (ref HungarianMatcher.forward).

    pred_boxes / gt_boxes in absolute xyxy; image_sizes_xyxy (B, 4) =
    (w, h, w, h) normalizes the L1 term."""
    logits = pred_logits.astype(jnp.float32)
    if use_focal:
        c_class = _focal_class_cost(jax.nn.sigmoid(logits), gt_labels,
                                    focal_alpha, focal_gamma)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        c_class = -jnp.take_along_axis(
            probs, gt_labels[:, None, :].astype(jnp.int32), axis=2)

    scale = image_sizes_xyxy[:, None, :].astype(jnp.float32)
    pb = pred_boxes.astype(jnp.float32) / scale
    gb = gt_boxes.astype(jnp.float32) / scale
    c_bbox = jnp.abs(pb[:, :, None, :] - gb[:, None, :, :]).sum(-1)

    c_giou = -jax.vmap(generalized_box_iou_matrix)(
        pred_boxes.astype(jnp.float32), gt_boxes.astype(jnp.float32))

    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    return jnp.nan_to_num(cost, nan=0.0, posinf=0.0, neginf=0.0)


@functools.partial(jax.jit, static_argnames=(
    "num_classes", "use_focal", "cost_class", "cost_bbox", "cost_giou",
    "eos_coef", "focal_alpha", "focal_gamma"))
def set_criterion(pred_logits: jax.Array,      # (B, Q, C[+1 if softmax])
                  pred_boxes: jax.Array,       # (B, Q, 4) abs xyxy
                  gt_boxes: jax.Array,         # (B, G, 4) abs xyxy padded
                  gt_labels: jax.Array,        # (B, G) int, 0-based classes
                  gt_valid: jax.Array,         # (B, G) bool
                  image_sizes: jax.Array,      # (B, 2) (h, w)
                  num_classes: int,
                  use_focal: bool = True,
                  cost_class: float = 1.0, cost_bbox: float = 1.0,
                  cost_giou: float = 1.0, eos_coef: float = 0.1,
                  focal_alpha: float = 0.25, focal_gamma: float = 2.0
                  ) -> Dict[str, jax.Array]:
    """Full SetCriterion forward: match then class + L1 + GIoU losses
    (ref set_loss.py:265-388).  num_boxes is the global valid-gt count
    (the all_reduce is implicit under pjit)."""
    B, Q, _ = pred_logits.shape
    h = image_sizes[:, 0:1].astype(jnp.float32)
    w = image_sizes[:, 1:2].astype(jnp.float32)
    sizes_xyxy = jnp.concatenate([w, h, w, h], axis=1)   # (B, 4)

    cost = set_matching_cost(pred_logits, pred_boxes, gt_boxes, gt_labels,
                             sizes_xyxy, cost_class, cost_bbox, cost_giou,
                             use_focal, focal_alpha, focal_gamma)
    # padded gt columns must never win a real query: huge cost
    cost = jnp.where(gt_valid[:, None, :], cost, 1e9)
    match = hungarian_match(cost, gt_valid)              # (B, G)

    num_boxes = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    # ---- classification: target per query = matched class or no-object
    target = jnp.full((B, Q), num_classes, jnp.int32)
    q_idx = jnp.where(gt_valid, match, Q)  # padded -> out-of-range slot
    target_ext = jnp.concatenate(
        [target, jnp.zeros((B, 1), jnp.int32)], axis=1)
    target_ext = jax.vmap(
        lambda t, q, l: t.at[q].set(l.astype(jnp.int32)))(
        target_ext, q_idx, gt_labels)
    target = target_ext[:, :Q]

    logits = pred_logits.astype(jnp.float32)
    if use_focal:
        onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
        p = jax.nn.sigmoid(logits)
        ce = (jnp.maximum(logits, 0) - logits * onehot
              + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        p_t = p * onehot + (1 - p) * (1 - onehot)
        loss = ce * ((1 - p_t) ** focal_gamma)
        alpha_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
        loss_ce = (alpha_t * loss).sum() / num_boxes
    else:
        # CE with down-weighted no-object class (ref empty_weight)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lsm, target[..., None], -1)[..., 0]
        wgt = jnp.where(target == num_classes, eos_coef, 1.0)
        loss_ce = (nll * wgt).sum() / wgt.sum()

    # ---- box losses on matched pairs
    matched_pred = jnp.take_along_axis(
        pred_boxes.astype(jnp.float32), match[..., None], axis=1)  # (B,G,4)
    valid_f = gt_valid.astype(jnp.float32)
    giou = jax.vmap(
        lambda p, g: jnp.diagonal(
            generalized_box_iou_matrix(p, g)))(matched_pred,
                                               gt_boxes.astype(jnp.float32))
    loss_giou = (jnp.where(gt_valid, 1.0 - giou, 0.0)).sum() / num_boxes

    scale = sizes_xyxy[:, None, :]
    l1 = jnp.abs(matched_pred / scale
                 - gt_boxes.astype(jnp.float32) / scale).sum(-1)
    loss_bbox = (l1 * valid_f).sum() / num_boxes

    return {"loss_ce": loss_ce, "loss_giou": loss_giou,
            "loss_bbox": loss_bbox}
