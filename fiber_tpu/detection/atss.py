"""ATSS adaptive anchor assignment, fully vectorized over padded GT.

Behavioral spec: modeling/rpn/loss.py:626-827 (prepare_targets): per gt,
take the top-9 anchors per FPN level by center distance, threshold IoU at
mean+std of those candidates, require the anchor center inside the gt box,
and resolve multi-assignments by max IoU.  The reference loops over images
and concatenates python lists; here everything is a single static-shape
program over (G_max, N) tensors with validity masks, vmappable over the
batch — no host roundtrips.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from fiber_tpu.detection.boxes import box_iou_legacy, encode_boxes

NEG_INF = -1e30


class AtssAssignment(NamedTuple):
    assigned_gt: jax.Array   # (N,) int32 index into gt rows (0 if none)
    pos_mask: jax.Array      # (N,) bool — anchor is positive
    reg_targets: jax.Array   # (N, 4) encoded regression targets


def atss_assign(anchors: jax.Array,
                level_sizes: Sequence[int],
                gt_boxes: jax.Array,
                gt_valid: jax.Array,
                topk: int = 9,
                anchors_per_loc: int = 1) -> AtssAssignment:
    """anchors (N, 4); level_sizes static per-level anchor counts summing
    to N; gt_boxes (G, 4) padded; gt_valid (G,) bool.

    Exact reference semantics (rpn/loss.py:693-759): legacy +1 IoU,
    unbiased (Bessel) std over the candidate IoUs, a 0.01px margin on the
    center-inside-gt test, and topk*anchors_per_loc candidates per level.
    """
    N = anchors.shape[0]
    G = gt_boxes.shape[0]

    a_cx = (anchors[:, 0] + anchors[:, 2]) / 2
    a_cy = (anchors[:, 1] + anchors[:, 3]) / 2
    g_cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    g_cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2

    dist = jnp.sqrt((a_cx[None, :] - g_cx[:, None]) ** 2
                    + (a_cy[None, :] - g_cy[:, None]) ** 2)  # (G, N)

    # top-k closest anchors per level per gt -> candidate mask (G, N)
    candidate = jnp.zeros((G, N), bool)
    start = 0
    for n_lvl in level_sizes:
        k = min(topk * anchors_per_loc, n_lvl)
        _, idx = jax.lax.top_k(-dist[:, start:start + n_lvl], k)  # (G, k)
        onehot = jax.nn.one_hot(idx, n_lvl, dtype=jnp.bool_).any(axis=1)
        candidate = candidate.at[:, start:start + n_lvl].set(onehot)
        start += n_lvl

    ious = box_iou_legacy(gt_boxes, anchors)             # (G, N)
    cand_f = candidate.astype(jnp.float32)
    n_cand = jnp.maximum(cand_f.sum(axis=1, keepdims=True), 1)
    mean = (ious * cand_f).sum(axis=1, keepdims=True) / n_cand
    # torch.std default is the unbiased (n-1) estimator (rpn/loss.py:724)
    var = ((((ious - mean) ** 2) * cand_f).sum(axis=1, keepdims=True)
           / jnp.maximum(n_cand - 1, 1))
    thresh = mean + jnp.sqrt(var)                        # (G, 1)

    # min(l, t, r, b) > 0.01 — strict margin, not >= 0 (rpn/loss.py:745)
    inside = ((a_cx[None, :] - gt_boxes[:, 0:1] > 0.01)
              & (gt_boxes[:, 2:3] - a_cx[None, :] > 0.01)
              & (a_cy[None, :] - gt_boxes[:, 1:2] > 0.01)
              & (gt_boxes[:, 3:4] - a_cy[None, :] > 0.01))  # (G, N)

    pos = (candidate & (ious >= thresh) & inside
           & gt_valid[:, None].astype(bool))             # (G, N)

    # resolve anchors positive for several gts by max IoU
    masked_ious = jnp.where(pos, ious, NEG_INF)          # (G, N)
    assigned_gt = jnp.argmax(masked_ious, axis=0)        # (N,)
    pos_mask = jnp.any(pos, axis=0)                      # (N,)

    matched = gt_boxes[assigned_gt]                      # (N, 4)
    reg_targets = encode_boxes(matched, anchors)
    return AtssAssignment(assigned_gt=assigned_gt.astype(jnp.int32),
                          pos_mask=pos_mask, reg_targets=reg_targets)


def batched_atss_assign(anchors: jax.Array, level_sizes: Sequence[int],
                        gt_boxes: jax.Array, gt_valid: jax.Array,
                        topk: int = 9,
                        anchors_per_loc: int = 1) -> AtssAssignment:
    """vmap over the batch: gt_boxes (B, G, 4), gt_valid (B, G)."""
    fn = lambda g, v: atss_assign(anchors, tuple(level_sizes), g, v, topk,
                                  anchors_per_loc)
    return jax.vmap(fn)(gt_boxes, gt_valid)
