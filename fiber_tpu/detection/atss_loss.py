"""Full ATSS grounding loss: focal cls + GIoU reg + centerness +
dot-product token focal.

Behavioral spec: modeling/rpn/loss.py:479-1311 (ATSSLossComputation with
FIBER's config: USE_DOT_PRODUCT_TOKEN_LOSS, REG_LOSS_WEIGHT=2.0):

* anchors assigned by ATSS (fiber_tpu.detection.atss)
* cls: binary sigmoid focal over anchors (labels>0), / num_pos (global)
* token: binary sigmoid focal of the dot-product logits vs the matched
  gt's positive-map row; unmatched anchors target the last ("no-object")
  token (ref loss.py:766-776), / num_pos
* reg: GIoU between decoded pred and decoded target at positive anchors,
  weighted by centerness targets, / sum(centerness) (global)
* centerness: BCE vs the (l,t,r,b)-derived target, / num_pos

Under pjit, the reference's `reduce_sum` across GPUs (comm.py:137) is the
plain global sum.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from fiber_tpu.detection.atss import batched_atss_assign
from fiber_tpu.detection.boxes import decode_boxes, encode_boxes
from fiber_tpu.detection.losses import (centerness_bce, sigmoid_focal_loss,
                                        token_sigmoid_focal_loss)


def centerness_from_targets(reg_targets: jax.Array, anchors: jax.Array
                            ) -> jax.Array:
    """(..., 4) encoded targets + anchors -> centerness in [0, 1]
    (ref loss.py:829-845)."""
    gts = decode_boxes(reg_targets, anchors)
    acx = (anchors[..., 0] + anchors[..., 2]) / 2
    acy = (anchors[..., 1] + anchors[..., 3]) / 2
    l = acx - gts[..., 0]
    t = acy - gts[..., 1]
    r = gts[..., 2] - acx
    b = gts[..., 3] - acy
    lr = jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-9)
    tb = jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-9)
    return jnp.sqrt(jnp.clip(lr * tb, 0.0))


def _giou_decoded(pred_deltas, target_deltas, anchors):
    """GIoU of decoded boxes with the reference's degenerate-box handling
    (x2 := max(x1, x2); zero-area boxes allowed, loss.py:583-624)."""
    pred = decode_boxes(pred_deltas, anchors)
    gt = decode_boxes(target_deltas, anchors)
    px1, py1 = pred[..., 0], pred[..., 1]
    px2 = jnp.maximum(px1, pred[..., 2])
    py2 = jnp.maximum(py1, pred[..., 3])
    gx1, gy1, gx2, gy2 = gt[..., 0], gt[..., 1], gt[..., 2], gt[..., 3]
    pa = (px2 - px1) * (py2 - py1)
    ga = (gx2 - gx1) * (gy2 - gy1)
    ix1 = jnp.maximum(px1, gx1)
    iy1 = jnp.maximum(py1, gy1)
    ix2 = jnp.minimum(px2, gx2)
    iy2 = jnp.minimum(py2, gy2)
    inter = jnp.where((ix2 > ix1) & (iy2 > iy1),
                      (ix2 - ix1) * (iy2 - iy1), 0.0)
    ex1 = jnp.minimum(px1, gx1)
    ey1 = jnp.minimum(py1, gy1)
    ex2 = jnp.maximum(px2, gx2)
    ey2 = jnp.maximum(py2, gy2)
    enclose = (ex2 - ex1) * (ey2 - ey1) + 1e-7
    union = pa + ga - inter + 1e-7
    iou = inter / union
    return iou - (enclose - union) / enclose


def atss_grounding_loss(
    head_out: Dict[str, List[jax.Array]],
    anchors: jax.Array,                # (N, 4) all levels concatenated
    level_sizes: Sequence[int],
    gt_boxes: jax.Array,               # (B, G, 4)
    gt_valid: jax.Array,               # (B, G) bool
    positive_map: jax.Array,           # (B, G, T) 0/1 token spans per box
    text_masks: jax.Array,             # (B, T)
    reg_loss_weight: float = 2.0,
    topk: int = 9,
    assign=None,
) -> Dict[str, jax.Array]:
    """head_out: per-level lists from VLDyHead; flattened to (B, N, ...).

    Optional head outputs produce optional loss entries: "token_logits"
    -> loss_token (GLIP soft-token focal, ref loss.py:1218-1224) and
    "contrastive_logits" -> loss_contrastive_align (MDETR InfoNCE, ref
    loss.py:1226-1229).  Pass a precomputed ``assign`` (from
    batched_atss_assign) to share the assignment with the shallow
    contrastive head.
    """
    B = gt_boxes.shape[0]

    def flat(per_level, ch):
        return jnp.concatenate(
            [x.reshape(B, -1, ch) for x in per_level], axis=1)

    box_cls = flat(head_out["box_cls"], 1)[..., 0]           # (B, N)
    box_reg = flat(head_out["bbox_reg"], 4)                  # (B, N, 4)
    centerness = flat(head_out["centerness"], 1)[..., 0]     # (B, N)
    dot_logits = jnp.concatenate(head_out["dot_product_logits"],
                                 axis=1)                     # (B, N, T)

    if assign is None:
        assign = batched_atss_assign(anchors, level_sizes, gt_boxes,
                                     gt_valid, topk=topk)
    pos = assign.pos_mask                                    # (B, N)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    # ---- cls focal: binary (labels 1 at positives) -----------------------
    labels = pos.astype(jnp.int32)                           # 0/1
    cls_loss = sigmoid_focal_loss(
        box_cls.reshape(-1, 1), labels.reshape(-1),
        num_classes=1).sum() / num_pos

    # ---- token loss ------------------------------------------------------
    T = positive_map.shape[-1]
    matched_map = jnp.take_along_axis(
        positive_map, assign.assigned_gt[..., None], axis=1)  # (B, N, T)
    no_object = jnp.zeros((T,)).at[-1].set(1.0)
    token_labels = jnp.where(pos[..., None], matched_map,
                             no_object[None, None, :])
    token_loss = token_sigmoid_focal_loss(
        dot_logits, token_labels,
        text_mask=text_masks[:, None, :]).sum() / num_pos

    # ---- reg + centerness at positives ----------------------------------
    anchors_b = jnp.broadcast_to(anchors[None], (B,) + anchors.shape)
    ctr_t = centerness_from_targets(assign.reg_targets, anchors_b)  # (B, N)
    ctr_t = jnp.where(pos, ctr_t, 0.0)
    sum_ctr = jnp.maximum(ctr_t.sum(), 1e-6)
    giou = _giou_decoded(box_reg, assign.reg_targets, anchors_b)
    reg_loss = (jnp.where(pos, (1.0 - giou) * ctr_t, 0.0).sum()
                / sum_ctr) * reg_loss_weight
    ctr_loss = jnp.where(pos, centerness_bce(centerness, ctr_t),
                         0.0).sum() / num_pos

    out = {"loss_cls": cls_loss, "loss_reg": reg_loss,
           "loss_centerness": ctr_loss,
           "loss_dot_product_token": token_loss}

    if "token_logits" in head_out:          # USE_TOKEN_LOSS
        t_logits = jnp.concatenate(head_out["token_logits"], axis=1)
        out["loss_token"] = token_sigmoid_focal_loss(
            t_logits, token_labels,
            text_mask=text_masks[:, None, :]).sum() / num_pos

    if "contrastive_logits" in head_out:    # USE_CONTRASTIVE_ALIGN_LOSS
        from fiber_tpu.detection.contrastive import contrastive_align_loss
        c_logits = jnp.concatenate(head_out["contrastive_logits"], axis=1)
        # map labels: matched gt token span at positives, all-False rows
        # at unmatched anchors (ref loss.py:782-789 — no no-object entry)
        map_labels = jnp.where(pos[..., None], matched_map > 0, False)
        out["loss_contrastive_align"] = contrastive_align_loss(
            c_logits, map_labels) / num_pos

    return out
