"""ATSS post-processing: grounding->OD score conversion, per-level top-k,
decode, multi-label NMS — all static-shape.

Behavioral spec: modeling/rpn/inference.py:554-812 (ATSSPostProcessor) and
convert_grounding_to_od_logits (:741-795, SCORE_AGG="MEAN").  The
per-image dynamic candidate lists of the reference become fixed-size
top-k selections with validity masks; the grounding->class conversion is
one (A, T) x (T, C) matmul on the MXU.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.boxes import (clip_boxes, decode_boxes, ml_nms,
                                       remove_small_boxes)


class Detections(NamedTuple):
    boxes: jax.Array    # (B, K, 4)
    scores: jax.Array   # (B, K)
    labels: jax.Array   # (B, K) int32, 1-based class ids
    valid: jax.Array    # (B, K) bool


def label_to_token_matrix(positive_map_label_to_token: Dict[int, Sequence[int]],
                          num_classes: int, num_tokens: int) -> np.ndarray:
    """Dense (C, T) mean-aggregation matrix from the {label: [token idx]}
    map built at query time (ref engine/inference.py:156-272)."""
    m = np.zeros((num_classes, num_tokens), np.float32)
    for label, toks in positive_map_label_to_token.items():
        if len(toks):
            m[label - 1, list(toks)] = 1.0 / len(toks)
    return m


def grounding_to_od_scores(dot_product_logits: jax.Array,
                           agg_matrix: jax.Array) -> jax.Array:
    """sigmoid(logits) (B, A, T) x (C, T) mean-agg -> (B, A, C)."""
    probs = jax.nn.sigmoid(dot_product_logits.astype(jnp.float32))
    return jnp.einsum("bat,ct->bac", probs, agg_matrix)


def atss_postprocess(
    head_out: Dict[str, List[jax.Array]],
    anchors_per_level: Sequence[jax.Array],
    agg_matrix: jax.Array,              # (C, T) from label_to_token_matrix
    image_sizes: jax.Array,             # (B, 2) (h, w) true sizes
    pre_nms_thresh: float = 0.05,
    pre_nms_top_n: int = 1000,
    nms_thresh: float = 0.6,
    post_nms_top_n: int = 100,
    min_size: float = 0.0,
) -> Detections:
    """Decode + select per level, then class-aware NMS across levels."""
    num_classes = agg_matrix.shape[0]
    B = head_out["centerness"][0].shape[0]

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for lvl, anchors in enumerate(anchors_per_level):
        ctr = jax.nn.sigmoid(
            head_out["centerness"][lvl].reshape(B, -1).astype(jnp.float32))
        reg = head_out["bbox_reg"][lvl].reshape(B, -1, 4)
        dot = head_out["dot_product_logits"][lvl]            # (B, A, T)
        scores = grounding_to_od_scores(dot, agg_matrix)     # (B, A, C)
        candidate = scores > pre_nms_thresh
        scores = scores * ctr[:, :, None]

        A = scores.shape[1]
        k = min(pre_nms_top_n, A * num_classes)
        flat_scores = jnp.where(candidate, scores, 0.0).reshape(B, -1)
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)   # (B, k)
        loc = top_idx // num_classes
        cls = top_idx % num_classes + 1
        valid = top_scores > 0.0

        deltas = jnp.take_along_axis(reg, loc[..., None], axis=1)
        boxes = decode_boxes(deltas, anchors[loc])
        h = image_sizes[:, 0:1].astype(boxes.dtype)
        w = image_sizes[:, 1:2].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w - 1),
            jnp.clip(boxes[..., 1], 0, h - 1),
            jnp.clip(boxes[..., 2], 0, w - 1),
            jnp.clip(boxes[..., 3], 0, h - 1)], axis=-1)
        valid = valid & remove_small_boxes(boxes, min_size)

        all_boxes.append(boxes)
        all_scores.append(jnp.sqrt(jnp.clip(top_scores, 0.0)))
        all_labels.append(cls)
        all_valid.append(valid)

    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    labels = jnp.concatenate(all_labels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    def per_image(b, s, l, v):
        keep, ok = ml_nms(b, s, l, nms_thresh, post_nms_top_n, valid=v)
        return b[keep], jnp.where(ok, s[keep], 0.0), l[keep], ok

    kb, ks, kl, kv = jax.vmap(per_image)(boxes, scores, labels, valid)
    return Detections(boxes=kb, scores=ks, labels=kl, valid=kv)
