"""Multi-scale + flip test-time augmentation with box voting.

Behavioral spec: data/datasets/evaluation/box_aug.py:1-357
(im_detect_bbox_aug: run inference at TEST.RANGES scales and the
horizontal flip, concatenate per-image detections, then either plain NMS
(SPECIAL_NMS='none') or vote-merge overlapping boxes weighted by score
(VOTE_TH)).  TPU redesign: each scale is one jit'd inference at a static
bucket shape; the merge runs on host numpy over the fixed-size valid
detections.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def box_voting(boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
               vote_thresh: float = 0.66,
               score_method: str = "avg") -> Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray]:
    """Merge clusters of same-class boxes above vote_thresh IoU into
    score-weighted averages (ref box_aug.py bbox_vote semantics)."""
    order = np.argsort(-scores)
    boxes, scores, labels = boxes[order], scores[order], labels[order]
    used = np.zeros(len(boxes), bool)
    out_b, out_s, out_l = [], [], []
    for i in range(len(boxes)):
        if used[i]:
            continue
        same = (labels == labels[i]) & ~used
        iou = _iou_matrix(boxes[i:i + 1], boxes)[0]
        cluster = same & (iou >= vote_thresh)
        used |= cluster
        w = scores[cluster]
        merged = (boxes[cluster] * w[:, None]).sum(0) / w.sum()
        if score_method == "avg":
            s = float(w.mean())
        else:  # 'max' keeps the top vote
            s = float(w.max())
        out_b.append(merged)
        out_s.append(s)
        out_l.append(labels[i])
    return (np.asarray(out_b).reshape(-1, 4), np.asarray(out_s),
            np.asarray(out_l, labels.dtype))


def _nms_host(boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
              thresh: float) -> np.ndarray:
    keep = []
    order = np.argsort(-scores)
    supp = np.zeros(len(boxes), bool)
    for i in order:
        if supp[i]:
            continue
        keep.append(i)
        same = labels == labels[i]
        iou = _iou_matrix(boxes[i:i + 1], boxes)[0]
        supp |= same & (iou >= thresh)
    return np.asarray(keep, np.int64)


def im_detect_bbox_aug(
    infer_fn: Callable[[np.ndarray, bool], Dict[str, np.ndarray]],
    image: np.ndarray,
    scales: Sequence[float] = (0.75, 1.0, 1.25),
    hflip: bool = True,
    vote_thresh: float = 0.66,
    nms_thresh: float = 0.5,
    max_detections: int = 100,
    use_voting: bool = True,
) -> Dict[str, np.ndarray]:
    """Run `infer_fn(scaled_image, flipped) -> {boxes, scores, labels}`
    (boxes in ORIGINAL image coordinates — infer_fn owns the rescale)
    over the scale/flip grid and merge (ref im_detect_bbox_aug +
    im_detect_bbox_hflip)."""
    all_b, all_s, all_l = [], [], []
    h, w = image.shape[:2]
    for s in scales:
        for flip in ((False, True) if hflip else (False,)):
            img = image
            if s != 1.0:
                import jax
                img = np.asarray(jax.image.resize(
                    image.astype(np.float32),
                    (int(h * s), int(w * s), image.shape[2]),
                    "bilinear")).astype(image.dtype)
            if flip:
                img = img[:, ::-1]
            det = infer_fn(img, flip)
            b = np.asarray(det["boxes"], np.float32) / s
            if flip:
                x1 = w - b[:, 2] - 1
                x2 = w - b[:, 0] - 1
                b = np.stack([x1, b[:, 1], x2, b[:, 3]], 1)
            all_b.append(b)
            all_s.append(np.asarray(det["scores"], np.float32))
            all_l.append(np.asarray(det["labels"]))
    boxes = np.concatenate(all_b)
    scores = np.concatenate(all_s)
    labels = np.concatenate(all_l)
    if len(boxes) == 0:
        return {"boxes": boxes, "scores": scores, "labels": labels}
    if use_voting:
        boxes, scores, labels = box_voting(boxes, scores, labels,
                                           vote_thresh)
    keep = _nms_host(boxes, scores, labels, nms_thresh)[:max_detections]
    return {"boxes": boxes[keep], "scores": scores[keep],
            "labels": labels[keep]}
