"""Detection / grounding evaluators (host-side numpy).

Replacements for the reference evaluators (SURVEY.md §2.2):
* COCO-style mAP (data/datasets/evaluation/coco + pycocotools) —
  self-contained 101-point-interpolated AP over IoU 0.5:0.95, per-class,
  with maxDets=100, so no pycocotools dependency is needed.
* Flickr30k phrase-grounding Recall@k (flickr/flickr_eval.py:396-443):
  a phrase is recalled if any predicted box for it hits IoU>=0.5 with a
  GT box.
* RefExp accuracy (refexp.py:18): top-1 box IoU>=0.5 with the target.
* EXPECTED_RESULTS-style regression assert (coco_eval.py:42).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def average_precision(scores: np.ndarray, matched: np.ndarray,
                      num_gt: int) -> float:
    """COCO 101-point interpolated AP for one class/IoU threshold."""
    if num_gt == 0:
        return float("nan")
    order = np.argsort(-scores)
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / num_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # precision envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    rec_thrs = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, rec_thrs, side="left")
    p = np.zeros_like(rec_thrs)
    valid = idx < len(precision)
    p[valid] = precision[idx[valid]]
    return float(p.mean())


def match_detections(det_boxes: np.ndarray, det_scores: np.ndarray,
                     gt_boxes: np.ndarray, iou_thr: float
                     ) -> np.ndarray:
    """Greedy score-ordered matching (COCOeval semantics: each GT used
    once, detections matched to the best available GT)."""
    matched = np.zeros(len(det_boxes), bool)
    if len(gt_boxes) == 0 or len(det_boxes) == 0:
        return matched
    ious = _iou_matrix(det_boxes, gt_boxes)
    taken = np.zeros(len(gt_boxes), bool)
    for d in np.argsort(-det_scores):
        best, best_iou = -1, iou_thr
        for g in range(len(gt_boxes)):
            if taken[g]:
                continue
            if ious[d, g] >= best_iou:
                best, best_iou = g, ious[d, g]
        if best >= 0:
            taken[best] = True
            matched[d] = True
    return matched


def coco_map(predictions: Sequence[Dict], ground_truths: Sequence[Dict],
             iou_thrs: Optional[np.ndarray] = None,
             max_dets: int = 100) -> Dict[str, float]:
    """predictions[i]: {boxes (N,4) xyxy, scores (N,), labels (N,)};
    ground_truths[i]: {boxes (M,4), labels (M,)} for the same image.

    Returns {"mAP", "AP50", "AP75"}.
    """
    if iou_thrs is None:
        iou_thrs = np.arange(0.5, 0.96, 0.05)
    classes = sorted({int(l) for gt in ground_truths
                      for l in np.asarray(gt["labels"]).tolist()})
    ap_per_thr: Dict[float, List[float]] = {t: [] for t in iou_thrs}
    for cls in classes:
        for thr in iou_thrs:
            all_scores, all_matched, num_gt = [], [], 0
            for pred, gt in zip(predictions, ground_truths):
                g_mask = np.asarray(gt["labels"]) == cls
                g_boxes = np.asarray(gt["boxes"],
                                     np.float32).reshape(-1, 4)[g_mask]
                num_gt += int(g_mask.sum())
                p_mask = np.asarray(pred["labels"]) == cls
                boxes = np.asarray(pred["boxes"],
                                   np.float32).reshape(-1, 4)[p_mask]
                scores = np.asarray(pred["scores"], np.float32)[p_mask]
                if len(scores) > max_dets:
                    keep = np.argsort(-scores)[:max_dets]
                    boxes, scores = boxes[keep], scores[keep]
                m = match_detections(boxes, scores, g_boxes, thr)
                all_scores.append(scores)
                all_matched.append(m)
            if num_gt == 0:
                continue
            ap = average_precision(np.concatenate(all_scores),
                                   np.concatenate(all_matched), num_gt)
            ap_per_thr[thr].append(ap)
    means = {t: float(np.mean(v)) if v else float("nan")
             for t, v in ap_per_thr.items()}
    vals = [v for v in means.values() if not np.isnan(v)]

    def at(thr):
        for t, v in means.items():
            if abs(t - thr) < 1e-6:
                return v
        return float("nan")

    return {
        "mAP": float(np.mean(vals)) if vals else float("nan"),
        "AP50": at(0.5),
        "AP75": at(0.75),
    }


def flickr_grounding_recall(predictions: Sequence[Dict],
                            ground_truths: Sequence[Dict],
                            ks: Sequence[int] = (1, 5, 10)
                            ) -> Dict[str, float]:
    """Phrase grounding R@k: predictions[i] = {boxes (N,4) sorted by
    score desc}; ground_truths[i] = {boxes (M,4)} — one entry per phrase
    (ref flickr_eval.py:396-443, merged-boxes protocol)."""
    out = {f"r@{k}": 0 for k in ks}
    n = 0
    for pred, gt in zip(predictions, ground_truths):
        g = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)
        if len(g) == 0:
            continue
        n += 1
        p = np.asarray(pred["boxes"], np.float32).reshape(-1, 4)
        ious = _iou_matrix(p, g)
        hit_rank = np.inf
        for r in range(len(p)):
            if (ious[r] >= 0.5).any():
                hit_rank = r
                break
        for k in ks:
            if hit_rank < k:
                out[f"r@{k}"] += 1
    return {k: v / max(n, 1) for k, v in out.items()}


def refexp_accuracy(predictions: Sequence[Dict],
                    ground_truths: Sequence[Dict]) -> float:
    """Top-1 accuracy at IoU>=0.5 (ref refexp.py:18-80)."""
    hits, n = 0, 0
    for pred, gt in zip(predictions, ground_truths):
        g = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)
        p = np.asarray(pred["boxes"], np.float32).reshape(-1, 4)
        if len(g) == 0 or len(p) == 0:
            n += 1
            continue
        n += 1
        if _iou_matrix(p[:1], g).max() >= 0.5:
            hits += 1
    return hits / max(n, 1)


def lvis_fixed_ap(predictions: Sequence[Dict],
                  ground_truths: Sequence[Dict],
                  dets_per_class: int = 10000,
                  iou_thrs: Optional[np.ndarray] = None,
                  class_groups: Optional[Dict[int, str]] = None
                  ) -> Dict[str, float]:
    """LVIS "fixed AP" (ref lvis/lvis_eval.py:767 LvisEvaluatorFixedAP):
    instead of a per-image detection cap, each class keeps its global
    top-`dets_per_class` detections across the whole dataset, removing
    the score-calibration artifact of per-image limits.

    class_groups optionally maps class id -> "r"/"c"/"f" for the
    rare/common/frequent AP breakdown.
    """
    if iou_thrs is None:
        iou_thrs = np.arange(0.5, 0.96, 0.05)
    classes = sorted({int(l) for gt in ground_truths
                      for l in np.asarray(gt["labels"]).tolist()})
    per_class_ap: Dict[int, float] = {}
    for cls in classes:
        # pool this class's detections over the dataset, keep global top-k
        entries = []  # (score, image_idx, box)
        for i, pred in enumerate(predictions):
            mask = np.asarray(pred["labels"]) == cls
            boxes = np.asarray(pred["boxes"], np.float32).reshape(-1, 4)[
                mask]
            scores = np.asarray(pred["scores"], np.float32)[mask]
            for b, s in zip(boxes, scores):
                entries.append((float(s), i, b))
        entries.sort(key=lambda e: -e[0])
        entries = entries[:dets_per_class]

        aps = []
        for thr in iou_thrs:
            num_gt = 0
            gt_taken = []
            for gt in ground_truths:
                g_mask = np.asarray(gt["labels"]) == cls
                num_gt += int(g_mask.sum())
                gt_taken.append(np.zeros(int(g_mask.sum()), bool))
            if num_gt == 0:
                continue
            matched = np.zeros(len(entries), bool)
            for d, (s, i, box) in enumerate(entries):
                g_mask = np.asarray(ground_truths[i]["labels"]) == cls
                g_boxes = np.asarray(ground_truths[i]["boxes"],
                                     np.float32).reshape(-1, 4)[g_mask]
                if len(g_boxes) == 0:
                    continue
                ious = _iou_matrix(box[None], g_boxes)[0]
                order = np.argsort(-ious)
                for g in order:
                    if ious[g] < thr:
                        break
                    if not gt_taken[i][g]:
                        gt_taken[i][g] = True
                        matched[d] = True
                        break
            scores = np.asarray([e[0] for e in entries], np.float32)
            aps.append(average_precision(scores, matched, num_gt))
        if aps:
            per_class_ap[cls] = float(np.mean(aps))
    vals = list(per_class_ap.values())
    out = {"fixed_mAP": float(np.mean(vals)) if vals else float("nan")}
    if class_groups:
        for g in ("r", "c", "f"):
            gv = [ap for c, ap in per_class_ap.items()
                  if class_groups.get(c) == g]
            out[f"fixed_mAP_{g}"] = (float(np.mean(gv)) if gv
                                     else float("nan"))
    return out


def check_expected_results(metrics: Dict[str, float],
                           expected: Sequence[Tuple[str, float, float]]
                           ) -> List[str]:
    """EXPECTED_RESULTS regression assert (ref coco_eval.py:42-70):
    each entry (metric, mean, tol); returns list of violation messages."""
    errors = []
    for name, mean, tol in expected:
        actual = metrics.get(name)
        if actual is None:
            errors.append(f"missing metric {name}")
        elif not (mean - tol <= actual <= mean + tol):
            errors.append(
                f"{name}={actual:.4f} outside {mean:.4f}+-{tol:.4f}")
    return errors
