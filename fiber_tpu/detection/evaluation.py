"""Detection / grounding evaluators (host-side numpy).

Replacements for the reference evaluators (SURVEY.md §2.2), with the
scoring semantics matched to what the reference actually executes:

* COCO-style AP/AR (`coco_map`): faithful COCOeval semantics — greedy
  per-(image, class) matching at 10 IoU thresholds with crowd/ignore
  handling, 101-point interpolated precision, area-range APs/APm/APl and
  AR@{1,10,100} (the reference wraps pycocotools COCOeval,
  evaluation/od_to_grounding/od_eval.py:366-386; this is a vectorized
  numpy implementation of the same algorithm, since this environment has
  no pycocotools).  Supports bbox, segm (pre-rasterized masks) and
  keypoints (OKS) iou types.
* Flickr30k phrase-grounding Recall@k (flickr/flickr_eval.py:261-443):
  per-phrase ranked boxes, hit if any top-k box reaches IoU>=0.5 with a
  (optionally merged) GT box; parity-tested against the in-process
  reference evaluator (tests/test_eval_reference_parity.py).
* RefExp P@k (refexp.py:18-88): **generalized** IoU >= 0.5 within the
  top-k scored boxes, accumulated per dataset name — the reference uses
  GIoU, not IoU (refexp.py:71), which this matches and is parity-tested.
* Box-proposal AR (od_to_grounding/od_eval.py:241-363): greedy max-IoU
  covering of GT boxes by ranked proposals, averaged recall over
  0.5:0.05:0.95, with area-range filters.
* LVIS "fixed AP" (lvis/lvis_eval.py:767): per-class global top-k
  detections instead of a per-image cap.
* EXPECTED_RESULTS-style regression assert (coco_eval.py:42).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# COCO 17-keypoint OKS sigmas (pycocotools cocoeval.py Params.kpt_oks_sigmas)
COCO_KPT_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89], np.float64) / 10.0

AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_matrix(a: np.ndarray, b: np.ndarray,
                b_crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """Pairwise IoU of xyxy boxes; for crowd GT columns the denominator
    is the detection area only (pycocotools maskUtils.iou semantics)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    if b_crowd is not None and b_crowd.any():
        union = np.where(b_crowd[None, :].astype(bool), area_a[:, None],
                         union)
    return inter / np.maximum(union, 1e-12)


def _giou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise generalized IoU (ref layers/set_loss.py
    generalized_box_iou; used by RefExpEvaluator, refexp.py:71)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    iou = _iou_matrix(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    lt_i = np.maximum(a[:, None, :2], b[None, :, :2])
    rb_i = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh_i = np.clip(rb_i - lt_i, 0, None)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return iou - (hull - union) / np.maximum(hull, 1e-12)


def _mask_iou_matrix(a: np.ndarray, b: np.ndarray,
                     b_crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """Pairwise IoU of binary masks a (D,H,W), b (G,H,W)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    a = np.asarray(a, bool).reshape(len(a), -1)
    b = np.asarray(b, bool).reshape(len(b), -1)
    inter = (a[:, None, :] & b[None, :, :]).sum(-1).astype(np.float64)
    area_a = a.sum(-1).astype(np.float64)
    area_b = b.sum(-1).astype(np.float64)
    union = area_a[:, None] + area_b[None, :] - inter
    if b_crowd is not None and b_crowd.any():
        union = np.where(b_crowd[None, :].astype(bool), area_a[:, None],
                         union)
    return inter / np.maximum(union, 1e-12)


def _oks_matrix(d_kpts: np.ndarray, g_kpts: np.ndarray,
                g_areas: np.ndarray,
                sigmas: Optional[np.ndarray] = None) -> np.ndarray:
    """Object keypoint similarity between detections (D, K, 3) and GT
    (G, K, 3) with GT box areas (pycocotools computeOks semantics)."""
    if len(d_kpts) == 0 or len(g_kpts) == 0:
        return np.zeros((len(d_kpts), len(g_kpts)), np.float64)
    if sigmas is None:
        sigmas = COCO_KPT_SIGMAS
    vars_ = (sigmas * 2) ** 2
    d = np.asarray(d_kpts, np.float64)
    g = np.asarray(g_kpts, np.float64)
    dx = d[:, None, :, 0] - g[None, :, :, 0]
    dy = d[:, None, :, 1] - g[None, :, :, 1]
    vis = g[None, :, :, 2] > 0                    # (1, G, K)
    e = (dx ** 2 + dy ** 2) / vars_[None, None, :] / (
        np.asarray(g_areas, np.float64)[None, :, None] + np.spacing(1)) / 2.0
    oks = np.where(vis, np.exp(-e), 0.0).sum(-1)
    k = np.maximum(vis.sum(-1), 1)
    return oks / k


def match_detections(det_boxes: np.ndarray, det_scores: np.ndarray,
                     gt_boxes: np.ndarray, iou_thr: float
                     ) -> np.ndarray:
    """Greedy score-ordered matching (each GT used once, detections
    matched to the best available GT).  Kept for the simple/LVIS paths."""
    matched = np.zeros(len(det_boxes), bool)
    if len(gt_boxes) == 0 or len(det_boxes) == 0:
        return matched
    ious = _iou_matrix(det_boxes, gt_boxes)
    taken = np.zeros(len(gt_boxes), bool)
    for d in np.argsort(-det_scores, kind="mergesort"):
        avail = ~taken
        if not avail.any():
            break
        cand = np.where(avail, ious[d], -1.0)
        g = int(cand.argmax())
        if cand[g] >= iou_thr:
            taken[g] = True
            matched[d] = True
    return matched


def average_precision(scores: np.ndarray, matched: np.ndarray,
                      num_gt: int) -> float:
    """COCO 101-point interpolated AP for one class/IoU threshold."""
    if num_gt == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / num_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    rec_thrs = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, rec_thrs, side="left")
    p = np.zeros_like(rec_thrs)
    valid = idx < len(precision)
    p[valid] = precision[idx[valid]]
    return float(p.mean())


# ---------------------------------------------------------------------------
# COCOeval-faithful AP/AR
# ---------------------------------------------------------------------------
def _match_image(ious: np.ndarray, gt_ignore: np.ndarray,
                 iou_thrs: np.ndarray, gt_crowd: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy matching for one (image, class) at all thresholds.

    ious: (D, G) with dets already score-sorted and gts sorted
    ignored-last.  Returns (dt_match (T, D) int gt index or -1,
    dt_ignore (T, D) bool) — pycocotools cocoeval.evaluateImg loop.
    """
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.full((T, D), -1, np.int64)
    dtig = np.zeros((T, D), bool)
    if G == 0:
        return dtm, dtig
    gtm = np.full((T, G), -1, np.int64)
    for ti, t in enumerate(iou_thrs):
        thr = min(t, 1 - 1e-10)
        for d in range(D):
            best_iou = thr
            m = -1
            for g in range(G):
                if gtm[ti, g] >= 0 and not gt_crowd[g]:
                    continue
                # gts are sorted non-ignored first: once we have a real
                # match, never trade it for an ignored gt
                if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                m = g
            if m == -1:
                continue
            dtig[ti, d] = gt_ignore[m]
            dtm[ti, d] = m
            gtm[ti, m] = d
    return dtm, dtig


def coco_map(predictions: Sequence[Dict], ground_truths: Sequence[Dict],
             iou_thrs: Optional[np.ndarray] = None,
             max_dets: Sequence[int] = (1, 10, 100),
             iou_type: str = "bbox",
             kpt_sigmas: Optional[np.ndarray] = None) -> Dict[str, float]:
    """COCO AP/AR with full COCOeval semantics.

    predictions[i]: {boxes (N,4) xyxy, scores (N,), labels (N,)}
      + "masks" (N,H,W) bool for iou_type="segm"
      + "keypoints" (N,K,3) for iou_type="keypoints"
    ground_truths[i]: {boxes (M,4), labels (M,)}
      + optional "iscrowd" (M,), "areas" (M,)
      + "masks"/"keypoints" per iou_type.

    Returns {mAP, AP50, AP75, APs, APm, APl, AR1, AR10, AR100, ARs, ARm,
    ARl} (nan where no GT exists), matching pycocotools summarize().
    """
    if iou_thrs is None:
        iou_thrs = np.linspace(0.5, 0.95, 10)
    iou_thrs = np.asarray(iou_thrs, np.float64)
    rec_thrs = np.linspace(0.0, 1.0, 101)
    max_det = int(max(max_dets))
    if iou_type == "keypoints":
        areas = [("all", AREA_RNG["all"]), ("medium", AREA_RNG["medium"]),
                 ("large", AREA_RNG["large"])]
    else:
        areas = list(AREA_RNG.items())
    T, A, M = len(iou_thrs), len(areas), len(max_dets)

    classes = sorted({int(l) for gt in ground_truths
                      for l in np.asarray(gt["labels"]).reshape(-1).tolist()})
    K = len(classes)
    precision = np.full((T, len(rec_thrs), K, A, M), -1.0)
    recall = np.full((T, K, A, M), -1.0)

    n_img = len(predictions)
    # pre-extract per-image arrays once
    imgs = []
    for pred, gt in zip(predictions, ground_truths):
        p_boxes = np.asarray(pred.get("boxes", np.zeros((0, 4))),
                             np.float64).reshape(-1, 4)
        p_scores = np.asarray(pred.get("scores", np.zeros(0)), np.float64
                              ).reshape(-1)
        p_labels = np.asarray(pred.get("labels", np.zeros(0)), np.int64
                              ).reshape(-1)
        g_boxes = np.asarray(gt.get("boxes", np.zeros((0, 4))),
                             np.float64).reshape(-1, 4)
        g_labels = np.asarray(gt.get("labels", np.zeros(0)), np.int64
                              ).reshape(-1)
        g_crowd = np.asarray(gt.get("iscrowd", np.zeros(len(g_boxes))),
                             bool).reshape(-1)
        if "areas" in gt:
            g_areas = np.asarray(gt["areas"], np.float64).reshape(-1)
        else:
            g_areas = (np.clip(g_boxes[:, 2] - g_boxes[:, 0], 0, None)
                       * np.clip(g_boxes[:, 3] - g_boxes[:, 1], 0, None))
        imgs.append((p_boxes, p_scores, p_labels, pred, g_boxes, g_labels,
                     g_crowd, g_areas, gt))

    for ki, cls in enumerate(classes):
        # per-image eval results for this class
        per_img = []  # (scores_sorted, dtm, dtig, gt_ignore_per_area,
        #               det_areas, n_gt_per_area)
        for (p_boxes, p_scores, p_labels, pred, g_boxes, g_labels,
             g_crowd, g_areas, gt) in imgs:
            dmask = p_labels == cls
            gmask = g_labels == cls
            if not dmask.any() and not gmask.any():
                continue
            scores = p_scores[dmask]
            order = np.argsort(-scores, kind="mergesort")[:max_det]
            scores = scores[order]
            dboxes = p_boxes[dmask][order]
            gboxes = g_boxes[gmask]
            crowd = g_crowd[gmask]
            gareas = g_areas[gmask]

            if iou_type == "bbox":
                d_areas = (np.clip(dboxes[:, 2] - dboxes[:, 0], 0, None)
                           * np.clip(dboxes[:, 3] - dboxes[:, 1], 0, None))
            elif iou_type == "segm":
                d_masks = np.asarray(pred["masks"])[dmask][order]
                d_areas = d_masks.reshape(len(d_masks), -1).sum(-1).astype(
                    np.float64) if len(d_masks) else np.zeros(0)
            else:  # keypoints: det area from its box
                d_areas = (np.clip(dboxes[:, 2] - dboxes[:, 0], 0, None)
                           * np.clip(dboxes[:, 3] - dboxes[:, 1], 0, None))

            # area-range matching: gt ignore flags depend on the range,
            # so matching is run per range (pycocotools does the same:
            # one evaluateImg per (img, cat, aRng))
            entry = {"scores": scores, "d_areas": d_areas}
            for ai, (_, (lo, hi)) in enumerate(areas):
                gt_ig = crowd | (gareas < lo) | (gareas > hi)
                # sort gts: non-ignored first (stable)
                gorder = np.argsort(gt_ig, kind="mergesort")
                if iou_type == "bbox":
                    ious = _iou_matrix(dboxes, gboxes[gorder],
                                       crowd[gorder])
                elif iou_type == "segm":
                    g_masks = np.asarray(gt["masks"])[gmask]
                    ious = _mask_iou_matrix(d_masks, g_masks[gorder],
                                            crowd[gorder])
                else:
                    d_kpts = np.asarray(pred["keypoints"])[dmask][order]
                    g_kpts = np.asarray(gt["keypoints"])[gmask]
                    ious = _oks_matrix(d_kpts, g_kpts[gorder],
                                       gareas[gorder], kpt_sigmas)
                dtm, dtig = _match_image(ious, gt_ig[gorder], iou_thrs,
                                         crowd[gorder])
                # unmatched dets outside the range are ignored
                out_rng = (d_areas < lo) | (d_areas > hi)
                dtig = dtig | ((dtm < 0) & out_rng[None, :])
                entry[ai] = (dtm, dtig, int((~gt_ig).sum()))
            per_img.append(entry)

        if not per_img:
            continue
        all_scores = np.concatenate([e["scores"] for e in per_img]) \
            if per_img else np.zeros(0)
        sort_idx = np.argsort(-all_scores, kind="mergesort")
        for ai in range(A):
            npig = sum(e[ai][2] for e in per_img)
            if npig == 0:
                continue
            dtm_all = np.concatenate([e[ai][0] for e in per_img], axis=1)
            dtig_all = np.concatenate([e[ai][1] for e in per_img], axis=1)
            for mi, md in enumerate(max_dets):
                # slice each image's dets to md, then merge by score
                keep = np.concatenate(
                    [np.arange(len(e["scores"])) < md for e in per_img])
                idx = sort_idx[keep[sort_idx]]
                dtm = dtm_all[:, idx]
                dtig = dtig_all[:, idx]
                tps = (dtm >= 0) & ~dtig
                fps = (dtm < 0) & ~dtig
                tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                for ti in range(T):
                    tp, fp = tp_cum[ti], fp_cum[ti]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / np.maximum(tp + fp, np.spacing(1))
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    q = np.zeros(len(rec_thrs))
                    if nd:
                        pr = pr.copy()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, rec_thrs, side="left")
                        ok = inds < nd
                        q[ok] = pr[inds[ok]]
                    precision[ti, :, ki, ai, mi] = q

    def _ap(thr=None, area="all", md=100):
        ai = [i for i, (n, _) in enumerate(areas) if n == area]
        mi = [i for i, m in enumerate(max_dets) if m == md]
        s = precision
        if thr is not None:
            s = s[np.abs(iou_thrs - thr) < 1e-6]
        s = s[:, :, :, ai, mi]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else float("nan")

    def _ar(area="all", md=100):
        ai = [i for i, (n, _) in enumerate(areas) if n == area]
        mi = [i for i, m in enumerate(max_dets) if m == md]
        s = recall[:, :, ai, mi]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else float("nan")

    md_top = int(max(max_dets))
    out = {
        "mAP": _ap(md=md_top),
        "AP50": _ap(thr=0.5, md=md_top),
        "AP75": _ap(thr=0.75, md=md_top),
        "APm": _ap(area="medium", md=md_top),
        "APl": _ap(area="large", md=md_top),
    }
    if iou_type != "keypoints":
        out["APs"] = _ap(area="small", md=md_top)
        out["ARs"] = _ar(area="small", md=md_top)
    for md in max_dets:
        out[f"AR{md}"] = _ar(md=md)
    out["ARm"] = _ar(area="medium", md=md_top)
    out["ARl"] = _ar(area="large", md=md_top)
    return out


# ---------------------------------------------------------------------------
def _legacy_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """boxlist_iou semantics (structures/boxlist_ops.py:96-130): +1
    inclusive pixel widths — the reference's proposal-AR IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1.0, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def box_proposal_ar(predictions: Sequence[Dict],
                    ground_truths: Sequence[Dict],
                    area: str = "all", limit: Optional[int] = None,
                    thresholds: Optional[np.ndarray] = None,
                    legacy_plus_one: bool = True) -> Dict[str, float]:
    """Detection-proposal average recall (ref od_eval.py:241-363
    evaluate_box_proposals): proposals ranked by score greedily cover GT
    boxes by max IoU; AR = mean recall over IoU 0.5:0.05:0.95.

    predictions[i]: {boxes (N,4) xyxy, scores (N,)};
    ground_truths[i]: {boxes (M,4), optional areas (M,)}.
    legacy_plus_one matches the reference's boxlist_iou (+1 inclusive
    widths); pass False for modern IoU.
    """
    rngs = {
        "all": (0.0, 1e10), "small": (0.0, 32 ** 2),
        "medium": (32 ** 2, 96 ** 2), "large": (96 ** 2, 1e10),
        "96-128": (96 ** 2, 128 ** 2), "128-256": (128 ** 2, 256 ** 2),
        "256-512": (256 ** 2, 512 ** 2), "512-inf": (512 ** 2, 1e10),
    }
    lo, hi = rngs[area]
    if thresholds is None:
        thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05)
    gt_overlaps = []
    num_pos = 0
    for pred, gt in zip(predictions, ground_truths):
        g = np.asarray(gt.get("boxes", np.zeros((0, 4))),
                       np.float64).reshape(-1, 4)
        if len(g) == 0:
            continue
        if "areas" in gt:
            ga = np.asarray(gt["areas"], np.float64).reshape(-1)
        else:
            ga = (np.clip(g[:, 2] - g[:, 0], 0, None)
                  * np.clip(g[:, 3] - g[:, 1], 0, None))
        valid = (ga >= lo) & (ga <= hi)
        g = g[valid]
        num_pos += len(g)
        if len(g) == 0:
            continue
        p = np.asarray(pred.get("boxes", np.zeros((0, 4))),
                       np.float64).reshape(-1, 4)
        if len(p) == 0:
            continue
        scores = np.asarray(pred.get("scores", np.zeros(len(p))),
                            np.float64).reshape(-1)
        order = np.argsort(-scores, kind="stable")
        p = p[order]
        if limit is not None and len(p) > limit:
            p = p[:limit]
        overlaps = (_legacy_iou_matrix(p, g) if legacy_plus_one
                    else _iou_matrix(p, g))
        ov = np.zeros(len(g))
        for j in range(min(len(p), len(g))):
            per_gt_max = overlaps.max(axis=0)
            per_gt_arg = overlaps.argmax(axis=0)
            gi = int(per_gt_max.argmax())
            bi = int(per_gt_arg[gi])
            ov[j] = overlaps[bi, gi]
            overlaps[bi, :] = -1
            overlaps[:, gi] = -1
        gt_overlaps.append(ov)
    if not gt_overlaps:
        return {"ar": 0.0, "num_pos": 0}
    all_ov = np.sort(np.concatenate(gt_overlaps))
    recalls = np.array([(all_ov >= t).sum() / max(num_pos, 1)
                        for t in thresholds])
    return {"ar": float(recalls.mean()), "num_pos": int(num_pos),
            "recalls": recalls}


# ---------------------------------------------------------------------------
def flickr_grounding_recall(predictions: Sequence[Dict],
                            ground_truths: Sequence[Dict],
                            ks: Sequence[int] = (1, 5, 10),
                            iou_thresh: float = 0.5,
                            merge_boxes: bool = False) -> Dict[str, float]:
    """Phrase grounding R@k (ref flickr_eval.py:261-443): one entry per
    PHRASE; predictions[i] = {boxes (N,4) score-sorted desc};
    ground_truths[i] = {boxes (M,4)}.  A phrase is recalled@k if any of
    the top-k predicted boxes reaches IoU >= iou_thresh with any of its
    GT boxes (merged into one enclosing box when merge_boxes, the
    reference's merged-boxes protocol).  k=-1 gives the upper bound over
    all predicted boxes.
    """
    out = {f"r@{k}": 0 for k in ks}
    n = 0
    for pred, gt in zip(predictions, ground_truths):
        g = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        if len(g) == 0:
            continue
        if merge_boxes and len(g) > 1:
            g = np.array([[g[:, 0].min(), g[:, 1].min(),
                           g[:, 2].max(), g[:, 3].max()]])
        n += 1
        p = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        ious = _iou_matrix(p, g)
        best = ious.max(axis=1) if len(p) else np.zeros(0)
        for k in ks:
            top = best if k == -1 else best[:k]
            if len(top) and top.max() >= iou_thresh:
                out[f"r@{k}"] += 1
    return {k: v / max(n, 1) for k, v in out.items()}


# ---------------------------------------------------------------------------
def refexp_precision(predictions: Sequence[Dict],
                     ground_truths: Sequence[Dict],
                     ks: Sequence[int] = (1, 5, 10),
                     thresh_iou: float = 0.5) -> Dict[str, float]:
    """RefExp P@k (ref refexp.py:18-88): a referral is correct@k if any
    of the top-k scored boxes has **generalized** IoU >= thresh with the
    single target box (the reference uses generalized_box_iou,
    refexp.py:71).  predictions[i]: {boxes (N,4), scores (N,)};
    ground_truths[i]: {boxes (1,4), optional dataset_name}.

    Returns {"P@k": ...} overall plus "P@k_<dataset>" per dataset_name.
    """
    score: Dict[str, float] = {}
    count: Dict[str, float] = {}
    for pred, gt in zip(predictions, ground_truths):
        g = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[:1]
        name = gt.get("dataset_name", "refexp")
        p = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        s = np.asarray(pred.get("scores", np.arange(len(p), 0, -1)),
                       np.float64).reshape(-1)
        # reference sorts (score, box) tuples in reverse lexicographic
        # order — equal scores tie-break on box coords; plain stable
        # sort on -score matches for distinct scores
        order = np.argsort(-s, kind="mergesort")
        p = p[order]
        giou = _giou_matrix(p, g)[:, 0] if len(g) else np.zeros(len(p))
        count[name] = count.get(name, 0) + 1
        for k in ks:
            key = f"P@{k}_{name}"
            score.setdefault(key, 0.0)
            if len(giou) and giou[:k].max() >= thresh_iou:
                score[key] += 1
    out: Dict[str, float] = {}
    for k in ks:
        tot = sum(count.values())
        hits = sum(score.get(f"P@{k}_{n}", 0.0) for n in count)
        out[f"P@{k}"] = hits / max(tot, 1)
        for n, c in count.items():
            out[f"P@{k}_{n}"] = score.get(f"P@{k}_{n}", 0.0) / max(c, 1)
    return out


def refexp_accuracy(predictions: Sequence[Dict],
                    ground_truths: Sequence[Dict]) -> float:
    """Top-1 RefExp accuracy (GIoU >= 0.5, ref refexp.py:71)."""
    return refexp_precision(predictions, ground_truths, ks=(1,))["P@1"]


# ---------------------------------------------------------------------------
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
            boxes = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)[
                mask]
            scores = np.asarray(pred["scores"], np.float64)[mask]
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
                                     np.float64).reshape(-1, 4)[g_mask]
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
            scores = np.asarray([e[0] for e in entries], np.float64)
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
