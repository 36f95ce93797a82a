"""Parity pins of the VOC and classic-LVIS evaluators against the
reference implementations executed in-process:

* eval_detection_voc (evaluation/voc/voc_eval.py:46-210) — both the
  07 11-point metric and the monotone-envelope area metric
* LVISEval bbox path (evaluation/lvis/lvis_eval.py:156-588) — per-image
  caps, federated filtering, rare/common/frequent AP splits

The reference LVISEval needs pycocotools.mask.iou only for plain xywh
box IoU here (iou_type="bbox", iscrowd all 0), which the loader stub
implements exactly.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from fiber_tpu.detection.evaluation import (  # noqa: E402
    lvis_classic_eval, voc_detection_map)

from reference_loader_det import setup_fine_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    setup_fine_reference()
    return True


def _rand_boxes(rng, n, size=400.0):
    xy = rng.uniform(0, size * 0.7, (n, 2))
    wh = rng.uniform(4, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def _perturbed(rng, gt_boxes, n_extra):
    """Detections: jittered copies of some GTs + random noise boxes."""
    out = []
    for b in gt_boxes:
        if rng.random() < 0.7:
            out.append(b + rng.normal(0, 6, 4))
    out.extend(_rand_boxes(rng, n_extra))
    return np.asarray(out).reshape(-1, 4)


# ---------------------------------------------------------------------------
# VOC
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("use_07", [True, False])
def test_voc_parity(ref, use_07):
    from maskrcnn_benchmark.data.datasets.evaluation.voc.voc_eval import (
        eval_detection_voc)
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    rng = np.random.default_rng(7 if use_07 else 8)
    n_img, n_cls = 30, 6
    preds, gts = [], []
    pred_bl, gt_bl = [], []
    for _ in range(n_img):
        n_gt = int(rng.integers(0, 8))
        g_box = _rand_boxes(rng, n_gt)
        g_lbl = rng.integers(1, n_cls + 1, n_gt)
        g_dif = rng.random(n_gt) < 0.25
        d_box = _perturbed(rng, g_box, int(rng.integers(0, 6)))
        n_d = len(d_box)
        d_lbl = np.where(rng.random(n_d) < 0.8,
                         np.concatenate([g_lbl, rng.integers(
                             1, n_cls + 1, n_d - n_gt)])[:n_d]
                         if n_d >= n_gt else rng.integers(1, n_cls + 1, n_d),
                         rng.integers(1, n_cls + 1, n_d))
        d_scr = rng.random(n_d)

        preds.append({"boxes": d_box, "labels": d_lbl, "scores": d_scr})
        gts.append({"boxes": g_box, "labels": g_lbl, "difficult": g_dif})

        pb = BoxList(torch.as_tensor(d_box, dtype=torch.float64),
                     (500, 500))
        pb.add_field("labels", torch.as_tensor(d_lbl))
        pb.add_field("scores", torch.as_tensor(d_scr, dtype=torch.float64))
        gb = BoxList(torch.as_tensor(g_box, dtype=torch.float64),
                     (500, 500))
        gb.add_field("labels", torch.as_tensor(g_lbl))
        gb.add_field("difficult", torch.as_tensor(g_dif))
        pred_bl.append(pb)
        gt_bl.append(gb)

    ref_out = eval_detection_voc(pred_bl, gt_bl, iou_thresh=0.5,
                                 use_07_metric=use_07)
    ours = voc_detection_map(preds, gts, iou_thresh=0.5,
                             use_07_metric=use_07)

    assert ours["map"] == pytest.approx(float(ref_out["map"]), abs=1e-9)
    for l, a in ours["ap"].items():
        r = float(ref_out["ap"][l])
        if np.isnan(a):
            assert np.isnan(r)
        else:
            assert a == pytest.approx(r, abs=1e-9), f"class {l}"


# ---------------------------------------------------------------------------
# classic LVIS
# ---------------------------------------------------------------------------
def test_lvis_classic_parity(ref, tmp_path):
    from maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis_eval import (
        LVISEval)
    from maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis import LVIS

    rng = np.random.default_rng(11)
    n_img = 24
    cats = list(range(1, 13))
    freq = {c: ("r" if c % 4 == 0 else "c" if c % 4 == 1 else "f")
            for c in cats}

    images, annotations, results = [], [], []
    preds, gts = [], []
    ann_id = 1
    for i in range(1, n_img + 1):
        n_gt = int(rng.integers(0, 9))
        g_box = _rand_boxes(rng, n_gt)
        g_lbl = rng.integers(1, 13, n_gt)
        g_ign = (rng.random(n_gt) < 0.15).astype(int)
        # mix tiny / medium / huge areas to exercise the area ranges;
        # LVIS reads the annotation's own "area" field, not the box area
        g_area = np.exp(rng.uniform(np.log(50), np.log(150000), n_gt))
        pos = set(int(c) for c in g_lbl)
        neg = [c for c in cats
               if c not in pos and rng.random() < 0.3]
        nel = [c for c in cats if rng.random() < 0.2]
        images.append({"id": i, "width": 500, "height": 500,
                       "neg_category_ids": neg,
                       "not_exhaustive_category_ids": nel})
        for b, l, ig, a in zip(g_box, g_lbl, g_ign, g_area):
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": int(l),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "area": float(a), "ignore": int(ig)})
            ann_id += 1
        d_box = _perturbed(rng, g_box, int(rng.integers(2, 10)))
        n_d = len(d_box)
        d_lbl = rng.integers(1, 13, n_d)
        # bias some detections onto their source GT's label
        for k in range(min(n_gt, n_d)):
            if rng.random() < 0.7:
                d_lbl[k] = g_lbl[k]
        d_scr = rng.random(n_d)
        for b, l, s in zip(d_box, d_lbl, d_scr):
            results.append({"image_id": i, "category_id": int(l),
                            "bbox": [float(b[0]), float(b[1]),
                                     float(b[2] - b[0]),
                                     float(b[3] - b[1])],
                            "score": float(s)})
        preds.append({"boxes": d_box, "labels": d_lbl, "scores": d_scr})
        gts.append({"boxes": g_box, "labels": g_lbl, "areas": g_area,
                    "ignore": g_ign, "neg_category_ids": neg,
                    "not_exhaustive_category_ids": nel})

    gt_json = tmp_path / "lvis_gt.json"
    gt_json.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "frequency": freq[c], "name": str(c)}
                       for c in cats]}))

    lvis_gt = LVIS(str(gt_json))
    ref_eval = LVISEval(lvis_gt, results, iou_type="bbox")
    ref_eval.evaluate()
    ref_eval.accumulate()
    ref_eval.summarize()
    ref_res = {k: float(v) for k, v in ref_eval.get_results().items()}

    ours = lvis_classic_eval(preds, gts, cat_frequencies=freq,
                             max_dets=300)

    assert set(ours) == set(ref_res)
    for k in ref_res:
        assert ours[k] == pytest.approx(ref_res[k], abs=1e-9), k


def test_lvis_classic_per_image_cap(ref, tmp_path):
    """The per-image cap must drop the lowest-scored detections before
    any other step (LVISResults.limit_dets_per_image, :137-149)."""
    from maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis_eval import (
        LVISEval)
    from maskrcnn_benchmark.data.datasets.evaluation.lvis.lvis import LVIS

    rng = np.random.default_rng(3)
    g_box = _rand_boxes(rng, 5)
    d_box = np.concatenate([g_box, _rand_boxes(rng, 15)])
    d_scr = rng.random(len(d_box))
    d_lbl = np.ones(len(d_box), np.int64)
    annotations = [{"id": k + 1, "image_id": 1, "category_id": 1,
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0]), float(b[3] - b[1])],
                    "area": float((b[2] - b[0]) * (b[3] - b[1]))}
                   for k, b in enumerate(g_box)]
    results = [{"image_id": 1, "category_id": 1,
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "score": float(s)} for b, s in zip(d_box, d_scr)]
    gt_json = tmp_path / "gt.json"
    gt_json.write_text(json.dumps({
        "images": [{"id": 1, "neg_category_ids": [],
                    "not_exhaustive_category_ids": []}],
        "annotations": annotations,
        "categories": [{"id": 1, "frequency": "f", "name": "x"}]}))

    for cap in (8, 3):
        ref_eval = LVISEval(LVIS(str(gt_json)),
                            [dict(r) for r in results], iou_type="bbox")
        ref_eval.lvis_dt = type(ref_eval.lvis_dt)(
            ref_eval.lvis_gt, [dict(r) for r in results], max_dets=cap)
        ref_eval.params.max_dets = cap
        ref_eval.evaluate()
        ref_eval.accumulate()
        ref_eval.summarize()
        ref_res = {k: float(v) for k, v in ref_eval.get_results().items()}

        ours = lvis_classic_eval(
            [{"boxes": d_box, "labels": d_lbl, "scores": d_scr}],
            [{"boxes": g_box, "labels": np.ones(5, np.int64)}],
            cat_frequencies={1: "f"}, max_dets=cap)
        for k in ref_res:
            assert ours[k] == pytest.approx(ref_res[k], abs=1e-9), \
                (cap, k)
