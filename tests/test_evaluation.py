"""Tests for the detection/grounding evaluators."""

import numpy as np
import pytest

from fiber_tpu.detection import evaluation as ev


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10]], np.float32)
    m = ev._iou_matrix(a, b)
    np.testing.assert_allclose(m[0], [1.0, 50 / 150], atol=1e-6)


def test_coco_map_perfect_predictions():
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
            "labels": np.array([1, 2])}]
    preds = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([1, 2])}]
    m = ev.coco_map(preds, gts)
    assert m["mAP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)


def test_coco_map_half_right():
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
            "labels": np.array([1, 1])}]
    # one perfect hit, one total miss; a false positive with lower score
    preds = [{"boxes": np.array([[0, 0, 10, 10], [100, 100, 110, 110]]),
              "scores": np.array([0.9, 0.5]),
              "labels": np.array([1, 1])}]
    m = ev.coco_map(preds, gts)
    # recall caps at 0.5 with precision 1 up to there -> AP ~ 0.5
    assert 0.45 <= m["AP50"] <= 0.55


def test_coco_map_localization_quality_matters():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1])}]
    # IoU = 0.7 box: counts at thresholds 0.5-0.70 only (4/10)
    preds = [{"boxes": np.array([[0, 0, 10, 7.0]]),
              "scores": np.array([0.9]), "labels": np.array([1])}]
    m = ev.coco_map(preds, gts)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(0.0)
    assert 0.3 <= m["mAP"] <= 0.6


def test_greedy_matching_one_gt_per_det():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    dets = np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
    scores = np.array([0.9, 0.95])
    matched = ev.match_detections(dets, scores, gt, 0.5)
    # higher-scoring det takes the GT; the other is unmatched
    assert matched[1] and not matched[0]


def test_flickr_recall():
    gts = [{"boxes": np.array([[0, 0, 10, 10]])},
           {"boxes": np.array([[0, 0, 10, 10]])}]
    preds = [
        {"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]])},  # rank 1
        {"boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]])},  # rank 2
    ]
    m = ev.flickr_grounding_recall(preds, gts, ks=(1, 5))
    assert m["r@1"] == 0.5
    assert m["r@5"] == 1.0


def test_refexp_accuracy():
    gts = [{"boxes": np.array([[0, 0, 10, 10]])}]
    preds = [{"boxes": np.array([[1, 1, 10, 10], [70, 70, 80, 80]])}]
    assert ev.refexp_accuracy(preds, gts) == 1.0
    preds = [{"boxes": np.array([[70, 70, 80, 80], [0, 0, 10, 10]])}]
    assert ev.refexp_accuracy(preds, gts) == 0.0


def test_check_expected_results():
    errs = ev.check_expected_results({"mAP": 0.49},
                                     [("mAP", 0.493, 0.02)])
    assert errs == []
    errs = ev.check_expected_results({"mAP": 0.40},
                                     [("mAP", 0.493, 0.02)])
    assert len(errs) == 1


def test_coco_map_speed_500_images():
    """Vectorized matcher speed guard: 500 imgs x 80 classes well under
    10 s (measured 41 s for 5000 images on this 1-core host — the <60 s
    round-3 requirement)."""
    import time
    rng = np.random.default_rng(0)
    preds, gts = [], []
    for i in range(500):
        ng = int(rng.integers(1, 12))
        g = np.concatenate([rng.uniform(0, 400, (ng, 2)),
                            rng.uniform(20, 200, (ng, 2))], 1)
        g[:, 2:] += g[:, :2]
        gl = rng.integers(1, 81, ng)
        nd = int(rng.integers(5, 40))
        p = np.concatenate([rng.uniform(0, 400, (nd, 2)),
                            rng.uniform(20, 200, (nd, 2))], 1)
        p[:, 2:] += p[:, :2]
        k = min(ng, nd // 2)
        p[:k] = g[:k] + rng.normal(0, 8, (k, 4))
        pl = np.concatenate([gl[:k], rng.integers(1, 81, nd - k)])
        preds.append({"boxes": p, "scores": rng.uniform(0, 1, nd),
                      "labels": pl})
        gts.append({"boxes": g, "labels": gl})
    t0 = time.time()
    m = ev.coco_map(preds, gts)
    assert time.time() - t0 < 10
    assert 0 <= m["mAP"] <= 1


def _kpt_gt(xy, size=100.0, vis=None):
    xy = np.asarray(xy, np.float64)          # (K, 2)
    K = len(xy)
    v = np.full(K, 2.0) if vis is None else np.asarray(vis, np.float64)
    return {"boxes": np.array([[0, 0, size, size]]),
            "labels": np.array([1]),
            "areas": np.array([size * size]),
            "keypoints": np.stack([xy[:, 0], xy[:, 1], v], -1)[None]}


def _kpt_pred(xy):
    xy = np.asarray(xy, np.float64)
    K = len(xy)
    return {"boxes": np.array([[0, 0, 100, 100]]),
            "scores": np.array([0.9]), "labels": np.array([1]),
            "keypoints": np.stack([xy[:, 0], xy[:, 1],
                                   np.ones(K)], -1)[None]}


def test_keypoint_map_perfect():
    gt_xy = [[10, 10], [50, 50], [90, 30]]
    m = ev.coco_map([_kpt_pred(gt_xy)], [_kpt_gt(gt_xy)],
                    iou_type="keypoints",
                    kpt_sigmas=np.array([0.1, 0.1, 0.1]))
    assert m["mAP"] == pytest.approx(1.0)


def test_keypoint_map_oks_calibrated():
    """One joint displaced so OKS = exp(-d^2 / ((2s)^2 * area * 2));
    with s=0.1, area=1e4, d chosen for OKS ~= 0.7: hits at thresholds
    .5-.7 only (pycocotools computeOks formula)."""
    d = np.sqrt(-800.0 * np.log(0.7))
    gt_xy = [[50.0, 50.0]]
    pred_xy = [[50.0 + d, 50.0]]
    m = ev.coco_map([_kpt_pred(pred_xy)], [_kpt_gt(gt_xy)],
                    iou_type="keypoints", kpt_sigmas=np.array([0.1]))
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(0.0)
    assert 0.3 <= m["mAP"] <= 0.6


def test_keypoint_map_invisible_joints_ignored():
    """v=0 GT joints contribute nothing to OKS (pycocotools: vis mask)."""
    gt_xy = [[50, 50], [10, 10]]
    pred_xy = [[50, 50], [999, 999]]        # 2nd joint wildly off
    m = ev.coco_map([_kpt_pred(pred_xy)],
                    [_kpt_gt(gt_xy, vis=[2, 0])],
                    iou_type="keypoints",
                    kpt_sigmas=np.array([0.1, 0.1]))
    assert m["mAP"] == pytest.approx(1.0)
