"""Demo NER/overlay + multiscale box-aug voting
(ref engine/predictor_FIBER.py:106-131 run_ner,
data/datasets/evaluation/box_aug.py)."""

import numpy as np

from fiber_tpu.detection.box_aug import (box_voting, im_detect_bbox_aug,
                                         _nms_host)
from fiber_tpu.detection.demo import (find_noun_phrases, render_detections,
                                      run_ner)


def test_find_noun_phrases_heuristic():
    caption = "a red dog chasing the blue car near a tall tree"
    spans = [caption[s:e] for s, e in find_noun_phrases(caption)]
    joined = " | ".join(spans)
    assert any("dog" in s for s in spans), joined
    assert any("car" in s for s in spans), joined
    assert any("tree" in s for s in spans), joined
    assert not any("chasing" in s for s in spans), joined


def test_run_ner_all_occurrences():
    caption = "red dog. blue car. red dog"
    tp = run_ner(caption)
    by_text = {caption[o[0][0]:o[0][1]]: o for o in tp}
    assert len(by_text["red dog"]) == 2  # both occurrences marked
    assert run_ner(caption, refexp_mode=True) == [[(0, len(caption))]]


def test_render_detections():
    img = np.zeros((40, 60, 3), np.uint8)
    masks = np.zeros((1, 40, 60), bool)
    masks[0, 5:15, 5:25] = True
    out = render_detections(img, np.asarray([[5., 5., 25., 15.]]),
                            ["dog"], scores=np.asarray([0.9]),
                            masks=masks)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_box_voting_merges_cluster():
    boxes = np.asarray([[10, 10, 30, 30], [11, 11, 31, 31],
                        [60, 60, 80, 80]], np.float32)
    scores = np.asarray([0.9, 0.6, 0.8], np.float32)
    labels = np.asarray([1, 1, 1])
    b, s, l = box_voting(boxes, scores, labels, vote_thresh=0.6)
    assert len(b) == 2
    # merged box is the score-weighted average of the cluster
    np.testing.assert_allclose(
        b[0], (boxes[0] * 0.9 + boxes[1] * 0.6) / 1.5, atol=1e-5)
    # different classes never merge
    labels2 = np.asarray([1, 2, 1])
    b2, _, _ = box_voting(boxes, scores, labels2, vote_thresh=0.6)
    assert len(b2) == 3


def test_im_detect_bbox_aug_merges_scales():
    base = {"boxes": np.asarray([[10., 10., 30., 30.]]),
            "scores": np.asarray([0.8]), "labels": np.asarray([1])}
    calls = []

    def infer_fn(img, flipped):
        calls.append((img.shape, flipped))
        # detections in the *input* coordinate frame of this call
        s = img.shape[0] / 40.0
        b = base["boxes"] * s
        if flipped:
            w = img.shape[1]
            x1 = w - b[:, 2] - 1
            x2 = w - b[:, 0] - 1
            b = np.stack([x1, b[:, 1], x2, b[:, 3]], 1)
        return {"boxes": b, "scores": base["scores"],
                "labels": base["labels"]}

    image = np.zeros((40, 60, 3), np.uint8)
    out = im_detect_bbox_aug(infer_fn, image, scales=(0.5, 1.0),
                             hflip=True, vote_thresh=0.5)
    assert len(calls) == 4  # 2 scales x (plain, flip)
    # all four observations of the same object collapse to ~one box
    assert len(out["boxes"]) == 1
    np.testing.assert_allclose(out["boxes"][0],
                               [10., 10., 30., 30.], atol=1.5)


def test_host_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    labels = np.asarray([1, 1, 1])
    keep = _nms_host(boxes, scores, labels, 0.5)
    np.testing.assert_array_equal(keep, [0, 2])
