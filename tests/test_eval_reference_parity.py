"""Parity pins of our evaluators against the reference's self-contained
evaluators executed in-process (the reference_loader_det pattern):

* RefExpEvaluator (refexp.py:18-88) — GIoU-based P@{1,5,10} per dataset
* Flickr30kEntitiesRecallEvaluator (flickr/flickr_eval.py:261-393) — R@k
  over synthetic Sentences/Annotations fixture files
* evaluate_box_proposals (od_to_grounding/od_eval.py:241-363) — AR with
  area ranges and proposal limits

The COCO mAP path cannot execute in-process (pycocotools is absent from
the image and the reference delegates to COCOeval), so coco_map carries
its own fixture tests in test_evaluation.py instead.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from fiber_tpu.detection import evaluation as ev  # noqa: E402

from reference_loader_det import setup_fine_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    setup_fine_reference()
    return True


def _rand_boxes(rng, n, size=300.0):
    xy = rng.uniform(0, size * 0.7, (n, 2))
    wh = rng.uniform(5, size * 0.4, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


# ---------------------------------------------------------------------------
# RefExpEvaluator
# ---------------------------------------------------------------------------
class _FakeRefexpGt:
    """Duck-typed stand-in for the pycocotools COCO object the reference
    evaluator reads (imgs/getAnnIds/loadImgs/loadAnns only)."""

    def __init__(self, imgs, anns):
        self.imgs = imgs          # id -> {"dataset_name": ...}
        self.anns = anns          # id -> {"bbox": xywh}

    def getAnnIds(self, imgIds):
        return [imgIds]           # one annotation per image, same id

    def loadImgs(self, img_id):
        return [self.imgs[img_id]]

    def loadAnns(self, ann_id):
        return [self.anns[ann_id]]


def test_refexp_parity(ref):
    from maskrcnn_benchmark.data.datasets.refexp import RefExpEvaluator

    rng = np.random.default_rng(0)
    n_img = 40
    names = ["refcoco", "refcoco+", "refcocog"]
    imgs, anns, predictions = {}, {}, {}
    ours_preds, ours_gts = [], []
    for i in range(n_img):
        name = names[i % 3]
        gt_xyxy = _rand_boxes(rng, 1)[0]
        xywh = [gt_xyxy[0], gt_xyxy[1], gt_xyxy[2] - gt_xyxy[0],
                gt_xyxy[3] - gt_xyxy[1]]
        imgs[i] = {"dataset_name": name}
        anns[i] = {"bbox": xywh}
        n_det = int(rng.integers(1, 12))
        boxes = _rand_boxes(rng, n_det)
        if i % 4 == 0:  # plant some near-hits
            boxes[int(rng.integers(0, n_det))] = gt_xyxy + rng.normal(
                0, 3, 4)
        scores = rng.uniform(0, 1, n_det)
        predictions[i] = {"scores": torch.as_tensor(scores),
                          "boxes": torch.as_tensor(boxes)}
        ours_preds.append({"boxes": boxes, "scores": scores})
        ours_gts.append({"boxes": gt_xyxy[None], "dataset_name": name})

    evaluator = RefExpEvaluator(_FakeRefexpGt(imgs, anns), ("bbox",))
    evaluator.update(predictions)
    ref_results = evaluator.summarize()

    mine = ev.refexp_precision(ours_preds, ours_gts, ks=(1, 5, 10))
    for name in names:
        # reference returns sorted([P@1, P@5, P@10]) per dataset — P@k is
        # monotone in k so the sort is the k order
        ref_vals = ref_results[name]
        my_vals = [mine[f"P@{k}_{name}"] for k in (1, 5, 10)]
        np.testing.assert_allclose(my_vals, ref_vals, atol=1e-9,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# Flickr30kEntitiesRecallEvaluator
# ---------------------------------------------------------------------------
def _write_flickr_fixture(root, rng, n_img=6, n_sent=2):
    """Synthetic Flickr30k Entities tree: {subset}.txt + Sentences/*.txt
    + Annotations/*.xml in the reference's exact formats
    (flickr_eval.py:23-149)."""
    (root / "Sentences").mkdir(parents=True)
    (root / "Annotations").mkdir(parents=True)
    img_ids = [f"10{i:04d}" for i in range(n_img)]
    (root / "test.txt").write_text("".join(f"{i}\n" for i in img_ids))
    types = ["people", "animals", "vehicles", "other"]
    gt = {}   # img_id -> list per sentence of list per phrase of boxes
    for img_id in img_ids:
        n_ph = int(rng.integers(1, 4))
        phrase_ids = [f"{img_id}{p}" for p in range(n_ph)]
        boxes = {pid: _rand_boxes(rng, int(rng.integers(1, 3))).astype(int)
                 for pid in phrase_ids}
        # sentence files: phrases chunked in brackets
        lines = []
        sent_phrases = []
        for s in range(n_sent):
            toks = ["A", "scene", "with"]
            phrases = []
            for j, pid in enumerate(phrase_ids):
                t = types[int(rng.integers(0, len(types)))]
                toks.append(f"[/EN#{pid}/{t} thing{j} here]")
                phrases.append(pid)
            lines.append(" ".join(toks))
            sent_phrases.append(phrases)
        (root / "Sentences" / f"{img_id}.txt").write_text(
            "\n".join(lines) + "\n")
        # annotation xml
        objs = []
        for pid, bs in boxes.items():
            for b in bs:
                objs.append(
                    f"<object><name>{pid}</name><bndbox>"
                    f"<xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
                    f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax>"
                    f"</bndbox></object>")
        xml = ("<annotation><size><width>500</width>"
               "<height>400</height><depth>3</depth></size>"
               + "".join(objs) + "</annotation>")
        (root / "Annotations" / f"{img_id}.xml").write_text(xml)
        gt[img_id] = (sent_phrases, boxes)
    return img_ids, gt


@pytest.mark.parametrize("merge_boxes", [False, True])
def test_flickr_recall_parity(ref, tmp_path, merge_boxes):
    from maskrcnn_benchmark.data.datasets.evaluation.flickr.flickr_eval \
        import Flickr30kEntitiesRecallEvaluator

    rng = np.random.default_rng(1)
    img_ids, gt = _write_flickr_fixture(tmp_path, rng)

    evaluator = Flickr30kEntitiesRecallEvaluator(
        str(tmp_path), subset="test", topk=(1, 5, -1), iou_thresh=0.5,
        merge_boxes=merge_boxes, verbose=False)

    predictions = []
    ours_preds, ours_gts = [], []
    for img_id in img_ids:
        sent_phrases, boxes = gt[img_id]
        for sent_id, phrases in enumerate(sent_phrases):
            pred_boxes = []
            for pid in phrases:
                n = int(rng.integers(1, 8))
                cand = _rand_boxes(rng, n, 500.0)
                if rng.uniform() < 0.5:   # plant a hit at a random rank
                    tgt = boxes[pid][0].astype(float)
                    cand[int(rng.integers(0, n))] = tgt + rng.normal(
                        0, 2, 4)
                pred_boxes.append(cand.tolist())
                merged = boxes[pid].astype(np.float64)
                if merge_boxes and len(merged) > 1:
                    merged = np.array([[merged[:, 0].min(),
                                        merged[:, 1].min(),
                                        merged[:, 2].max(),
                                        merged[:, 3].max()]])
                ours_preds.append({"boxes": cand})
                ours_gts.append({"boxes": merged})
            predictions.append({"image_id": img_id,
                                "sentence_id": sent_id,
                                "boxes": pred_boxes})

    ref_report = evaluator.evaluate(predictions)
    mine = ev.flickr_grounding_recall(ours_preds, ours_gts, ks=(1, 5, -1),
                                      merge_boxes=False)
    for k in (1, 5, -1):
        np.testing.assert_allclose(mine[f"r@{k}"], ref_report[k]["all"],
                                   atol=1e-9, err_msg=f"k={k}")


# ---------------------------------------------------------------------------
# evaluate_box_proposals (proposal AR)
# ---------------------------------------------------------------------------
class _FakeCoco:
    def __init__(self, anns_per_img, sizes):
        self.imgs = {i: {"width": w, "height": h}
                     for i, (w, h) in sizes.items()}
        self._anns = anns_per_img

    def getAnnIds(self, imgIds):
        return imgIds

    def loadAnns(self, img_id):
        return self._anns[img_id]


class _FakeDataset:
    def __init__(self, coco, n):
        self.coco = coco
        self.id_to_img_map = {i: i for i in range(n)}


@pytest.mark.parametrize("area,limit", [("all", None), ("all", 5),
                                        ("small", None), ("medium", None),
                                        ("large", 10)])
def test_box_proposal_ar_parity(ref, area, limit):
    from maskrcnn_benchmark.data.datasets.evaluation.od_to_grounding \
        .od_eval import evaluate_box_proposals
    from maskrcnn_benchmark.structures.bounding_box import BoxList

    rng = np.random.default_rng(2)
    n_img = 12
    W, H = 640, 480
    anns, sizes, ref_preds = {}, {}, []
    ours_preds, ours_gts = [], []
    for i in range(n_img):
        n_gt = int(rng.integers(0, 8))
        g = _rand_boxes(rng, n_gt, 300.0)
        # mix of areas: scale a few down/up
        scale = rng.choice([0.05, 0.3, 1.0], n_gt)
        ctr = (g[:, :2] + g[:, 2:]) / 2
        half = (g[:, 2:] - g[:, :2]) / 2 * scale[:, None]
        g = np.concatenate([ctr - half, ctr + half], 1)
        areas_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
        anns[i] = [{"bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                    "area": float(a), "iscrowd": 0}
                   for b, a in zip(g, areas_g)]
        sizes[i] = (W, H)
        n_det = int(rng.integers(1, 30))
        p = _rand_boxes(rng, n_det, 300.0)
        if n_gt and rng.uniform() < 0.8:
            for _ in range(min(3, n_gt)):
                p[int(rng.integers(0, n_det))] = \
                    g[int(rng.integers(0, n_gt))] + rng.normal(0, 2, 4)
        scores = rng.uniform(0, 1, n_det)
        bl = BoxList(torch.as_tensor(p, dtype=torch.float32), (W, H),
                     mode="xyxy")
        bl.add_field("scores", torch.as_tensor(scores,
                                               dtype=torch.float32))
        ref_preds.append(bl)
        ours_preds.append({"boxes": p, "scores": scores})
        # the reference converts ann xywh -> xyxy with xmax = xmin + w - 1
        # (bounding_box.py:91-98); feed ours the same effective corners
        g_ref = np.concatenate([g[:, :2], g[:, 2:] - 1.0], axis=1)
        ours_gts.append({"boxes": g_ref, "areas": areas_g})

    dataset = _FakeDataset(_FakeCoco(anns, sizes), n_img)
    ref_out = evaluate_box_proposals(ref_preds, dataset, area=area,
                                     limit=limit)
    mine = ev.box_proposal_ar(ours_preds, ours_gts, area=area, limit=limit)
    np.testing.assert_allclose(mine["ar"], float(ref_out["ar"]),
                               atol=1e-7)
    assert mine["num_pos"] == int(ref_out["num_pos"])


# ---------------------------------------------------------------------------
# Masker (mask pasting for segm eval)
# ---------------------------------------------------------------------------
def test_paste_mask_parity(ref):
    from maskrcnn_benchmark.modeling.roi_heads.mask_head.inference import \
        paste_mask_in_image

    from fiber_tpu.detection.structures import paste_masks_in_image

    rng = np.random.default_rng(3)
    im_h, im_w = 120, 160
    N, M = 8, 28
    probs = rng.uniform(0, 1, (N, M, M))
    boxes = np.concatenate([
        rng.uniform(-10, 100, (N, 2)),
        rng.uniform(20, 70, (N, 2))], axis=1)
    boxes[:, 2:] += boxes[:, :2]

    mine = paste_masks_in_image(probs, boxes, im_h, im_w)
    for i in range(N):
        ref_mask = paste_mask_in_image(
            torch.as_tensor(probs[i], dtype=torch.float32),
            torch.as_tensor(boxes[i], dtype=torch.float32), im_h, im_w)
        agree = (mine[i] == ref_mask.numpy()).mean()
        # fp32 torch vs fp64 numpy bilinear: pixels at the 0.5 threshold
        # can flip; demand near-exact agreement
        assert agree > 0.999, (i, agree)


def test_segm_map_from_pasted_masks(ref):
    """End-to-end: pasted predicted masks scored with segm AP; perfect
    masks give AP 1.0, shifted masks score lower."""
    from fiber_tpu.detection.structures import paste_masks_in_image

    rng = np.random.default_rng(4)
    im_h, im_w = 96, 96
    preds, gts = [], []
    for _ in range(4):
        n = 3
        boxes = np.stack([
            [8, 8, 40, 40], [50, 20, 80, 60], [20, 60, 60, 90]
        ]).astype(np.float64)
        probs = np.ones((n, 28, 28)) * 0.99
        masks = paste_masks_in_image(probs, boxes, im_h, im_w)
        gts.append({"boxes": boxes, "labels": np.ones(n), "masks": masks})
        preds.append({"boxes": boxes, "labels": np.ones(n),
                      "scores": rng.uniform(0.5, 1, n), "masks": masks})
    out = ev.coco_map(preds, gts, iou_type="segm")
    assert out["mAP"] == pytest.approx(1.0)

    shifted = [{"boxes": p["boxes"] + 6.0, "labels": p["labels"],
                "scores": p["scores"],
                "masks": np.roll(p["masks"], 6, axis=2)}
               for p in preds]
    out2 = ev.coco_map(shifted, gts, iou_type="segm")
    assert out2["mAP"] < out["mAP"]
