"""Long-tail dataset readers: mixed/gqa/phrasecut/CaptionTSV/background/
imagenet/mixup + the catalog build_dataset resolver
(ref data/datasets/{mixed,gqa,phrasecut,caption,background,imagenet,
mixup}.py)."""

import base64
import io
import json

import numpy as np
import pytest

from fiber_tpu.data.catalog import DatasetCatalog, DatasetSpec, build_dataset
from fiber_tpu.data.long_tail import (BackgroundDataset,
                                      CaptionPseudoBoxDataset,
                                      GQAGroundingDataset,
                                      ImagenetClassificationDataset,
                                      MixedGroundingDataset,
                                      MixupDetectionDataset,
                                      PhrasecutDataset)
from fiber_tpu.data.tokenizer import WhitespaceTokenizer

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _img(path, w=48, h=32, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


def _modulated_json(tmp_path, extra_img_fields=None):
    images, annotations = [], []
    for i in range(3):
        rec = {"id": i + 1, "file_name": f"{i:04d}.jpg", "height": 32,
               "width": 48, "caption": "a red dog chasing a blue car"}
        rec.update(extra_img_fields(i) if extra_img_fields else {})
        images.append(rec)
        annotations.append({
            "id": i * 2 + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [2.0, 2.0, 20.0, 15.0], "area": 300.0, "iscrowd": 0,
            "tokens_positive": [[6, 9]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "dog"}]}))
    return str(ann)


def test_mixed_dataset_routes_roots(tmp_path):
    coco_root = tmp_path / "coco"
    vg_root = tmp_path / "vg"
    coco_root.mkdir()
    vg_root.mkdir()
    for i in range(3):
        _img(coco_root / f"{i:04d}.jpg", seed=i)
        _img(vg_root / f"{i:04d}.jpg", seed=10 + i)
    ann = _modulated_json(
        tmp_path, lambda i: {"data_source": "coco" if i % 2 == 0 else "vg"})
    ds = MixedGroundingDataset(str(coco_root), str(vg_root), ann,
                               WhitespaceTokenizer(), max_query_len=16)
    r0 = ds[0]   # coco source
    r1 = ds[1]   # vg source
    c0 = np.asarray(Image.open(coco_root / "0000.jpg"))
    v1 = np.asarray(Image.open(vg_root / "0001.jpg"))
    np.testing.assert_array_equal(r0["image"], c0)
    np.testing.assert_array_equal(r1["image"], v1)
    assert r0["positive_map"].shape == (1, 16)
    assert r0["positive_map"].sum() > 0


def test_gqa_dataset_answer_fields(tmp_path):
    root = tmp_path / "img"
    root.mkdir()
    for i in range(3):
        _img(root / f"{i:04d}.jpg", seed=i)
    ann = _modulated_json(
        tmp_path, lambda i: {"answer": ["yes", "dog", "weird"][i],
                             "question_type": ["obj", "attr", "rel"][i],
                             "dataset_name": "gqa", "questionId": str(i)})
    a2id = tmp_path / "answer2id.json"
    a2id.write_text(json.dumps({"yes": 0, "dog": 1, "unknown": 2}))
    by_type = tmp_path / "answer2id_by_type.json"
    by_type.write_text(json.dumps({
        "answer_attr": {"dog": 5, "unknown": 0},
        "answer_rel": {"unknown": 0}, "answer_global": {"unknown": 0},
        "answer_cat": {"unknown": 0}}))
    ds = GQAGroundingDataset(str(root), ann, WhitespaceTokenizer(),
                             max_query_len=16, answer2id_file=str(a2id),
                             answer2id_by_type_file=str(by_type))
    assert int(ds[0]["answer"]) == 0
    assert int(ds[1]["answer"]) == 1
    assert int(ds[2]["answer"]) == 2          # unmapped -> unknown
    assert int(ds[1]["answer_attr"]) == 5     # attr question, mapped
    assert int(ds[0]["answer_attr"]) == -100  # non-attr -> ignored
    # phrasecut flavor shares the modulated reader
    ds2 = PhrasecutDataset(str(root), ann, WhitespaceTokenizer(),
                           max_query_len=16)
    assert ds2[0]["positive_map"].shape == (1, 16)


def _caption_tsv(tmp_path, rows):
    lines = []
    for key, anno in rows:
        buf = io.BytesIO()
        Image.fromarray(np.full((8, 8, 3), 128, np.uint8)).save(
            buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        lines.append(f"{key}\t{json.dumps(anno)}\t{b64}")
    p = tmp_path / "cap.tsv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_caption_pseudo_box_dataset(tmp_path):
    anno = {
        "caption": "a dog and a car",
        "img_h": 8, "img_w": 8,
        "tokens_positive": [[[2, 5]], [[12, 15]], [[2, 5]]],
        "bboxes": [[0, 0, 6, 6], [0.2, 0.1, 6.1, 6.2], [1, 1, 7, 7]],
        "scores": [0.9, 0.8, 0.3],
    }
    path = _caption_tsv(tmp_path, [("img0", anno),
                                   ("img1", {"caption": "x", "img_h": 8,
                                             "img_w": 8, "bboxes": [],
                                             "tokens_positive": [],
                                             "scores": []})])
    ds = CaptionPseudoBoxDataset(path, WhitespaceTokenizer(),
                                 max_query_len=16, score_thresh=0.5,
                                 nms_thresh=0.7)
    rec = ds[0]
    # score 0.3 dropped, then NMS removes the near-duplicate of box 0
    assert len(rec["boxes"]) == 1
    assert rec["positive_map"].shape == (1, 16)
    assert rec["greenlight_span_for_masked_lm_objective"] == [(0, 15)]
    # below caption_min_box -> IndexError for the corrupt-retry path
    with pytest.raises(IndexError):
        ds[1]


def test_background_and_imagenet(tmp_path):
    root = tmp_path / "img"
    root.mkdir()
    for i in range(2):
        _img(root / f"{i}.jpg", seed=i)
    bg_ann = tmp_path / "bg.json"
    bg_ann.write_text(json.dumps(
        {"images": [{"id": 5, "file_name": "0.jpg"}]}))
    bg = BackgroundDataset(str(bg_ann), str(root))
    rec = bg[0]
    assert rec["boxes"].shape == (0, 4) and rec["labels"].shape == (0,)

    in_ann = tmp_path / "in.json"
    in_ann.write_text(json.dumps(
        [{"file_name": "0.jpg", "label": 3},
         {"file_name": "1.jpg", "label": 7}]))
    ds = ImagenetClassificationDataset(str(in_ann), str(root))
    assert int(ds[1]["label"]) == 7
    sel = ds.select_class([7])
    assert len(sel) == 1 and int(sel[0]["label"]) == 7


def test_mixup_wrapper(tmp_path):
    class Tiny:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"image": np.full((10, 12, 3), 50.0 * (i + 1),
                                     np.float32),
                    "height": 10, "width": 12,
                    "boxes": np.array([[1.0, 1.0, 5.0, 5.0]]),
                    "labels": np.array([i + 1], np.int32)}

    ds = MixupDetectionDataset(Tiny(), seed=0)
    rec = ds[0]
    assert rec["boxes"].shape[0] in (1, 2)
    assert "box_weights" in rec
    assert np.isclose(rec["box_weights"].max(), 1.0) or \
        rec["box_weights"].sum() == pytest.approx(
            len(rec["box_weights"]) / 2, abs=1.0)


def test_build_dataset_resolver(tmp_path):
    root = tmp_path / "img"
    root.mkdir()
    for i in range(3):
        _img(root / f"{i:04d}.jpg", seed=i)
    ann = _modulated_json(tmp_path, lambda i: {"data_source": "vg"})

    DatasetCatalog.set("unit_mixed_train", DatasetSpec(
        factory="jsonl", task="grounding",
        args={"img_root": str(root), "ann_file": ann}))
    # name routing: "mixed*" -> MixedGroundingDataset
    DatasetCatalog.set("mixed_unit", DatasetSpec(
        factory="jsonl", task="grounding",
        args={"img_root": str(root), "ann_file": ann}))
    tok = WhitespaceTokenizer()
    ds = build_dataset("unit_mixed_train", tok, max_query_len=16)
    assert ds[0]["positive_map"].shape == (1, 16)
    ds2 = build_dataset("mixed_unit", tok, max_query_len=16)
    assert isinstance(ds2, MixedGroundingDataset)

    bg_ann = tmp_path / "bg.json"
    bg_ann.write_text(json.dumps({"images": []}))
    DatasetCatalog.set("unit_bg", DatasetSpec(
        factory="background", task="detection",
        args={"img_root": str(root), "ann_file": str(bg_ann)}))
    assert len(build_dataset("unit_bg")) == 0
