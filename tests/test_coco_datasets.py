"""Real-format dataset classes + multi-scale loader, end to end:
synthetic COCO annotation JSONs on disk -> dataset -> prompt ->
positive map -> bucketed batch -> one detection train step
(ref modulated_coco.py, data/build.py, transforms.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.data.coco_datasets import (CocoDetectionDataset,
                                          CocoGroundingDataset,
                                          ModulatedCocoDataset,
                                          create_positive_map_from_spans,
                                          lvis_frequency_groups)
from fiber_tpu.data.loader import DetectionBatcher, resize_min_size
from fiber_tpu.data.tokenizer import WhitespaceTokenizer

W0, H0 = 96, 64


def _write_coco(tmp_path, n_images=4, captions=False):
    from PIL import Image
    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        w, h = (W0, H0) if i % 2 == 0 else (H0, W0)
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:04d}.jpg")
        rec = {"id": i + 1, "file_name": f"{i:04d}.jpg",
               "height": h, "width": w}
        if captions:
            rec["caption"] = "a red dog chasing a blue car"
        images.append(rec)
        for b in range(2):
            x, y = rng.uniform(0, w / 2), rng.uniform(0, h / 2)
            ann = {"id": aid, "image_id": i + 1,
                   "category_id": [1, 3][b],
                   "bbox": [float(x), float(y), 20.0, 15.0],
                   "area": 300.0, "iscrowd": 0,
                   "segmentation": [[x, y, x + 20, y, x + 20, y + 15,
                                     x, y + 15]]}
            if captions:
                # spans of "dog" (6..9) and "car" (25..28)
                ann["tokens_positive"] = [[6, 9]] if b == 0 else [[25, 28]]
            annotations.append(ann)
            aid += 1
    cats = [{"id": 1, "name": "dog"}, {"id": 3, "name": "car"},
            {"id": 7, "name": "person"}]
    ann_file = tmp_path / ("modulated.json" if captions else "coco.json")
    ann_file.write_text(json.dumps({"images": images,
                                    "annotations": annotations,
                                    "categories": cats}))
    return str(img_dir), str(ann_file)


def test_coco_detection_dataset(tmp_path):
    img_dir, ann_file = _write_coco(tmp_path)
    ds = CocoDetectionDataset(img_dir, ann_file, return_masks=True)
    assert len(ds) == 4
    rec = ds[0]
    assert rec["image"].shape == (H0, W0, 3)
    assert rec["boxes"].shape == (2, 4)
    assert (rec["boxes"][:, 2] > rec["boxes"][:, 0]).all()  # xyxy
    np.testing.assert_array_equal(rec["labels"], [1, 2])  # contiguous
    assert rec["masks"].shape == (2, H0, W0)
    assert rec["masks"][0].sum() > 0
    assert ds.label_names == {1: "dog", 2: "car", 3: "person"}


def test_coco_grounding_dataset_positive_map(tmp_path):
    img_dir, ann_file = _write_coco(tmp_path)
    tok = WhitespaceTokenizer()
    ds = CocoGroundingDataset(img_dir, ann_file, tok, max_query_len=16,
                              num_negatives=1, shuffle_prompt=False)
    rec = ds[0]
    assert "dog" in rec["caption"] and "car" in rec["caption"]
    pm = rec["positive_map"]
    assert pm.shape == (2, 16)
    # each box's map marks exactly its class name token(s)
    assert pm[0].sum() >= 1 and pm[1].sum() >= 1
    assert not np.allclose(pm[0], pm[1])
    # eval-time label->token map covers every present class
    assert set(rec["label_to_token"]) >= {1, 2}


def test_modulated_dataset_char_to_token_fallbacks(tmp_path):
    img_dir, ann_file = _write_coco(tmp_path, captions=True)
    tok = WhitespaceTokenizer()
    ds = ModulatedCocoDataset(img_dir, ann_file, tok, max_query_len=16)
    rec = ds[0]
    pm = rec["positive_map"]
    assert pm.shape == (2, 16)
    # normalized rows (ref create_positive_map divides by row sums)
    assert np.allclose(pm.sum(-1), 1.0, atol=1e-3)
    # span starting mid-whitespace resolves via the beg+1 fallback
    enc = tok("a red dog", return_offsets_mapping=True, max_length=16,
              truncation=True)
    m = create_positive_map_from_spans(enc["offset_mapping"],
                                       [[(5, 9)]], 16, normalize=False)
    assert m.sum() >= 1


def test_resize_rule_and_batcher(tmp_path):
    assert resize_min_size(480, 640, 800, 1333) == (800, 1066)
    # ref get_size rounding: size=round(1333*200/1000)=267 -> (267, 1335)
    assert resize_min_size(200, 1000, 800, 1333) == (267, 1335)

    img_dir, ann_file = _write_coco(tmp_path)
    tok = WhitespaceTokenizer()
    ds = CocoGroundingDataset(img_dir, ann_file, tok, max_query_len=16,
                              num_negatives=0, shuffle_prompt=False)
    batcher = DetectionBatcher(ds, batch_size=2, min_sizes=(32, 64),
                               max_size=96, pad_multiple=32, max_boxes=5,
                               min_items=8, seed=0)
    batches = list(batcher)
    assert batches, "no batches produced"
    shapes = {b["images"].shape[1:3] for b in batches}
    # every shape is one of the static buckets
    allowed = {batcher.bucket_shape(m, l) for m in (32, 64)
               for l in (True, False)}
    assert shapes <= allowed
    b = batches[0]
    assert b["gt_boxes"].shape == (2, 5, 4)
    assert b["gt_valid"][:, :2].all()
    assert b["positive_map"].shape[0] == 2
    # boxes stay inside the padded canvas
    assert float(b["gt_boxes"].max()) <= max(b["images"].shape[1:3])


@pytest.mark.slow
def test_dataset_to_train_step(tmp_path):
    """The verdict's integration criterion: annotation file -> dataset ->
    prompt -> positive map -> bucketed batch -> detection train step."""
    from fiber_tpu.detection.detector import DetectorConfig
    from fiber_tpu.train.detection_trainer import MultiScaleDetectionTrainer

    img_dir, ann_file = _write_coco(tmp_path)
    cfg = DetectorConfig.tiny_test()
    tok = WhitespaceTokenizer()
    ds = CocoGroundingDataset(img_dir, ann_file, tok,
                              max_query_len=cfg.max_query_len,
                              num_negatives=0, shuffle_prompt=False)
    batcher = DetectionBatcher(ds, batch_size=2, min_sizes=(32, 64),
                               max_size=64, pad_multiple=32,
                               max_boxes=4, min_items=8, seed=1)
    trainer = MultiScaleDetectionTrainer(cfg, max_iter=10,
                                         warmup_iters=1, ema_decay=None)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    seen_shapes = set()
    for i, batch in enumerate(batcher):
        if i >= 2:
            break
        rng, sub = jax.random.split(rng)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ("images", "input_ids", "attention_mask",
                       "gt_boxes", "gt_valid", "positive_map")}
        state, metrics = trainer.train_step(state, jb, sub)
        assert np.isfinite(float(metrics["total_loss"])), metrics
        seen_shapes.add(batch["images"].shape[1:3])
    assert int(state.step) >= 1


def test_lvis_frequency_groups(tmp_path):
    ann = {"images": [], "annotations": [],
           "categories": [
               {"id": 1, "name": "a", "image_count": 3},
               {"id": 2, "name": "b", "image_count": 50},
               {"id": 3, "name": "c", "image_count": 900},
               {"id": 4, "name": "d", "frequency": "rare"}]}
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(ann))
    groups = lvis_frequency_groups(str(p))
    assert groups == {1: "r", 2: "c", 3: "f", 4: "r"}
