"""Tests: answer normalization, targets, submissions, randaug, arrow prep."""

import json
import os

import numpy as np
import pytest

from fiber_tpu.data import vqa
from fiber_tpu.data.randaug import rand_augment


def test_normalize_answer():
    assert vqa.normalize_answer("The Dog.") == "dog"
    assert vqa.normalize_answer("dont") == "don't"
    assert vqa.normalize_answer("TWO") == "2"
    assert vqa.normalize_answer("1,000") == "1000"
    assert vqa.normalize_answer("yes!") == "yes"
    assert vqa.normalize_answer("a red   apple") == "red apple"


def test_vqa_soft_score():
    assert vqa.vqa_soft_score(0) == 0.0
    assert vqa.vqa_soft_score(1) == pytest.approx(1 / 3)
    assert vqa.vqa_soft_score(3) == 1.0
    assert vqa.vqa_soft_score(10) == 1.0


def test_answer_vocab_and_dense_targets():
    vocab = vqa.build_answer_vocab([["yes", "yes", "no"], ["yes"]], size=2)
    assert vocab == {"yes": 0, "no": 1}
    t = vqa.dense_vqa_targets([[0], [0, 1]], [[1.0], [0.3, 0.6]], 3)
    np.testing.assert_allclose(t, [[1, 0, 0], [0.3, 0.6, 0]])


def test_submission_writers(tmp_path):
    p = str(tmp_path / "vqa.json")
    vqa.write_vqa_submission([1, 2], ["yes", "no"], p)
    data = json.load(open(p))
    assert data == [{"question_id": 1, "answer": "yes"},
                    {"question_id": 2, "answer": "no"}]
    p = str(tmp_path / "cap.json")
    vqa.write_caption_submission([5, 5, 6], ["a", "b", "c"], p)
    data = json.load(open(p))
    assert data == [{"image_id": 5, "caption": "b"},
                    {"image_id": 6, "caption": "c"}]


def test_rand_augment_shapes():
    from PIL import Image
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    out = rand_augment(img, n=2, m=7, rng=rng)
    assert out.size == img.size


def test_make_arrow_roundtrip(tmp_path):
    from PIL import Image
    from fiber_tpu.data.prepare import make_arrow
    from fiber_tpu.data.arrow_dataset import ArrowCaptionDataset
    # write two tiny images
    paths = []
    for i in range(2):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(np.full((8, 8, 3), i * 100, np.uint8)).save(p)
        paths.append(p)
    out = str(tmp_path / "data.arrow")
    n = make_arrow([
        {"image_path": paths[0], "caption": ["a cat", "the cat"],
         "image_id": 0, "split": "train"},
        {"image_path": paths[1], "caption": "a dog", "image_id": 1,
         "split": "train"},
    ], out)
    assert n == 2
    ds = ArrowCaptionDataset([out])
    assert len(ds) == 3  # 2 + 1 flattened captions
    assert ds.get_caption(0) == "a cat"
    assert ds.get_caption(2) == "a dog"
    img = ds.get_image(0, size=16)
    assert img.shape == (16, 16, 3)
