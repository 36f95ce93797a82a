"""Per-task dataset wrappers: shard-name layout, task-specific fields,
and corrupt-sample retry (ref base_dataset.py:151-169)."""

import io
import os

import numpy as np
import pyarrow as pa
import pytest

from fiber_tpu.data.task_datasets import (TASK_NAMES, arrow_paths,
                                          build_task_dataset)


def _png_bytes(color, size=(20, 16)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return buf.getvalue()


def _write(path, columns):
    table = pa.table(columns)
    with pa.OSFile(path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as w:
            w.write_table(table)


@pytest.fixture()
def root(tmp_path):
    root = str(tmp_path)
    good = _png_bytes((200, 10, 10))
    # f30k: second row has corrupt image bytes -> retry path
    for name in TASK_NAMES["f30k"]["train"]:
        _write(os.path.join(root, f"{name}.arrow"), {
            "image": [good, b"not-an-image", good],
            "caption": [["a red square", "crimson box"], ["bad"], ["ok"]],
            "image_id": [1, 2, 3],
            "split": ["train"] * 3,
        })
    _write(os.path.join(root, "vqav2_train.arrow"), {
        "image": [good],
        "questions": [["what color is it?"]],
        "question_id": [[7]],
        "answers": [[["red"]]],
        "answer_labels": [[[3]]],
        "answer_scores": [[[1.0]]],
        "image_id": [1], "split": ["train"],
    })
    _write(os.path.join(root, "vqav2_val.arrow"), {
        "image": [good],
        "questions": [["how many?"]],
        "question_id": [[9]],
        "answers": [[["two"]]],
        "answer_labels": [[[5]]],
        "answer_scores": [[[0.6]]],
        "image_id": [2], "split": ["val"],
    })
    _write(os.path.join(root, "nlvr2_train.arrow"), {
        "image_0": [good], "image_1": [good],
        "questions": [["left image has a dog"]],
        "answers": [["True"]],
        "image_id": [1], "split": ["train"],
    })
    return root


def test_arrow_paths_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        arrow_paths(str(tmp_path), "coco", "train")


def test_caption_task_suite_and_retry(root):
    ds = build_task_dataset("f30k", root, "train", image_size=32,
                            draw_false_image=1, draw_false_text=1, seed=0)
    # rows x captions across 2 shards: (2+1+1) x 2
    assert len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["text"] == "a red square"
    assert s["false_image_0"].shape == (32, 32, 3)
    assert isinstance(s["false_text_0"], str)
    # index 2 is the corrupt row of shard 0: retry must land on a
    # decodable sample instead of raising
    s2 = ds[2]
    assert s2["image"].shape == (32, 32, 3)
    assert s2["raw_index"] != 2


def test_vqa_fields(root):
    ds = build_task_dataset("vqav2", root, "val", image_size=32)
    s = ds[0]
    assert s["qid"] == 9
    assert s["vqa_labels"] == [5]
    assert s["vqa_scores"] == [0.6]
    assert s["text"] == "how many?"


def test_nlvr2_pairs(root):
    ds = build_task_dataset("nlvr2", root, "train", image_size=32)
    s = ds[0]
    assert s["image_0"].shape == (32, 32, 3)
    assert s["image_1"].shape == (32, 32, 3)
    assert s["answers"] is True
    assert s["text"] == "left image has a dog"


def test_unknown_task_raises(root):
    with pytest.raises(KeyError):
        build_task_dataset("nope", root, "train")
