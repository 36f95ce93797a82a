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


def test_prepare_roundtrip_vqa_nlvr2(tmp_path):
    """write_vqa_arrow / write_nlvr2_arrow produce exactly the layout the
    task dataset classes read (ref write_vqa.py / write_nlvr2.py)."""
    import json
    from fiber_tpu.data.prepare import write_nlvr2_arrow, write_vqa_arrow

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "img_1.jpg").write_bytes(_png_bytes((10, 200, 10)))
    questions = {"questions": [
        {"question_id": 11, "image_id": 1, "question": "what color?"},
        {"question_id": 12, "image_id": 1, "question": "how many?"},
    ]}
    annotations = {"annotations": [
        {"question_id": 11,
         "answers": [{"answer": "green"}] * 7 + [{"answer": "red"}] * 3},
        {"question_id": 12, "answers": [{"answer": "two"}] * 10},
    ]}
    (tmp_path / "q.json").write_text(json.dumps(questions))
    (tmp_path / "a.json").write_text(json.dumps(annotations))
    n = write_vqa_arrow(str(tmp_path / "q.json"), str(tmp_path / "a.json"),
                        str(img_dir), "img_{}.jpg",
                        {"green": 0, "red": 1, "two": 2}, "train",
                        str(tmp_path / "vqav2_train.arrow"))
    assert n == 1
    # the val shard is required by the dataset's name list
    write_vqa_arrow(str(tmp_path / "q.json"), str(tmp_path / "a.json"),
                    str(img_dir), "img_{}.jpg",
                    {"green": 0, "red": 1, "two": 2}, "val",
                    str(tmp_path / "vqav2_val.arrow"))
    ds = build_task_dataset("vqav2", str(tmp_path), "val", image_size=24)
    assert len(ds) == 2
    s = ds[0]
    assert s["qid"] == 11
    assert s["vqa_labels"] == [0, 1]
    assert s["vqa_scores"][0] == 1.0  # 7 votes saturates the soft score

    # nlvr2: two sentences over one pair
    for suffix in ("img0", "img1"):
        (img_dir / f"dev-5-0-{suffix}.png").write_bytes(
            _png_bytes((5, 5, 250)))
    jsonl = tmp_path / "dev.jsonl"
    jsonl.write_text("\n".join(json.dumps({
        "identifier": f"dev-5-0-{i}", "sentence": f"sentence {i}",
        "label": "True" if i == 0 else "False"}) for i in range(2)))
    write_nlvr2_arrow(str(jsonl), str(img_dir), "val",
                      str(tmp_path / "nlvr2_dev.arrow"))
    write_nlvr2_arrow(str(jsonl), str(img_dir), "val",
                      str(tmp_path / "nlvr2_test1.arrow"))
    ds = build_task_dataset("nlvr2", str(tmp_path), "val", image_size=24)
    assert len(ds) == 4  # 2 sentences x 2 shards
    s = ds[0]
    assert s["answers"] is True and s["text"] == "sentence 0"
    assert ds[1]["answers"] is False


def test_caption_family_records(tmp_path):
    """f30k / conceptual-caption / vg record builders -> arrow -> dataset."""
    import json
    from fiber_tpu.data.prepare import (conceptual_caption_records,
                                        f30k_karpathy_records, make_arrow,
                                        vg_records)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "1001.jpg").write_bytes(_png_bytes((9, 9, 9)))

    karpathy = {"images": [{
        "filename": "1001.jpg", "split": "test",
        "sentences": [{"raw": "a thing"}, {"raw": "another thing"}]}]}
    (tmp_path / "k.json").write_text(json.dumps(karpathy))
    recs = list(f30k_karpathy_records(str(tmp_path / "k.json"),
                                      str(img_dir), "test"))
    assert recs[0]["caption"] == ["a thing", "another thing"]
    make_arrow(recs, str(tmp_path / "f30k_caption_karpathy_test.arrow"))
    ds = build_task_dataset("f30k", str(tmp_path), "test", image_size=16)
    assert len(ds) == 2 and ds[1]["text"] == "another thing"

    (tmp_path / "annot.json").write_text(json.dumps(
        [["sub/1001.jpg", "a web caption"]]))
    recs = list(conceptual_caption_records(str(tmp_path / "annot.json"),
                                           str(img_dir), "train"))
    assert recs[0]["caption"] == ["a web caption"]

    regions = [{"regions": [
        {"image_id": 1001, "phrase": "red box", "width": 5, "height": 4,
         "x": 1, "y": 2}]}]
    (tmp_path / "r.json").write_text(json.dumps(regions))
    recs = list(vg_records(str(tmp_path / "r.json"), str(img_dir)))
    assert recs[0]["caption"] == ["red box"] and recs[0]["x"] == [1]


def test_empty_split_is_empty_dataset(tmp_path):
    """gcc/sbu/vg have no val shards: the dataset is empty, not a crash
    (ref base_dataset.py len(names)==0 handling)."""
    ds = build_task_dataset("gcc", str(tmp_path), "val")
    assert len(ds) == 0
    with pytest.raises(IndexError):
        ds[0]
