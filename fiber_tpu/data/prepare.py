"""Offline data prep: JSON annotations + image files -> .arrow tables.

TPU-native equivalent of the reference's write_* scripts
(fiber/utils/write_{coco_karpathy,vqa,nlvr2,f30k,...}.py): one generic
converter producing the same on-disk pyarrow layout the reference
datasets read (columns: image bytes, caption list<str>, image_id, split,
plus task extras), so data prepared for either framework is
interchangeable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence


def make_arrow(records: Iterable[Dict], out_path: str,
               extra_columns: Sequence[str] = ()) -> int:
    """records: dicts with keys `image_path`, `caption` (str or list),
    `image_id`, `split`, plus any `extra_columns` (e.g. vqa labels).
    Returns the number of rows written."""
    import pyarrow as pa

    rows = {k: [] for k in
            ("image", "caption", "image_id", "split", *extra_columns)}
    n = 0
    for rec in records:
        with open(rec["image_path"], "rb") as f:
            rows["image"].append(f.read())
        cap = rec.get("caption", "")
        rows["caption"].append(cap if isinstance(cap, list) else [cap])
        rows["image_id"].append(rec.get("image_id", n))
        rows["split"].append(rec.get("split", "train"))
        for k in extra_columns:
            rows[k].append(rec.get(k))
        n += 1
    table = pa.table(rows)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with pa.OSFile(out_path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as writer:
            writer.write_table(table)
    return n


def coco_karpathy_records(karpathy_json: str, image_root: str,
                          split: str) -> Iterable[Dict]:
    """Karpathy-split COCO captions (ref write_coco_karpathy.py)."""
    with open(karpathy_json) as f:
        data = json.load(f)
    for img in data["images"]:
        if img["split"] != split and not (
                split == "train" and img["split"] == "restval"):
            continue
        yield {
            "image_path": os.path.join(image_root, img.get("filepath", ""),
                                       img["filename"]),
            "caption": [s["raw"] for s in img["sentences"]],
            "image_id": img.get("cocoid", img.get("imgid")),
            "split": split,
        }


def vqa_records(questions_json: str, annotations_json: Optional[str],
                image_root: str, image_template: str,
                answer_vocab: Dict[str, int], split: str
                ) -> Iterable[Dict]:
    """VQAv2 -> records with question/labels/scores extras
    (ref write_vqa.py)."""
    from fiber_tpu.data.vqa import normalize_answer, vqa_soft_score
    from collections import Counter
    with open(questions_json) as f:
        questions = {q["question_id"]: q
                     for q in json.load(f)["questions"]}
    annos = {}
    if annotations_json:
        with open(annotations_json) as f:
            for a in json.load(f)["annotations"]:
                annos[a["question_id"]] = a
    for qid, q in questions.items():
        labels, scores = [], []
        if qid in annos:
            counts = Counter(normalize_answer(ans["answer"])
                             for ans in annos[qid]["answers"])
            for ans, c in counts.items():
                if ans in answer_vocab:
                    labels.append(answer_vocab[ans])
                    scores.append(vqa_soft_score(c))
        yield {
            "image_path": os.path.join(
                image_root, image_template.format(q["image_id"])),
            "caption": q["question"],
            "image_id": q["image_id"],
            "split": split,
            "question_id": qid,
            "answer_labels": labels,
            "answer_scores": scores,
        }


def nlvr2_records(jsonl_path: str, image_root: str, split: str
                  ) -> Iterable[Dict]:
    """NLVR2 paired-image records (ref write_nlvr2.py): image column holds
    the left image; `image_1_path` extra carries the right one."""
    with open(jsonl_path) as f:
        for line in f:
            ex = json.loads(line)
            ident = ex["identifier"]  # e.g. split-setid-pairid-sentid
            base = "-".join(ident.split("-")[:-1])
            yield {
                "image_path": os.path.join(image_root, f"{base}-img0.png"),
                "image_1_path": os.path.join(image_root,
                                             f"{base}-img1.png"),
                "caption": ex["sentence"],
                "image_id": ident,
                "split": split,
                "answers": 1 if ex["label"] == "True" else 0,
            }
