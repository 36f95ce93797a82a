#!/usr/bin/env python
"""Zero-shot detection / grounding evaluation CLI
(reference: tools/test_grounding_net.py + engine/inference.py).

Builds class-name prompts (chunked when the vocabulary exceeds the token
budget, ref TEST.CHUNKED_EVALUATION / create_queries_and_maps,
engine/inference.py:142-272), runs the detector per chunk, merges
detections across chunks, and evaluates with the self-contained COCO mAP.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run as `python tools/<x>.py`

import argparse
import json
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.data.od_to_grounding import (build_detection_prompt,
                                            build_label_to_token_map,
                                            chunk_class_names)
from fiber_tpu.data.tokenizer import (WhitespaceTokenizer,
                                      get_tokenizer)
from fiber_tpu.detection.detector import (DetectorConfig, GroundingDetector,
                                          detection_inference)
from fiber_tpu.detection.evaluation import (check_expected_results,
                                            coco_map)
from fiber_tpu.detection.postprocess import label_to_token_matrix


def evaluate_detection(model, variables, images: np.ndarray,
                       image_sizes: np.ndarray,
                       label_names: Dict[int, str],
                       ground_truths: Sequence[Dict],
                       tokenizer, chunk_size: int = 40,
                       batch: int = 1, **pp_kwargs) -> Dict[str, float]:
    """Chunked-class zero-shot OD evaluation loop.

    Under a multihost run each process evaluates a contiguous slice of the
    images and the per-image predictions are all-gathered before scoring
    (ref engine/inference.py:280 _accumulate_predictions_from_multiple_gpus
    over pickled object gathers, dist_utils.py:137-170)."""
    from fiber_tpu.parallel.multihost import merge_eval_predictions

    cfg = model.cfg
    chunks = chunk_class_names(label_names, chunk_size)
    n_total = len(images)
    my_ids = list(range(jax.process_index(), n_total, jax.process_count()))
    images = images[my_ids]
    image_sizes = image_sizes[my_ids]
    n = len(images)
    merged = [{"boxes": [], "scores": [], "labels": []} for _ in range(n)]
    for chunk in chunks:
        names = {l: label_names[l] for l in chunk}
        prompt = build_detection_prompt(names, chunk, num_negatives=0,
                                        rng=np.random.default_rng(0),
                                        shuffle=False)
        l2t_local = build_label_to_token_map(tokenizer, prompt,
                                             cfg.max_query_len)
        # local (1..len(chunk)) -> global label ids
        local_to_global = {i + 1: l for i, l in enumerate(chunk)}
        l2t = {i + 1: l2t_local[l] for i, l in enumerate(chunk)}
        agg = jnp.asarray(label_to_token_matrix(l2t, len(chunk),
                                                cfg.max_query_len))
        enc = tokenizer.batch([prompt.caption] * batch,
                              max_length=cfg.max_query_len)
        for i in range(0, n, batch):
            imgs = images[i:i + batch]
            pad = batch - len(imgs)
            if pad:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:],
                                    imgs.dtype)])
            b = {
                "images": jnp.asarray(imgs),
                "input_ids": jnp.asarray(enc["input_ids"], jnp.int32),
                "attention_mask": jnp.asarray(enc["attention_mask"],
                                              jnp.int32),
                "image_sizes": jnp.asarray(
                    np.concatenate([image_sizes[i:i + batch]] +
                                   ([np.ones((pad, 2), np.float32)]
                                    if pad else [])), jnp.float32),
            }
            dets = detection_inference(model, variables, b, agg,
                                       **pp_kwargs)
            for j in range(len(images[i:i + batch])):
                v = np.asarray(dets.valid[j])
                merged[i + j]["boxes"].append(np.asarray(dets.boxes[j])[v])
                merged[i + j]["scores"].append(
                    np.asarray(dets.scores[j])[v])
                merged[i + j]["labels"].append(np.asarray(
                    [local_to_global[int(c)]
                     for c in np.asarray(dets.labels[j])[v]], np.int64))
    local = {img_id: {
        "boxes": np.concatenate(m["boxes"]) if m["boxes"] else
        np.zeros((0, 4)),
        "scores": np.concatenate(m["scores"]) if m["scores"] else
        np.zeros((0,)),
        "labels": np.concatenate(m["labels"]) if m["labels"] else
        np.zeros((0,), np.int64),
    } for img_id, m in zip(my_ids, merged)}
    all_preds = merge_eval_predictions(local)
    predictions = [all_preds[i] for i in range(n_total)]
    return coco_map(predictions, ground_truths)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--num-images", type=int, default=4)
    p.add_argument("--chunk-size", type=int, default=3)
    p.add_argument("--expected", default=None,
                   help='JSON list of [metric, mean, tol] asserts')
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name/path (default roberta-base; "
                        "falls back to whitespace with a warning)")
    args = p.parse_args(argv)

    cfg = (DetectorConfig.tiny_test() if args.tiny
           else DetectorConfig(image_size=(448, 448),
                               compute_dtype=jnp.bfloat16))
    model = GroundingDetector(cfg)
    H, W = cfg.image_size
    rng = np.random.default_rng(0)
    tok = get_tokenizer(args.tokenizer)
    names = {1: "person", 2: "dog", 3: "car", 4: "cat", 5: "bus"}

    images = rng.standard_normal(
        (args.num_images, H, W, 3)).astype(np.float32)
    sizes = np.full((args.num_images, 2), float(H), np.float32)
    gts = [{"boxes": np.array([[4., 4., 40., 40.]]),
            "labels": np.array([rng.integers(1, 6)])}
           for _ in range(args.num_images)]

    ids = jnp.zeros((1, cfg.max_query_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(images[:1]), ids,
                           jnp.ones_like(ids))
    metrics = evaluate_detection(model, variables, images, sizes, names,
                                 gts, tok, chunk_size=args.chunk_size,
                                 pre_nms_top_n=100, post_nms_top_n=20)
    print(json.dumps(metrics))
    if args.expected:
        errs = check_expected_results(metrics, json.loads(args.expected))
        if errs:
            raise SystemExit("EXPECTED_RESULTS violated: " + "; ".join(errs))
    return metrics


if __name__ == "__main__":
    main()
