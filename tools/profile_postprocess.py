"""Decompose the detection postprocess on the real chip with SYNTHETIC
head outputs (no full-model compile): grounding->OD conversion, per-level
top-k, NMS.  Round-4: the bench with postprocess measured 2.6 img/s at
B=2 vs 6.76 without — find where the ~235 ms/img went.

Run: python tools/profile_postprocess.py [--batch 2] [--reps 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.detector import DetectorConfig, detector_anchors
from fiber_tpu.detection.postprocess import (atss_postprocess,
                                             grounding_to_od_scores)


def chain_time(fn, args, reps):
    s = fn(*args)
    jax.block_until_ready(s)
    float(np.asarray(s).ravel()[0])
    t0 = time.perf_counter()
    acc = None
    for r in range(reps):
        acc = fn(*args) if acc is None else fn(*args) + acc * 0
    float(np.asarray(acc).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    cfg = DetectorConfig(image_size=(800, 1344),
                         compute_dtype=jnp.bfloat16)
    H, W = cfg.image_size
    B = args.batch
    L = cfg.max_query_len
    rng = np.random.default_rng(0)
    _, _, per_level = detector_anchors(cfg, (H, W))
    sizes_hw = [(a.shape[0]) for a in per_level]
    print("anchors per level:", sizes_hw)

    # synthetic head outputs at the real shapes
    head_out = {"box_cls": [], "bbox_reg": [], "centerness": [],
                "dot_product_logits": []}
    for lvl, st in enumerate(cfg.anchor_strides):
        h, w = -(-H // st), -(-W // st)
        head_out["box_cls"].append(jnp.asarray(
            rng.standard_normal((B, h, w, 1)), jnp.float32))
        head_out["bbox_reg"].append(jnp.asarray(
            rng.standard_normal((B, h, w, 4)), jnp.float32))
        head_out["centerness"].append(jnp.asarray(
            rng.standard_normal((B, h, w, 1)), jnp.float32))
        head_out["dot_product_logits"].append(jnp.asarray(
            rng.standard_normal((B, h * w, L)) - 4.0, jnp.float32))
    agg = np.zeros((80, L), np.float32)
    for c in range(80):
        agg[c, 2 * c + 1:2 * c + 3] = 0.5
    agg = jnp.asarray(agg)
    sizes = jnp.broadcast_to(jnp.asarray([float(H), float(W)]), (B, 2))

    @jax.jit
    def scores_only(ho):
        s = jnp.float32(0.0)
        for lvl in range(5):
            s += grounding_to_od_scores(ho["dot_product_logits"][lvl],
                                        agg).sum()
        return s

    @jax.jit
    def topk_only(ho):
        s = jnp.float32(0.0)
        for lvl in range(5):
            sc = grounding_to_od_scores(ho["dot_product_logits"][lvl], agg)
            ctr = jax.nn.sigmoid(
                ho["centerness"][lvl].reshape(B, -1).astype(jnp.float32))
            sc = sc * ctr[:, :, None]
            k = min(1000, sc.shape[1] * sc.shape[2])
            top, idx = jax.lax.top_k(sc.reshape(B, -1), k)
            s += top.sum() + idx.astype(jnp.float32).sum()
        return s

    @jax.jit
    def full_pp(ho):
        dets = atss_postprocess(ho, per_level, agg, sizes)
        return (dets.scores.astype(jnp.float32).sum()
                + dets.boxes.astype(jnp.float32).sum())

    for name, fn in [("scores", scores_only), ("scores+topk", topk_only),
                     ("full(+nms)", full_pp)]:
        dt = chain_time(fn, (head_out,), args.reps)
        print(f"{name:12s} {dt * 1e3:8.1f} ms/batch  "
              f"{dt / B * 1e3:7.1f} ms/img", flush=True)


if __name__ == "__main__":
    main()
