"""Compare the detection forward alone vs the full eval step (forward +
postprocess) in ONE jit, on the real chip — the postprocess alone costs
5.5 ms/img (tools/profile_postprocess.py) yet adding it to the bench
step cost ~235 ms/img.  Isolate where the combined program loses time.

Run: python tools/probe_det_step.py [--batch 2] [--reps 4]
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

from fiber_tpu.detection.detector import (DetectorConfig, GroundingDetector,
                                          detection_inference,
                                          detector_anchors)


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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    cfg = DetectorConfig(image_size=(800, 1344),
                         compute_dtype=jnp.bfloat16)
    model = GroundingDetector(cfg)
    H, W = cfg.image_size
    B = args.batch
    L = cfg.max_query_len
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5,
                         cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, ids, msk)
    agg = np.zeros((80, L), np.float32)
    for c in range(80):
        agg[c, 2 * c + 1:2 * c + 3] = 0.5
    agg = jnp.asarray(agg)
    sizes = jnp.broadcast_to(jnp.asarray([float(H), float(W)]), (B, 2))

    @jax.jit
    def fwd_only(v, im):
        out = model.apply(v, im, ids, msk, deterministic=True)
        ho = out["head_out"]
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in ho.values() for x in lvl)

    @jax.jit
    def full(v, im):
        dets = detection_inference(model, v, {
            "images": im, "input_ids": ids, "attention_mask": msk,
            "image_sizes": sizes}, agg)
        return (dets.scores.astype(jnp.float32).sum()
                + dets.boxes.astype(jnp.float32).sum())

    for name, fn in [("fwd_only", fwd_only), ("full", full)]:
        if name in skip:
            continue
        dt = chain_time(fn, (variables, images), args.reps)
        print(f"{name:9s} {dt * 1e3:8.1f} ms/batch  {B / dt:6.2f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
