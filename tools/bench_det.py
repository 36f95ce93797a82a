"""Detector throughput bench at full eval resolution.

Times the FIBER grounding detector (fusion Swin-B backbone + VLDyHead)
forward at 800x1344 bf16 — the reference's test resolution
(MIN_SIZE_TEST 800 / MAX 1333, padded to the 32-stride multiple 1344;
configs/e2e_dyhead_SwinT*) — and the full postprocess path.  Prints one
JSON line per measurement to stdout.

Not part of the driver's bench.py contract; run manually:
    python tools/bench_det.py [--batch 2] [--short 800 --long 1344]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--short", type=int, default=800)
    ap.add_argument("--long", type=int, default=1344)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector)

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        cfg = DetectorConfig.tiny_test()
        B = 1
    else:
        cfg = DetectorConfig(image_size=(args.short, args.long),
                             compute_dtype=jnp.bfloat16)
        B = args.batch
    model = GroundingDetector(cfg)

    H, W = cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5,
                         cfg.compute_dtype)
    L = cfg.max_query_len
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, ids, msk)

    @jax.jit
    def fwd(v, im, i, m):
        out = model.apply(v, im, i, m)
        # reduce to a scalar so one fetch is the barrier
        ho = out["head_out"]
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in ho.values() for x in
                   (lvl if isinstance(lvl, (list, tuple)) else [lvl]))

    s = fwd(variables, images, ids, msk)
    _ = float(s)  # compile + warm
    t0 = time.perf_counter()
    for r in range(args.reps):
        s = fwd(variables, images * (1.0 + r * 1e-6), ids, msk)
    _ = float(s)
    dt = (time.perf_counter() - t0) / args.reps

    # Derived A100 baseline (BASELINE.md): the reference eval is
    # constrained to batch 1/GPU (generalized_vl_rcnn.py:363); 1213.3 GF
    # per 800x1344 image (XLA cost analysis) at an assumed 4% batch-1
    # eager MFU on a 312 TF/s A100.
    DET_FLOPS = 1213.3e9
    det_baseline = 312e12 * 0.04 / DET_FLOPS
    print(json.dumps({
        "metric": "detector_images_per_sec_per_chip",
        "resolution": [H, W], "batch": B,
        "sec_per_batch": round(dt, 4),
        "executed_tf_per_s": round(B * DET_FLOPS / dt / 1e12, 2),
        "a100_baseline_img_per_s": round(det_baseline, 2),
        "value": round(B / dt, 3), "unit": "img/s/chip",
        "vs_baseline": round(B / dt / det_baseline, 3),
    }))


if __name__ == "__main__":
    main()
