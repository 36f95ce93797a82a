"""Time the detection eval step (forward + postprocess + NMS) with the
in-one-jit chained-scan methodology (R reps, one host fetch, null-scan
fixed cost subtracted) and compare against its pieces — resolves the
round-5 discrepancy: tools/profile_det.py measured the forward at
72.6 ms/img while bench.py's per-dispatch loop recorded 269 ms/img at
the same B=2.

Usage: python tools/probe_fullstep.py [--batch 2] [--scan 4]
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


def timed(fn, *args, reps=3):
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    B, R = args.batch, args.scan

    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector,
                                              detection_inference,
                                              detector_anchors)
    from fiber_tpu.detection.postprocess import atss_postprocess

    cfg = DetectorConfig(image_size=(800, 1344),
                         compute_dtype=jnp.bfloat16)
    model = GroundingDetector(cfg)
    H, W = cfg.image_size
    L = cfg.max_query_len
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5,
                         cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, ids,
                                    msk)
    agg = np.zeros((80, L), np.float32)
    for c in range(80):
        agg[c, 2 * c + 1:2 * c + 3] = 0.5
    agg = jnp.asarray(agg)
    sizes = jnp.broadcast_to(jnp.asarray([float(H), float(W)]), (B, 2))

    @jax.jit
    def null(eps):
        def body(c, i):
            return c * 1.000001, c
        c, _ = jax.lax.scan(body, eps, jnp.arange(R))
        return c
    base = timed(null, jnp.float32(1.0), reps=args.reps)
    print(f"null     {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, step_fn):
        if label in skip:
            return

        @jax.jit
        def run(v, eps):
            def body(c, i):
                out = step_fn(v, 1.0 + c * 1e-8
                              + i.astype(jnp.float32) * 1e-9)
                return out, out
            c, _ = jax.lax.scan(body, eps, jnp.arange(R))
            return c
        t = timed(run, variables, jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R / B
        print(f"{label:10s} B={B:<3} {per * 1e3:8.2f} ms/img", flush=True)

    def fwd_only(v, eps):
        out = model.apply(v, images * eps, ids, msk)
        ho = out["head_out"]
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in ho.values() for x in
                   (lvl if isinstance(lvl, (list, tuple)) else [lvl]))
    report("fwd", fwd_only)

    def fwd_pp(v, eps):
        dets = detection_inference(model, v, {
            "images": images * eps, "input_ids": ids,
            "attention_mask": msk, "image_sizes": sizes}, agg)
        return (dets.scores.astype(jnp.float32).sum()
                + dets.boxes.astype(jnp.float32).sum())
    report("fwd+pp", fwd_pp)

    # postprocess alone on synthetic head outputs at the real shapes
    _, _, per_level = detector_anchors(cfg, (H, W))
    head_out = {"centerness": [], "bbox_reg": [], "dot_product_logits": []}
    for a in per_level:
        n = a.shape[0]
        head_out["centerness"].append(jnp.asarray(
            rng.standard_normal((B, n, 1)), jnp.float32))
        head_out["bbox_reg"].append(jnp.asarray(
            rng.standard_normal((B, n, 4)), jnp.float32))
        head_out["dot_product_logits"].append(jnp.asarray(
            rng.standard_normal((B, n, L)) - 3.0, jnp.float32))

    def pp_only(v, eps):
        ho = {k: [x * eps for x in vl] for k, vl in head_out.items()}
        dets = atss_postprocess(ho, per_level, agg, sizes)
        return (dets.scores.astype(jnp.float32).sum()
                + dets.boxes.astype(jnp.float32).sum())
    report("pp", pp_only)


if __name__ == "__main__":
    main()
