"""Per-component profile of the grounding detector on the real chip.

Decomposes the 800x1344 forward (tools/bench_det.py's 206 ms/img round-2
number) into: patch embed + stages 1/2, stage 3 (the FLOP bulk at this
resolution), stage 4, FPN, the VLDyHead tower, and the language
backbone, so detector optimization targets the measured bottleneck.

Usage: python tools/profile_det.py [--batch 2] [--skip a,b]
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


def scan_reps(apply_fn, R):
    @jax.jit
    def run(variables, data, eps):
        def body(carry, i):
            out = apply_fn(variables, data,
                           carry + eps * (i + 1).astype(jnp.float32) * 1e-8)
            return carry, out
        _, outs = jax.lax.scan(body, eps, jnp.arange(R))
        return outs.sum()
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--short", type=int, default=800)
    ap.add_argument("--long", type=int, default=1344)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--skip", default="")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    B, R = args.batch, args.scan

    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector)

    cfg = DetectorConfig(image_size=(args.short, args.long),
                         compute_dtype=jnp.bfloat16,
                         use_pallas_attention=not args.no_pallas)
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

    base = timed(scan_reps(lambda v, d, c: c * 1.000001, R),
                 {}, jnp.zeros(1), jnp.float32(1.0), reps=args.reps)
    print(f"null     {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, apply_fn, data, gf=None):
        if label in skip:
            return
        t = timed(scan_reps(apply_fn, R), variables, data,
                  jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R / B
        extra = f" {gf / (per * 1e3):6.1f} TF/s" if gf else ""
        print(f"{label:9s} B={B:<3} {per * 1e3:8.2f} ms/img{extra}",
              flush=True)

    # full forward
    def full(v, d, eps):
        out = model.apply(v, d * (1.0 + eps), ids, msk)
        ho = out["head_out"]
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in ho.values() for x in
                   (lvl if isinstance(lvl, (list, tuple)) else [lvl]))
    report("full", full, images, gf=1213.3)

    bound = None

    # stages 1-2 (embed + 2 stages, matching the fusion backbone's loop)
    def s12(v, d, eps):
        b = model.bind(v).backbone
        x = b.patch_embed(d * (1.0 + eps))
        for s in range(2):
            stage = b.stages[s]
            for blk in stage.blocks:
                x = blk(x, deterministic=True)
            x = stage.downsample(x)
        return x.astype(jnp.float32).sum()
    try:
        report("s12", s12, images, gf=125.0)
    except Exception as e:
        print(f"s12 failed: {type(e).__name__} {str(e)[:200]}", flush=True)

    # stage 3 alone (plain blocks; fused tail blocks use zero-text) on
    # synthetic stage-3 input
    H3, W3 = H // 16, W // 16
    C3 = cfg.embed_dim * 4
    x3 = jnp.asarray(rng.standard_normal((B, H3, W3, C3)) * 0.1,
                     cfg.compute_dtype)
    lang0 = jnp.asarray(rng.standard_normal((B, L, cfg.lang_dim)) * 0.1,
                        cfg.compute_dtype)
    tb0 = jnp.zeros((B, L), cfg.compute_dtype)

    def s3(v, d, eps):
        b = model.bind(v).backbone
        x, lg = d
        x = x * (1.0 + eps)
        for blk, fused in zip(b.stages[2].blocks,
                              b.stages[2].fuse_flags):
            x = (blk(x, text=lg, text_bias=tb0, deterministic=True)
                 if fused else blk(x, deterministic=True))
        return x.astype(jnp.float32).sum()
    try:
        report("s3", s3, (x3, lang0), gf=499.0)
    except Exception as e:
        print(f"s3 failed: {type(e).__name__} {str(e)[:200]}", flush=True)

    # dyhead tower on synthetic FPN levels
    feats = []
    for st in cfg.anchor_strides:
        feats.append(jnp.asarray(
            rng.standard_normal((B, -(-H // st), -(-W // st),
                                 cfg.out_channels)) * 0.1,
            cfg.compute_dtype))
    lang = jnp.asarray(rng.standard_normal((B, L, cfg.lang_dim)) * 0.1,
                       cfg.compute_dtype)

    def dyhead(v, d, eps):
        f, lg = d
        out = model.bind(v).rpn([x * (1.0 + eps) for x in f], lg,
                                lang_mask=msk)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in out.values() for x in
                   (lvl if isinstance(lvl, (list, tuple)) else [lvl]))
    try:
        report("dyhead", dyhead, (feats, lang), gf=160.0)
    except Exception as e:
        print(f"dyhead failed: {type(e).__name__} {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
