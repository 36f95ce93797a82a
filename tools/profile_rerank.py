"""Per-component profile of the ITM rerank pipeline on the real chip.

The tunneled runtime charges a fixed ~31 ms per python-level call with a
host fetch and per-kernel dispatch is free (docs/ROUND2_NOTES.md), so
each component is timed as R chained repetitions inside ONE jit
(lax.scan threading a data dependency), fetched once; the fixed call
cost is measured with a null program and subtracted.

Usage:  python tools/profile_rerank.py [--reps 3] [--scan 6]
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


def timed(fn, *args, reps):
    fn(*args)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_reps(apply_fn, R):
    """apply_fn(variables, data, eps) -> scalar; variables/data are jit
    ARGUMENTS (closing over device arrays would embed them as constants
    in the remote-compile request and blow its size limit)."""
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=6)
    ap.add_argument("--skip", default="",
                    help="comma list of labels to skip")
    ap.add_argument("--tail-batches", default="32,64,128",
                    help="comma list of fused-tail pair batches")
    ap.add_argument("--trunk-batches", default="8",
                    help="comma list of trunk image batches")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0)
    model = FiberCoarse(cfg)
    rng = np.random.default_rng(0)
    S = cfg.image_size

    img1 = jnp.asarray(rng.standard_normal((1, S, S, 3)) * 0.5,
                       cfg.compute_dtype)
    ids1 = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, cfg.max_text_len)),
                       jnp.int32)
    msk1 = jnp.ones((1, cfg.max_text_len), jnp.int32)
    variables = jax.jit(lambda r: model.init(
        r, img1, ids1, msk1, method=FiberCoarse.init_full))(
            jax.random.PRNGKey(0))

    TRUNK_GF, PRE_GF, TAIL_GF = 69.11, 3.57, 36.52
    R = args.scan

    # fixed per-call cost via a null scan
    base = timed(scan_reps(lambda v, d, c: c * 1.000001, R),
                 {}, jnp.zeros(1), jnp.float32(1.0), reps=args.reps)
    print(f"null    scan={R} {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, B, gf_per_item, apply_fn, data):
        if label in skip:
            return
        t = timed(scan_reps(apply_fn, R), variables, data,
                  jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R
        print(f"{label:7s} B={B:<4} {per * 1e3 / B:7.3f} ms/item "
              f"{B * gf_per_item / per / 1e3:6.1f} TF/s "
              f"(scan wall {t * 1e3:.1f} ms)", flush=True)

    # ---- trunk ----
    for B in tuple(int(b) for b in args.trunk_batches.split(",")):
        imgs = jnp.asarray(rng.standard_normal((B, S, S, 3)) * 0.5,
                           cfg.compute_dtype)

        def tr(v, d, eps):
            t = model.apply(v, d * (1.0 + eps),
                            method=FiberCoarse.encode_image_trunk)
            return t.astype(jnp.float32).sum()
        report("trunk", B, TRUNK_GF, tr, imgs)

    # ---- text prefix ----
    for B in (80,):
        ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                       (B, cfg.max_text_len)), jnp.int32)
        msk = jnp.ones((B, cfg.max_text_len), jnp.int32)

        def tp(v, d, eps):
            ids_, msk_ = d
            t = model.apply(v, ids_, msk_,
                            method=FiberCoarse.encode_text_pre)
            return t.astype(jnp.float32).sum() * (1.0 + eps * 0.0)
        report("textpre", B, PRE_GF, tp, (ids, msk))

    # ---- fused tail ----
    H3 = W3 = S // 16
    C3 = cfg.swin_embed_dim * 4
    for B in tuple(int(b) for b in args.tail_batches.split(",")):
        trunk = jnp.asarray(rng.standard_normal((B, H3, W3, C3)) * 0.1,
                            cfg.compute_dtype)
        tpre = jnp.asarray(
            rng.standard_normal((B, cfg.max_text_len, cfg.text_hidden_size))
            * 0.1, cfg.compute_dtype)
        msk = jnp.ones((B, cfg.max_text_len), jnp.int32)

        def tail(v, d, eps):
            trunk_, tpre_, msk_ = d
            out = model.apply(v, trunk_ * (1.0 + eps), tpre_, msk_,
                              method=FiberCoarse.infer_fused_tail)
            s = model.apply(v, out["cls_feats"],
                            method=FiberCoarse.rank_scores)
            return s.astype(jnp.float32).sum()
        report("tail", B, TAIL_GF, tail, (trunk, tpre, msk))


if __name__ == "__main__":
    main()
