"""Per-component profile of the ITM rerank pipeline on the real chip.

The tunneled runtime charges a fixed ~31 ms per python-level call with a
host fetch and per-kernel dispatch is free (docs/ROUND2_NOTES.md), so each
component is timed as R chained repetitions inside ONE jit (lax.scan with
a data dependency threaded through), fetched once; per-rep time is
(wall - wall_at_R0) / R estimated from two rep counts.

Usage:  python tools/profile_rerank.py [--reps 8]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps):
    """Median wall time of fn(*args) with a host-fetch barrier."""
    fn(*args)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_reps(apply_fn, R):
    """One jit running apply_fn R times with a chained perturbation."""
    @jax.jit
    def run(eps):
        def body(carry, i):
            out = apply_fn(carry + eps * (i + 1).astype(jnp.float32) * 1e-8)
            return carry, out
        _, outs = jax.lax.scan(body, eps, jnp.arange(R))
        return outs.sum()
    return run


def per_rep(apply_fn, reps=5, lo=2, hi=10):
    t_lo = timed(scan_reps(apply_fn, lo), jnp.float32(1.0), reps=reps)
    t_hi = timed(scan_reps(apply_fn, hi), jnp.float32(1.0), reps=reps)
    return (t_hi - t_lo) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

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

    # ---- trunk at several batches ----
    for B in (8, 16):
        imgs = jnp.asarray(rng.standard_normal((B, S, S, 3)) * 0.5,
                           cfg.compute_dtype)

        def tr(eps, imgs=imgs):
            t = model.apply(variables, imgs * (1.0 + eps),
                            method=FiberCoarse.encode_image_trunk)
            return t.astype(jnp.float32).sum()
        dt = per_rep(tr, reps=args.reps)
        print(f"trunk   B={B:<4} {dt * 1e3 / B:7.3f} ms/img  "
              f"{B * TRUNK_GF / dt / 1e3:6.1f} TF/s")

    # ---- text prefix ----
    for B in (80,):
        ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                       (B, cfg.max_text_len)), jnp.int32)
        msk = jnp.ones((B, cfg.max_text_len), jnp.int32)

        def tp(eps, ids=ids, msk=msk):
            t = model.apply(variables, ids, msk,
                            method=FiberCoarse.encode_text_pre)
            return t.astype(jnp.float32).sum() * (1.0 + eps * 0.0)
        dt = per_rep(tp, reps=args.reps)
        print(f"textpre B={B:<4} {dt * 1e3 / B:7.3f} ms/txt  "
              f"{B * PRE_GF / dt / 1e3:6.1f} TF/s")

    # ---- fused tail at several pair batches ----
    H3 = W3 = S // 16
    C3 = cfg.swin_embed_dim * 4
    for B in (16, 32, 64, 128):
        trunk = jnp.asarray(rng.standard_normal((B, H3, W3, C3)) * 0.1,
                            cfg.compute_dtype)
        tpre = jnp.asarray(
            rng.standard_normal((B, cfg.max_text_len, cfg.text_hidden_size))
            * 0.1,
            cfg.compute_dtype)
        msk = jnp.ones((B, cfg.max_text_len), jnp.int32)

        def tail(eps, trunk=trunk, tpre=tpre, msk=msk):
            out = model.apply(variables, trunk * (1.0 + eps), tpre, msk,
                              method=FiberCoarse.infer_fused_tail)
            s = model.apply(variables, out["cls_feats"],
                            method=FiberCoarse.rank_scores)
            return s.astype(jnp.float32).sum()
        dt = per_rep(tail, reps=args.reps)
        print(f"tail    B={B:<4} {dt * 1e3 / B:7.3f} ms/pair "
              f"{B * TAIL_GF / dt / 1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
