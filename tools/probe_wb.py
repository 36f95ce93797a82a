"""Sweep windows_per_program for the window-attention kernel at rerank
tail shapes, to separate per-program overhead from batched-matmul cost.

Usage: python tools/probe_wb.py [--batch 64]
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
    def run(data, eps):
        def body(carry, i):
            out = apply_fn(data,
                           carry + eps * (i + 1).astype(jnp.float32) * 1e-8)
            return carry, out
        _, outs = jax.lax.scan(body, eps, jnp.arange(R))
        return outs.sum()
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=6)
    args = ap.parse_args()
    B, R = args.batch, args.scan

    from fiber_tpu.ops.window_attention import fused_window_attention_windows

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    base = timed(scan_reps(lambda d, c: c * 1.000001, R),
                 jnp.zeros(1), jnp.float32(1.0), reps=args.reps)
    print(f"null {base * 1e3:7.2f} ms fixed", flush=True)

    # (nW, N, h, C) for stage-3 and stage-4 tail shapes
    for tag, nW, N, h, C in (("s3", 4, 144, 16, 512),
                             ("s4", 1, 144, 32, 1024)):
        xw = jnp.asarray(rng.standard_normal((B, nW, N, C)) * 0.1, dt)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, dt)
        bias = jnp.asarray(rng.standard_normal((nW, h, N, N)) * 0.1,
                           jnp.float32)

        def proj(d, eps):
            x, w, b = d
            return (((x * (1.0 + eps)) @ w).astype(jnp.float32).sum())
        t_proj = timed(scan_reps(proj, R), (xw, wqkv, bias),
                       jnp.float32(1.0), reps=args.reps)

        wbs = [w for w in (1, 2, 4) if nW % w == 0 and w <= nW]
        for wb in wbs:
            def pw(d, eps, wb=wb):
                x, w, b = d
                qkv = (x * (1.0 + eps)) @ w
                out = fused_window_attention_windows(qkv, b, h,
                                                     windows_per_program=wb)
                return out.astype(jnp.float32).sum()
            try:
                t = timed(scan_reps(pw, R), (xw, wqkv, bias),
                          jnp.float32(1.0), reps=args.reps)
            except Exception as e:
                print(f"{tag} WB={wb}: {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)
                continue
            per = (t - t_proj) / R / B
            print(f"{tag} WB={wb}  wa_ctx {per * 1e3:7.4f} ms/item",
                  flush=True)


if __name__ == "__main__":
    main()
