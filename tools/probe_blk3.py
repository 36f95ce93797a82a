"""Decompose the stage-3 fused block cost on the real chip.

The rerank tail spends 64% of its time in 4x stage-3 fused blocks
running at ~49 TF/s (tools/profile_tail.py round 3).  This probe
separates the dense-matmul ceiling from attention/layout overheads:

  mm_mlp    pure (B*576, 512)@(512, 2048) matmul     -> MXU ceiling
  mm_big    pure (B*576, 2048)@(2048, 512)
  blk3      the fused block as-is (Pallas window attention)
  blk3_xla  same block, XLA-reference window attention
  wa_ctx    qkv-projection + window attention MINUS qkv-projection
            alone (in-context attention cost, no HBM staging artifact)

Usage: python tools/probe_blk3.py [--batch 64]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=6)
    args = ap.parse_args()
    B, R = args.batch, args.scan

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    base = timed(scan_reps(lambda v, d, c: c * 1.000001, R),
                 {}, jnp.zeros(1), jnp.float32(1.0), reps=args.reps)
    print(f"null      {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, apply_fn, data, variables=None, gf=None):
        t = timed(scan_reps(apply_fn, R), variables or {}, data,
                  jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R
        extra = f" {gf * B / per / 1e3:6.1f} TF/s" if gf else ""
        print(f"{label:9s} B={B:<4} {per * 1e3 / B:7.4f} ms/item{extra}",
              flush=True)
        return per

    M = B * 576
    a1 = jnp.asarray(rng.standard_normal((M, 512)) * 0.1, dt)
    w1 = jnp.asarray(rng.standard_normal((512, 2048)) * 0.05, dt)
    report("mm_mlp", lambda v, d, eps: (
        (d[0] * (1.0 + eps)) @ d[1]).astype(jnp.float32).sum(),
        (a1, w1), gf=2 * M * 512 * 2048 / B / 1e9)

    a2 = jnp.asarray(rng.standard_normal((M, 2048)) * 0.1, dt)
    w2 = jnp.asarray(rng.standard_normal((2048, 512)) * 0.05, dt)
    report("mm_big", lambda v, d, eps: (
        (d[0] * (1.0 + eps)) @ d[1]).astype(jnp.float32).sum(),
        (a2, w2), gf=2 * M * 512 * 2048 / B / 1e9)

    # both blocks at once (qkv then mlp chained like the block does)
    wq = jnp.asarray(rng.standard_normal((512, 1536)) * 0.05, dt)
    def chain(v, d, eps):
        x, wqkv, wup, wdn = d
        q = (x * (1.0 + eps)) @ wqkv
        h = (q[:, :512] @ wup)
        o = jax.nn.gelu(h) @ wdn
        return o.astype(jnp.float32).sum()
    w_dn = jnp.asarray(rng.standard_normal((2048, 512)) * 0.05, dt)
    report("mm_chain", chain, (a1, wq, w1, w_dn),
           gf=(2 * M * 512 * 1536 + 2 * M * 512 * 2048 * 2) / B / 1e9)

    # model blocks
    for use_pallas, label in ((True, "blk3"), (False, "blk3_xla")):
        cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                               swin_drop_path_rate=0.0,
                               use_pallas_attention=use_pallas)
        model = FiberCoarse(cfg)
        S, L = cfg.image_size, cfg.max_text_len
        img1 = jnp.asarray(rng.standard_normal((1, S, S, 3)) * 0.5, dt)
        ids1 = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, L)),
                           jnp.int32)
        msk1 = jnp.ones((1, L), jnp.int32)
        variables = jax.jit(lambda r: model.init(
            r, img1, ids1, msk1, method=FiberCoarse.init_full))(
                jax.random.PRNGKey(0))
        H3, C3 = S // 16, cfg.swin_embed_dim * 4
        x3 = jnp.asarray(rng.standard_normal((B, H3, H3, C3)) * 0.1, dt)
        text = jnp.asarray(rng.standard_normal((B, L, 768)) * 0.1, dt)
        tbias = jnp.zeros((B, L), dt)

        def blk3(v, d, eps, model=model):
            x, t, tb = d
            stage3 = model.bind(v).swin.stages[2]
            out = stage3.blocks[14](x * (1.0 + eps), t, tb, True)
            return out.astype(jnp.float32).sum()
        report(label, blk3, (x3, text, tbias), variables=variables,
               gf=6.4)

    # in-context window attention: (qkv proj + kernel) - (qkv proj)
    from fiber_tpu.ops.window_attention import (
        fused_window_attention_windows, window_attention_windows_reference)
    nW, N, h = 4, 144, 16
    xw = jnp.asarray(rng.standard_normal((B, nW, N, 512)) * 0.1, dt)
    wqkv = jnp.asarray(rng.standard_normal((512, 1536)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((nW, h, N, N)) * 0.1,
                       jnp.float32)
    WA_GF = 2 * 2 * nW * h * N * N * 32 / 1e9

    t_proj = report("qkvproj", lambda v, d, eps: (
        ((d[0] * (1.0 + eps)) @ d[1]).astype(jnp.float32).sum()),
        (xw, wqkv), gf=2 * nW * N * 512 * 1536 / 1e9)

    def proj_wa(v, d, eps):
        x, w, b = d
        qkv = (x * (1.0 + eps)) @ w
        out = fused_window_attention_windows(qkv, b, h)
        return out.astype(jnp.float32).sum()
    t_pw = report("proj+wa", proj_wa, (xw, wqkv, bias))

    def proj_wa_xla(v, d, eps):
        x, w, b = d
        qkv = (x * (1.0 + eps)) @ w
        out = window_attention_windows_reference(qkv, b, h)
        return out.astype(jnp.float32).sum()
    t_px = report("proj+wax", proj_wa_xla, (xw, wqkv, bias))

    print(f"wa_ctx    B={B:<4} {(t_pw - t_proj) * 1e3 / B:7.4f} ms/item "
          f"{WA_GF * B / max(t_pw - t_proj, 1e-9) / 1e3:6.1f} TF/s",
          flush=True)
    print(f"wax_ctx   B={B:<4} {(t_px - t_proj) * 1e3 / B:7.4f} ms/item "
          f"{WA_GF * B / max(t_px - t_proj, 1e-9) / 1e3:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
