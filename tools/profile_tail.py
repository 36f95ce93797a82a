"""Decompose the fused-tail per-pair cost on the real chip.

Times, at rerank tail shapes (B pairs, stage-3 24x24xC512 / stage-4
12x12xC1024), each suspect component inside one scan-jit:
  blk3     one fused stage-3 Swin block (the 4x repeated unit)
  blk4     one fused stage-4 block
  txt      one fused RoBERTa layer (with image K/V)
  wa_pal   the Pallas window-attention op incl. XLA head split/merge
  wa_ker   the raw kernel on pre-transposed operands (isolates the
           (B,nW,N,3C)->(3,B,nW,h,N,hd) transpose cost)
  wa_xla   the pure-XLA attention reference

Usage: python tools/profile_tail.py [--batch 64]
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
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    B, R = args.batch, args.scan

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse
    from fiber_tpu.ops.window_attention import (
        _kernel_call, fused_window_attention_windows,
        window_attention_windows_reference)

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0)
    model = FiberCoarse(cfg)
    rng = np.random.default_rng(0)
    S = cfg.image_size
    L = cfg.max_text_len

    img1 = jnp.asarray(rng.standard_normal((1, S, S, 3)) * 0.5,
                       cfg.compute_dtype)
    ids1 = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, L)), jnp.int32)
    msk1 = jnp.ones((1, L), jnp.int32)
    variables = jax.jit(lambda r: model.init(
        r, img1, ids1, msk1, method=FiberCoarse.init_full))(
            jax.random.PRNGKey(0))

    base = timed(scan_reps(lambda v, d, c: c * 1.000001, R),
                 {}, jnp.zeros(1), jnp.float32(1.0), reps=args.reps)
    print(f"null     {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, apply_fn, data, gf=None):
        if label in skip:
            return
        t = timed(scan_reps(apply_fn, R), variables, data,
                  jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R
        extra = f" {gf * B / per / 1e3:6.1f} TF/s" if gf else ""
        print(f"{label:8s} B={B:<4} {per * 1e3 / B:7.4f} ms/item{extra}",
              flush=True)

    # stage-3 fused block: x (B, 24, 24, 512), text (B, L, 768)
    H3 = S // 16
    C3 = cfg.swin_embed_dim * 4
    x3 = jnp.asarray(rng.standard_normal((B, H3, H3, C3)) * 0.1,
                     cfg.compute_dtype)
    text = jnp.asarray(rng.standard_normal((B, L, 768)) * 0.1,
                       cfg.compute_dtype)
    tbias = jnp.zeros((B, L), cfg.compute_dtype)

    def blk3(v, d, eps):
        x, t, tb = d
        stage3 = model.bind(v).swin.stages[2]
        out = stage3.blocks[14](x * (1.0 + eps), t, tb, True)
        return out.astype(jnp.float32).sum()
    report("blk3", blk3, (x3, text, tbias), gf=6.4)

    H4 = S // 32
    C4 = cfg.swin_embed_dim * 8
    x4 = jnp.asarray(rng.standard_normal((B, H4, H4, C4)) * 0.1,
                     cfg.compute_dtype)

    def blk4(v, d, eps):
        x, t, tb = d
        stage4 = model.bind(v).swin.stages[3]
        out = stage4.blocks[0](x * (1.0 + eps), t, tb, True)
        return out.astype(jnp.float32).sum()
    report("blk4", blk4, (x4, text, tbias), gf=3.7)

    # one fused text layer (with image K/V from stage-3 tokens)
    ext = jnp.zeros((B, 1, 1, L), cfg.compute_dtype)
    img_tok = x3.reshape(B, H3 * H3, C3)

    def txt(v, d, eps):
        t, m, it = d
        bound = model.bind(v)
        out = bound.text.layers[6](t * (1.0 + eps), attn_mask=m,
                                   image_feats=it, deterministic=True)
        return out.astype(jnp.float32).sum()
    report("txt", txt, (text, ext, img_tok), gf=2.0)

    # window attention at stage-3 tail shapes: nW=4, N=144, C=512, h=16
    nW, N = 4, 144
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C3)) * 0.1,
                      cfg.compute_dtype)
    bias = jnp.asarray(rng.standard_normal((nW, 16, N, N)) * 0.1,
                       jnp.float32)
    WA_GF = 2 * 2 * nW * 16 * N * N * 32 / 1e9

    def wa_pal(v, d, eps):
        q, b = d
        out = fused_window_attention_windows(q * (1.0 + eps), b, 16)
        return out.astype(jnp.float32).sum()
    report("wa_pal", wa_pal, (qkv, bias), gf=WA_GF)

    x6 = qkv.reshape(B, nW, N, 3, 16, 32).transpose(3, 0, 1, 4, 2, 5)
    q6, k6, v6 = x6[0], x6[1], x6[2]
    bias_b = jnp.broadcast_to(bias[None], (B, nW, 16, N, N))

    # measure the XLA-side head-split transpose alone (the kernel's
    # (B,nW,N,3C) -> (3,B,nW,h,N,hd) staging)
    def wa_tr(v, d, eps):
        q, = d
        x = (q * (1.0 + eps)).reshape(B, nW, N, 3, 16, 32)
        x = x.transpose(3, 0, 1, 4, 2, 5)
        return x.astype(jnp.float32).sum()
    report("wa_tr", wa_tr, (qkv,))

    def wa_xla(v, d, eps):
        q, b = d
        out = window_attention_windows_reference(q * (1.0 + eps), b, 16)
        return out.astype(jnp.float32).sum()
    report("wa_xla", wa_xla, (qkv, bias), gf=WA_GF)


if __name__ == "__main__":
    main()
