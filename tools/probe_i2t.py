"""Isolate the i2t cross-attention cost inside the fused stage-3 block.

tools/profile_tail.py (round 3, packed window kernel) shows blk3 at
0.135 ms/item of which packed window attention is only ~0.040 and the
dense matmuls ~0.035 — this probe finds where the remaining ~0.06 goes:

  blk3        fused block as-is
  blk3_plain  stage-3 PLAIN block (no text fusion) at the same shapes
  i2t_attn    the i2t attention einsums + softmax alone (h=16, hd=32,
              n=576, m=50: both contraction and key dims far below the
              128 MXU tile)
  i2t_packed  block-diagonal head-packed reformulation of the same math
              (the ops/window_attention.py packing trick applied to
              cross attention)

Usage: python tools/probe_i2t.py [--batch 64]
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
    print(f"null       {base * 1e3:7.2f} ms fixed", flush=True)

    def report(label, apply_fn, data, variables=None, gf=None):
        t = timed(scan_reps(apply_fn, R), variables or {}, data,
                  jnp.float32(1.0), reps=args.reps)
        per = (t - base) / R
        extra = f" {gf * B / per / 1e3:6.1f} TF/s" if gf else ""
        print(f"{label:10s} B={B:<4} {per * 1e3 / B:7.4f} ms/item{extra}",
              flush=True)
        return per

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0)
    model = FiberCoarse(cfg)
    S, L = cfg.image_size, cfg.max_text_len
    img1 = jnp.asarray(rng.standard_normal((1, S, S, 3)) * 0.5, dt)
    ids1 = jnp.asarray(rng.integers(4, cfg.vocab_size, (1, L)), jnp.int32)
    msk1 = jnp.ones((1, L), jnp.int32)
    variables = jax.jit(lambda r: model.init(
        r, img1, ids1, msk1, method=FiberCoarse.init_full))(
            jax.random.PRNGKey(0))

    H3, C3 = S // 16, cfg.swin_embed_dim * 4
    x3 = jnp.asarray(rng.standard_normal((B, H3, H3, C3)) * 0.1, dt)
    text = jnp.asarray(rng.standard_normal((B, L, 768)) * 0.1, dt)
    tbias = jnp.zeros((B, L), dt)

    def blk3(v, d, eps):
        x, t, tb = d
        stage3 = model.bind(v).swin.stages[2]
        out = stage3.blocks[14](x * (1.0 + eps), t, tb, True)
        return out.astype(jnp.float32).sum()
    report("blk3", blk3, (x3, text, tbias), variables=variables, gf=6.4)

    def blk3_plain(v, d, eps):
        x, t, tb = d
        stage3 = model.bind(v).swin.stages[2]
        out = stage3.blocks[0](x * (1.0 + eps), None, None, True)
        return out.astype(jnp.float32).sum()
    report("blk3_plain", blk3_plain, (x3, text, tbias),
           variables=variables, gf=5.0)

    # ---- i2t attention core alone ----
    h, hd = 16, 32
    n, m = H3 * H3, L
    q = jnp.asarray(rng.standard_normal((B, h, n, hd)) * 0.1, dt)
    k = jnp.asarray(rng.standard_normal((B, h, m, hd)) * 0.1, dt)
    v_ = jnp.asarray(rng.standard_normal((B, h, m, hd)) * 0.1, dt)
    GF = 2 * 2 * h * n * m * hd / 1e9  # useful flops per item

    def i2t_attn(vv, d, eps):
        q_, k_, v__ = d
        a = jnp.einsum("bhnd,bhmd->bhnm", q_ * (1.0 + eps), k_,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1).astype(dt)
        y = jnp.einsum("bhnm,bhmd->bhnd", a, v__)
        return y.astype(jnp.float32).sum()
    report("i2t_attn", i2t_attn, (q, k, v_), gf=GF)

    # ---- packed variant: G heads per 128-lane group ----
    G = 128 // hd                      # heads per group
    ng = h // G                        # groups
    eye = np.zeros((G, G * hd, hd), np.float32)
    for g in range(G):
        eye[g, g * hd:(g + 1) * hd] = np.eye(hd)
    eye = jnp.asarray(eye, dt)         # (G, Ghd, hd) scatter masks

    def i2t_packed(vv, d, eps):
        q_, k_, v__ = d
        q_ = q_ * (1.0 + eps)
        # q: (B, h, n, hd) -> (B, ng, G, n, hd) -> block-diag rows
        qg = q_.reshape(B, ng, G, n, hd)
        # (B, ng, G, n, Ghd): head g's q in channel block g
        qm = jnp.einsum("bygnd,gcd->bygnc", qg, eye)
        qm = qm.reshape(B, ng, G * n, G * hd)
        # k/v: (B, h, m, hd) -> (B, ng, m, Ghd) channel concat
        kg = k_.reshape(B, ng, G, m, hd).transpose(0, 1, 3, 2, 4)
        kg = kg.reshape(B, ng, m, G * hd)
        vg = v__.reshape(B, ng, G, m, hd).transpose(0, 1, 3, 2, 4)
        vg = vg.reshape(B, ng, m, G * hd)
        s = jnp.einsum("bync,bymc->bynm", qm, kg,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        ctx = jnp.einsum("bynm,bymc->bync", p, vg)  # (B, ng, G*n, Ghd)
        ctx = ctx.reshape(B, ng, G, n, G * hd)
        # keep the diagonal channel block of each head row-block
        y = jnp.einsum("bygnc,gcd->bygnd", ctx, eye)
        return y.astype(jnp.float32).sum()
    report("i2t_packed", i2t_packed, (q, k, v_), gf=GF)

    # numeric check (fp32, small)
    qs, ks, vs = (np.asarray(t[:2].astype(jnp.float32))
                  for t in (q, k, v_))
    def ref_np(q_, k_, v__):
        a = np.einsum("bhnd,bhmd->bhnm", q_, k_)
        a = a - a.max(-1, keepdims=True)
        e = np.exp(a)
        p = e / e.sum(-1, keepdims=True)
        return np.einsum("bhnm,bhmd->bhnd", p, v__)
    want = ref_np(qs, ks, vs)

    def packed_np(q_, k_, v__):
        out = jax.jit(lambda a, b, c: i2t_packed(
            None, (a.astype(dt), b.astype(dt), c.astype(dt)),
            jnp.float32(0.0)))
        # re-run the body without the sum for a value check
        B_ = q_.shape[0]
        qg = q_.reshape(B_, ng, G, n, hd)
        qm = np.einsum("bygnd,gcd->bygnc", qg, np.asarray(eye, np.float32))
        qm = qm.reshape(B_, ng, G * n, G * hd)
        kg = k_.reshape(B_, ng, G, m, hd).transpose(0, 1, 3, 2, 4)
        kg = kg.reshape(B_, ng, m, G * hd)
        vg = v__.reshape(B_, ng, G, m, hd).transpose(0, 1, 3, 2, 4)
        vg = vg.reshape(B_, ng, m, G * hd)
        s = np.einsum("bync,bymc->bynm", qm, kg)
        s = s - s.max(-1, keepdims=True)
        e = np.exp(s)
        p = e / e.sum(-1, keepdims=True)
        ctx = np.einsum("bynm,bymc->bync", p, vg)
        ctx = ctx.reshape(B_, ng, G, n, G * hd)
        y = np.einsum("bygnc,gcd->bygnd", ctx, np.asarray(eye, np.float32))
        return y
    got = packed_np(qs, ks, vs)
    err = np.abs(got - want.reshape(got.shape)).max()
    print(f"packed-vs-ref max abs err (fp32): {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
