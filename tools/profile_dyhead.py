"""Isolate the VLDyHead tower cost on the real chip: full vs no-deform
vs no-dyrelu/dyfuse vs plain-relu tower, at the 800x1344 FPN shapes.

Round-3 finding driver: tools/profile_det.py showed the tower at
2.1 TF/s (76 ms/img of the 113 ms/img forward)."""
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

from fiber_tpu.detection.dyhead import VLDyHead


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--short", type=int, default=800)
    ap.add_argument("--long", type=int, default=1344)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B, R = args.batch, args.scan
    H, W = args.short, args.long
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    CH, LD, T = 256, 768, 256
    strides = (8, 16, 32, 64, 128)

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal(
        (B, -(-H // s), -(-W // s), CH)) * 0.1, dt) for s in strides]
    lang = jnp.asarray(rng.standard_normal((B, T, LD)) * 0.1, dt)
    msk = jnp.ones((B, T), jnp.int32)

    def bench(label, **kw):
        head = VLDyHead(num_convs=6, in_channels=CH, channels=CH,
                        lang_dim=LD, max_query_len=T, dtype=dt, **kw)
        variables = jax.jit(head.init)(jax.random.PRNGKey(0), feats, lang,
                                       msk)

        @jax.jit
        def run(v, f, eps):
            def body(carry, i):
                out = head.apply(
                    v, [x * (1.0 + carry * 1e-8) for x in f], lang,
                    lang_mask=msk)
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for lvl in out.values() for x in
                        (lvl if isinstance(lvl, (list, tuple)) else [lvl]))
                return carry + eps * 1e-9, s
            c, outs = jax.lax.scan(body, eps, jnp.arange(R))
            return outs.sum() + c

        t = timed(run, variables, feats, jnp.float32(1.0))
        per = t / R / B * 1e3
        print(f"{label:24s} {per:8.2f} ms/img", flush=True)

    @jax.jit
    def null(eps):
        def body(c, i):
            return c * 1.000001, c
        c, _ = jax.lax.scan(body, eps, jnp.arange(R))
        return c
    t0 = timed(null, jnp.float32(1.0))
    print(f"null fixed overhead      {t0 * 1e3:8.2f} ms", flush=True)

    bench("full (deform+dy)")
    bench("no-deform", use_deform=False)
    bench("deform, no dyrelu/fuse", use_dyrelu=False, use_dyfuse=False)
    bench("plain (none)", use_deform=False, use_dyrelu=False,
          use_dyfuse=False)


if __name__ == "__main__":
    main()
