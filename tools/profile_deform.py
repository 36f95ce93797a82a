"""Micro-bench deformable-conv gather formulations on the real chip.

Round-3: the DCNv2 tower costs 68 ms/img of the 113 ms detector forward.
Variants:
  current : 2D advanced-index gather, 4 gathers per tap (36 total)
  linear  : flattened row index + jnp.take, 4 per tap
  packed  : 2x2 corner patches pre-packed into 4C channels, 1 gather/tap
  plain   : dense 3x3 conv (floor for reference)
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
    float(jnp.sum(fn(*args)).astype(jnp.float32))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def current_gather(x, sy, sx):
    H, W, C = x.shape
    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    y = jnp.clip(sy, 0.0, H - 1)
    xx = jnp.clip(sx, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (xx - x0)[..., None]
    out = (x[y0, x0] * (1 - ly) * (1 - lx) + x[y0, x1] * (1 - ly) * lx
           + x[y1, x0] * ly * (1 - lx) + x[y1, x1] * ly * lx)
    return out * valid[..., None]


def linear_gather(x, sy, sx):
    H, W, C = x.shape
    xf = x.reshape(H * W, C)
    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    y = jnp.clip(sy, 0.0, H - 1)
    xx = jnp.clip(sx, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (xx - x0)[..., None]
    g = lambda yi, xi: jnp.take(xf, yi * W + xi, axis=0)
    out = (g(y0, x0) * (1 - ly) * (1 - lx) + g(y0, x1) * (1 - ly) * lx
           + g(y1, x0) * ly * (1 - lx) + g(y1, x1) * ly * lx)
    return out * valid[..., None]


def packed_gather(xp, H, W, sy, sx):
    """xp (H*W, 4C): channels [x(y,x) | x(y,x+1) | x(y+1,x) | x(y+1,x+1)]
    pre-packed (corners clamped)."""
    C4 = xp.shape[-1]
    C = C4 // 4
    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    y = jnp.clip(sy, 0.0, H - 1)
    xx = jnp.clip(sx, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    ly = (y - y0)[..., None]
    lx = (xx - x0)[..., None]
    p = jnp.take(xp, y0 * W + x0, axis=0)   # (..., 4C)
    s = p.shape[:-1]
    p = p.reshape(s + (4, C))
    out = (p[..., 0, :] * (1 - ly) * (1 - lx) + p[..., 1, :] * (1 - ly) * lx
           + p[..., 2, :] * ly * (1 - lx) + p[..., 3, :] * ly * lx)
    return out * valid[..., None]


def pack_corners(x):
    H, W, C = x.shape
    xr = jnp.pad(x, ((0, 1), (0, 1), (0, 0)), mode="edge")
    return jnp.concatenate(
        [xr[:H, :W], xr[:H, 1:W + 1], xr[1:H + 1, :W], xr[1:H + 1, 1:W + 1]],
        axis=-1).reshape(H * W, 4 * C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=100)
    ap.add_argument("--w", type=int, default=168)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    H, W, C, B = args.h, args.w, args.c, args.batch
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    K = 9

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, dt)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01, dt)
    off = jnp.asarray(rng.standard_normal((B, H, W, 2 * K)) * 1.5, dt)
    mask = jnp.asarray(rng.random((B, H, W, K)), dt)

    base_y = jnp.arange(H, dtype=jnp.float32)[:, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, :]

    def deform(gather, xi, offi, mi):
        out = jnp.zeros((H, W, C), jnp.float32)
        k = 0
        for ky in range(3):
            for kx in range(3):
                sy = base_y + (ky - 1) + offi[..., 2 * k].astype(jnp.float32)
                sx = base_x + (kx - 1) + offi[..., 2 * k + 1].astype(
                    jnp.float32)
                sm = gather(xi, sy, sx) * mi[..., k][..., None]
                out = out + jnp.einsum("hwc,cd->hwd", sm.astype(dt),
                                       w[ky, kx],
                                       preferred_element_type=jnp.float32)
                k += 1
        return out

    @jax.jit
    def run_current(x, off, mask):
        return jax.vmap(lambda a, b, c: deform(current_gather, a, b, c))(
            x, off, mask)

    @jax.jit
    def run_linear(x, off, mask):
        return jax.vmap(lambda a, b, c: deform(linear_gather, a, b, c))(
            x, off, mask)

    @jax.jit
    def run_packed(x, off, mask):
        def one(a, b, c):
            ap_ = pack_corners(a)
            return deform(lambda _, sy, sx: packed_gather(ap_, H, W, sy, sx),
                          a, b, c)
        return jax.vmap(one)(x, off, mask)

    @jax.jit
    def run_plain(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    flops = B * H * W * C * C * 9 * 2
    for name, fn, a in (("plain", run_plain, (x,)),
                        ("current", run_current, (x, off, mask)),
                        ("linear", run_linear, (x, off, mask)),
                        ("packed", run_packed, (x, off, mask))):
        t = timed(fn, *a)
        print(f"{name:8s} {t * 1e3:8.2f} ms  {flops / t / 1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
