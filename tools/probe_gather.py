"""Probe TPU gather bandwidth vs source layout.

Hypothesis (round 4): jnp.take rows of a (N, 1024)-bf16 array run at
~145 GB/s useful (round-3 probe_take) because each 2048-byte logical row
occupies ONE SUBLANE across eight (8, 128) tiles — the gather pulls full
tiles and wastes 7/8 of the traffic.  Reshaping the source to
(N, 8, 128) makes each logical row exactly one native tile, so the same
gather should approach HBM speed (~819 GB/s on v5e).

Run on the real chip: python tools/probe_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # host fetch barrier
    t0 = time.perf_counter()
    acc = None
    for r in range(reps):
        # chain a data dependency through reps; single fetch at the end
        acc = fn(*args) if acc is None else fn(*args) + acc * 0
    float(np.asarray(acc).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    # P3-like: source 101*169 rows of 4C=1024 bf16 (2048 B); 9 taps
    N = 101 * 169
    M = 16800 * 9
    C4 = 1024
    x2d = jnp.asarray(rng.standard_normal((N, C4)), jnp.bfloat16)
    x3d = x2d.reshape(N, 8, 128)
    idx = jnp.asarray(rng.integers(0, N, (M,)), jnp.int32)
    ly = jnp.asarray(rng.random((M, 1)), jnp.bfloat16)
    lx = jnp.asarray(rng.random((M, 1)), jnp.bfloat16)
    useful_gb = M * C4 * 2 / 1e9

    @jax.jit
    def take2d(x, i):
        return jnp.take(x, i, axis=0).astype(jnp.float32).sum()

    @jax.jit
    def take3d(x, i):
        return jnp.take(x, i, axis=0).astype(jnp.float32).sum()

    @jax.jit
    def take2d_bilinear(x, i, a, b):
        g = jnp.take(x, i, axis=0)
        C = 256
        s = (g[:, :C] * ((1 - a) * (1 - b)) + g[:, C:2 * C] * ((1 - a) * b)
             + g[:, 2 * C:3 * C] * (a * (1 - b)) + g[:, 3 * C:] * (a * b))
        return s.astype(jnp.float32).sum()

    @jax.jit
    def take3d_bilinear_tile(x, i, a, b):
        g = jnp.take(x, i, axis=0)              # (M, 8, 128)
        a = a[..., None]
        b = b[..., None]
        # corners live on sublane pairs: [0:2]=c00 [2:4]=c01 [4:6]=c10 [6:8]
        s = (g[:, 0:2] * ((1 - a) * (1 - b)) + g[:, 2:4] * ((1 - a) * b)
             + g[:, 4:6] * (a * (1 - b)) + g[:, 6:8] * (a * b))  # (M,2,128)
        return s.astype(jnp.float32).sum()

    @jax.jit
    def take3d_reshape(x, i):
        g = jnp.take(x, i, axis=0).reshape(-1, C4)
        return g.astype(jnp.float32).sum()

    for name, fn, args in [
        ("take2d (N,1024)", take2d, (x2d, idx)),
        ("take3d (N,8,128)", take3d, (x3d, idx)),
        ("take2d+bilinear", take2d_bilinear, (x2d, idx, ly, lx)),
        ("take3d+bilinear-tile", take3d_bilinear_tile, (x3d, idx, ly, lx)),
        ("take3d+reshape1024", take3d_reshape, (x3d, idx)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:26s} {dt * 1e3:8.3f} ms  "
              f"{useful_gb / dt:7.1f} GB/s useful")


if __name__ == "__main__":
    main()
