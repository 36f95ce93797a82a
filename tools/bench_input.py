"""Measure input-pipeline throughput on this host: PIL-geometry path vs
decode-only staging for the on-device pipeline.

The pretrain step on the real chip runs at ~15-30 ex/s (ROUND2/3_NOTES);
the host must beat that per step to keep the chip fed.  This prints
ex/s for:
  pil      decode + RandomResizedCrop + HFlip + bicubic resize + fp32
           normalize on the host (the reference's dataloader work,
           transform.py:29-45)
  staged   decode + uint8 staging only (host side of the device
           pipeline, data/device_transforms.py)
  device   the device_train_preprocess jit program itself (amortized,
           on whatever backend is available)

Usage: python tools/bench_input.py [--n 64] [--size 640x480]
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    W, H = (int(x) for x in args.size.split("x"))

    from PIL import Image

    from fiber_tpu.data.device_transforms import stage_host
    from fiber_tpu.data.transforms import resize_image

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(args.n):
        # low-frequency content so JPEG decode cost is realistic
        small = rng.integers(0, 256, (H // 16, W // 16, 3), np.uint8)
        img = Image.fromarray(small).resize((W, H), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())

    S = args.image_size
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def pil_path():
        out = []
        r = np.random.default_rng(1)
        for b in blobs:
            arr = resize_image(Image.open(io.BytesIO(b)), S, train=True,
                               rng=r)
            out.append((arr.astype(np.float32) / 255.0 - mean) / std)
        return np.stack(out)

    staging = (S * 3) // 2

    def staged_path():
        st, sz = [], []
        for b in blobs:
            a, s = stage_host(Image.open(io.BytesIO(b)), staging)
            st.append(a)
            sz.append(s)
        return np.stack(st), np.stack(sz)

    for label, fn in (("pil", pil_path), ("staged", staged_path)):
        fn()
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"{label:7s} {args.n / dt:8.1f} ex/s "
              f"({dt / args.n * 1e3:6.2f} ms/img host)", flush=True)

    import jax
    import jax.numpy as jnp

    from fiber_tpu.data.device_transforms import device_train_preprocess

    staged, sizes = staged_path()
    dst = jnp.asarray(staged)
    dsz = jnp.asarray(sizes)

    def dev(seed):
        img = device_train_preprocess(dst, dsz, jax.random.PRNGKey(seed),
                                      S, dtype_name="bfloat16")
        return float(img.astype(jnp.float32).sum())

    dev(0)
    ts = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        dev(r + 1)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"device  {args.n / dt:8.1f} ex/s ({dt / args.n * 1e3:6.2f} "
          f"ms/img on {jax.devices()[0].platform})", flush=True)


if __name__ == "__main__":
    main()
