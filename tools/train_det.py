#!/usr/bin/env python
"""Detection/grounding training CLI (reference: tools/train_net.py).

Example:
  python tools/train_det.py --steps 100 --image-size 448 --batch 2 \
      --data synthetic
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run as `python tools/<x>.py`

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.detector import DetectorConfig
from fiber_tpu.train.detection_trainer import DetectionTrainer


def synthetic_batches(cfg: DetectorConfig, batch: int, max_boxes: int = 8,
                      seed: int = 0):
    rng = np.random.default_rng(seed)
    H, W = cfg.image_size
    T = cfg.max_query_len
    while True:
        n = rng.integers(1, max_boxes + 1, batch)
        boxes = np.zeros((batch, max_boxes, 4), np.float32)
        valid = np.zeros((batch, max_boxes), bool)
        pm = np.zeros((batch, max_boxes, T), np.float32)
        for b in range(batch):
            for g in range(n[b]):
                x1, y1 = rng.uniform(0, W - 64), rng.uniform(0, H - 64)
                w, h = rng.uniform(32, 128), rng.uniform(32, 128)
                boxes[b, g] = [x1, y1, min(x1 + w, W - 1),
                               min(y1 + h, H - 1)]
                valid[b, g] = True
                pm[b, g, rng.integers(1, T - 1)] = 1.0
        ids = rng.integers(5, cfg.vocab_size, (batch, T)).astype(np.int32)
        yield {
            "images": rng.standard_normal((batch, H, W, 3)).astype(
                np.float32),
            "input_ids": ids,
            "attention_mask": np.ones_like(ids),
            "gt_boxes": boxes, "gt_valid": valid, "positive_map": pm,
        }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lang-lr", type=float, default=1e-5)
    p.add_argument("--ema", type=float, default=0.999)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nan-dump-dir", default=None,
                   help="dump (batch, params) on non-finite loss "
                        "(ref engine/trainer.py:140-164; replay with "
                        "tools/debug_nan.py)")
    args = p.parse_args(argv)

    from fiber_tpu.parallel.multihost import maybe_initialize_distributed
    if maybe_initialize_distributed():
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices")

    if args.tiny:
        cfg = DetectorConfig.tiny_test()
    else:
        cfg = DetectorConfig(image_size=(args.image_size, args.image_size),
                             compute_dtype=jnp.bfloat16)
    trainer = DetectionTrainer(cfg, base_lr=args.lr, lang_lr=args.lang_lr,
                               max_iter=args.steps, ema_decay=args.ema,
                               warmup_iters=min(2000, args.steps // 10),
                               clip_norm=1.0)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    batches = synthetic_batches(cfg, args.batch, seed=args.seed)
    rng = jax.random.PRNGKey(args.seed + 1)
    from fiber_tpu.utils.nan_debug import NanDumper
    nan_dumper = NanDumper(args.nan_dump_dir)
    t0 = time.time()
    for step in range(args.steps):
        rng, sub = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, metrics = trainer.train_step(state, batch, sub)
        # Fetching "finite" forces a device->host sync every step
        # (~31 ms fixed on this runtime); only pay it when NaN dumping
        # is enabled or at logging boundaries.
        if nan_dumper.enabled and float(metrics["finite"]) == 0.0:
            nan_dumper.check(step, float("nan"), batch, state.params,
                             {k: float(v) for k, v in metrics.items()})
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {step} " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())) +
                  f" ({args.batch * (step + 1) / (time.time() - t0):.2f}"
                  " img/s)")
    return state


if __name__ == "__main__":
    main()
