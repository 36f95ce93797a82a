"""Probe the MONOLITHIC pretrain step scanned R steps inside one jit
(train_steps_scan) on the real chip — the production-loop timing the
split three-dispatch step cannot give (each dispatch re-marshals the
~3000-leaf param/grad/opt trees through the relay, ~150-400 ms/call at
these arg counts; r5 bench measured the split step at 803 ms while the
on-device work is far less).

Round-3 recorded the monolithic program "crashing the relay compile
helper" at B>=8; round-5's detection diagnosis showed that crash
signature is the relay watchdog timing out on a long FIRST EXECUTION
(server-side deferred compile), not a compiler fault — this probe
retries that path with patience.

Usage: python tools/probe_train_scan.py [--batch 8] [--scan 4] [--reps 3]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--remat", type=int, default=1)
    args = ap.parse_args()
    B, R = args.batch, args.scan

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.train.trainer import CoarseTrainer

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0,
                           remat=bool(args.remat),
                           loss_names=("mlm", "itc", "itm"))
    trainer = CoarseTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(
        (R, B, cfg.image_size, cfg.image_size, 3)) * 0.5,
        cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                   (R, B, cfg.max_text_len)), jnp.int32)
    msk = jnp.ones((R, B, cfg.max_text_len), jnp.int32)
    labels = jnp.full_like(ids, -100).at[:, :, 2].set(7)
    batches = {"image": img, "text_ids": ids, "text_masks": msk,
               "text_ids_mlm": ids, "text_labels_mlm": labels}

    print(f"compiling monolithic x{R}-step scan at B={B} ...", flush=True)
    t0 = time.perf_counter()
    state, losses = trainer.train_steps_scan(state, batches,
                                             jax.random.PRNGKey(1))
    l0 = float(losses[-1])
    print(f"first exec {time.perf_counter() - t0:.1f}s  loss={l0:.4f}",
          flush=True)

    ts = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        state, losses = trainer.train_steps_scan(state, batches,
                                                 jax.random.PRNGKey(2 + r))
        float(losses[-1])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / R
    print(f"steady {dt * 1e3:.1f} ms/step = {B / dt:.2f} ex/s "
          f"(vs 24.52 baseline -> {B / dt / 24.52:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
