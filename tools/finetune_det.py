#!/usr/bin/env python
"""Few-shot detection fine-tuning CLI (ref fine_grained/tools/finetune.py).

Supports the reference's tuning registry (tuning_highlevel_override,
finetune.py:246-294): full / linear_prob / language_prompt_v1..v4 — the
prompt modes freeze the backbone+FPN+head and train only the language
path and/or the zero-init tunable prompt linear — plus X-shot subsetting
and patience-based early termination.

Usage:
  python tools/finetune_det.py --tuning language_prompt_v2 --shots 5 \
      [--img-root DIR --ann-file FILE.json] [--tiny]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run as `python tools/<x>.py`

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.detector import DetectorConfig
from fiber_tpu.train.detection_trainer import MultiScaleDetectionTrainer
from fiber_tpu.train.finetune import (EarlyStopper, TUNING_MODES,
                                      apply_tuning_mode,
                                      trainable_mask, x_shot_subset)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tuning", default="full", choices=TUNING_MODES)
    p.add_argument("--shots", type=int, default=0,
                   help="X-shot subsetting (0 = use everything)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=8)
    p.add_argument("--img-root", default=None)
    p.add_argument("--ann-file", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name/path (default roberta-base; "
                        "falls back to whitespace with a warning)")
    args = p.parse_args(argv)

    from fiber_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    cfg = DetectorConfig.tiny_test(
        add_linear_layer=args.tuning in ("language_prompt_v2",
                                         "language_prompt_v4")) \
        if args.tiny else DetectorConfig(
            image_size=(448, 448), compute_dtype=jnp.bfloat16,
            add_linear_layer=args.tuning in ("language_prompt_v2",
                                             "language_prompt_v4"))

    trainer = MultiScaleDetectionTrainer(cfg, base_lr=args.lr,
                                         max_iter=args.steps,
                                         warmup_iters=max(1,
                                                          args.steps // 10),
                                         ema_decay=None)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    # freeze per the tuning mode: zero the masked updates
    trainer.primary._tx = apply_tuning_mode(trainer.primary._tx,
                                            state.params, args.tuning)
    state = state.replace(opt_state=trainer.primary._tx.init(state.params))
    n_train = sum(int(np.asarray(m).sum() if hasattr(m, "sum") else m)
                  for m in jax.tree_util.tree_leaves(
                      jax.tree_util.tree_map(
                          lambda t: int(t),
                          trainable_mask(state.params, args.tuning))))
    print(f"tuning={args.tuning}: {n_train} trainable leaves")

    if args.ann_file:
        from fiber_tpu.data.coco_datasets import CocoGroundingDataset
        from fiber_tpu.data.loader import DetectionBatcher
        from fiber_tpu.data.tokenizer import get_tokenizer
        ds = CocoGroundingDataset(args.img_root, args.ann_file,
                                  get_tokenizer(getattr(args, 'tokenizer', None)),
                                  max_query_len=cfg.max_query_len)
        if args.shots:
            keep = x_shot_subset(
                [ds._record(i)["labels"].tolist() for i in range(len(ds))],
                args.shots, np.random.default_rng(args.seed))
            ds.images = [ds.images[i] for i in keep]
            print(f"x-shot({args.shots}): {len(ds)} images")
        H, W = cfg.image_size

        def batch_stream():
            while True:
                for b in DetectionBatcher(ds, args.batch,
                                          min_sizes=(min(H, W),),
                                          max_size=max(H, W),
                                          min_items=args.batch * 4,
                                          seed=args.seed):
                    yield b
        batches = batch_stream()
    else:
        from tools.train_det import synthetic_batches
        batches = synthetic_batches(cfg, args.batch, seed=args.seed)

    stopper = EarlyStopper(patience=args.patience, minimize=True)
    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step in range(args.steps):
        rng, sub = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()
                 if k in ("images", "input_ids", "attention_mask",
                          "gt_boxes", "gt_valid", "positive_map")}
        state, metrics = trainer.train_step(state, batch, sub)
        loss = float(metrics["total_loss"])
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step} loss={loss:.4f} "
                  f"({(step + 1) / (time.time() - t0):.2f} it/s)")
        if stopper.update(loss):
            print(f"early stop at step {step} (best={stopper.best:.4f})")
            break
    print(json.dumps({"final_loss": loss, "best": stopper.best}))
    return state


if __name__ == "__main__":
    main()
