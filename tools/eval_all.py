#!/usr/bin/env python
"""Evaluate every checkpoint in an output directory
(reference: tools/eval_all.py).

Restores each saved step from the orbax CheckpointManager and runs the
provided eval callback, printing one JSON line per checkpoint.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run as `python tools/<x>.py`

import argparse
import json

import jax

from fiber_tpu.train.checkpoint import CheckpointManager


def eval_all(directory: str, abstract_state, eval_fn):
    """eval_fn(state) -> dict of metrics; yields (step, metrics)."""
    mgr = CheckpointManager(directory)
    steps = sorted(mgr._mgr.all_steps())
    for step in steps:
        state = mgr.restore(abstract_state, step=step)
        yield step, eval_fn(state)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--task", default="pretrain_mlm_itm_itc")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    from fiber_tpu.config import TASK_PRESETS, FiberConfig
    from fiber_tpu.train.trainer import CoarseTrainer
    import jax.numpy as jnp

    cfg = TASK_PRESETS[args.task]()
    if args.tiny:
        cfg = FiberConfig.tiny_test(loss_names=cfg.loss_names)
    trainer = CoarseTrainer(cfg)
    template = trainer.init_state(jax.random.PRNGKey(0))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        template)

    def eval_fn(state):
        import numpy as np
        rngk = jax.random.PRNGKey(0)
        batch = trainer.shard_batch({
            "image": np.random.default_rng(0).standard_normal(
                (8, cfg.image_size, cfg.image_size, 3)).astype(np.float32),
            "text_ids": np.full((8, cfg.max_text_len), 3, np.int32),
            "text_masks": np.ones((8, cfg.max_text_len), np.int32),
            "text_ids_mlm": np.full((8, cfg.max_text_len), 3, np.int32),
            "text_labels_mlm": np.full((8, cfg.max_text_len), -100,
                                       np.int32),
        })
        return {k: float(v)
                for k, v in trainer.eval_step(state, batch, rngk).items()}

    for step, metrics in eval_all(args.dir, abstract, eval_fn):
        print(json.dumps({"step": step, **metrics}))


if __name__ == "__main__":
    main()
