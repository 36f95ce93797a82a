"""Replay a NaN dump under fp32 vs bf16 to locate the diverging loss term.

TPU-native equivalent of the reference's replay debugger
(fine_grained/tools/train_net.py:150-217 debug_nan): load the dumped
(batch, params) written by fiber_tpu.utils.nan_debug, re-run the coarse
pretraining losses once per compute dtype, and print which terms are
finite in each — a NaN only under bf16 points at a precision issue, a NaN
in both at data or state corruption.

Usage:
  python tools/debug_nan.py <dump.npz> --task pretrain_mlm_itm_itc [--tiny]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run as `python tools/<x>.py`

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dump", help=".npz written by nan_debug")
    p.add_argument("--task", default="pretrain_mlm_itm_itc")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--set", nargs="*", metavar="KEY=VALUE", default=[])
    args = p.parse_args(argv)

    from fiber_tpu.cli import _parse_overrides
    from fiber_tpu.config import TASK_PRESETS, FiberConfig
    from fiber_tpu.parallel.itc_queue import ItcQueue
    from fiber_tpu.train.trainer import CoarseTrainer
    from fiber_tpu.utils.nan_debug import replay

    cfg = TASK_PRESETS[args.task](**_parse_overrides(args.set))
    if args.tiny:
        cfg = FiberConfig.tiny_test(loss_names=cfg.loss_names)

    def loss_fn(params, batch, compute_dtype):
        c = cfg.replace(compute_dtype=compute_dtype)
        trainer = CoarseTrainer(c)
        queue = None
        if "itc" in c.loss_names:
            queue = ItcQueue.create(
                jax.random.PRNGKey(0), c.itc_queue_size, c.hidden_size,
                c.image_size, c.max_text_len, input_dtype=c.compute_dtype)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, (metrics, _) = trainer.loss_fn(params, jbatch, queue,
                                             jax.random.PRNGKey(1),
                                             train=False)
        out = dict(metrics)
        out["total_loss"] = loss
        return out

    report = replay(args.dump, loss_fn)
    print(json.dumps(
        {dt: {k: {"value": v, "finite": f} for k, (v, f) in terms.items()}
         for dt, terms in report.items()}, indent=2))
    return report


if __name__ == "__main__":
    main()
