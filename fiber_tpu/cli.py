"""Training / evaluation CLI (the reference's `run.py with <task> k=v`,
Sacred-style, as plain argparse).

Examples:
  python run.py --task pretrain_mlm_itm_itc --steps 100 \
      --data synthetic --per-device-batch 8
  python run.py --task finetune_irtr_itm_itc --eval-retrieval \
      --load /path/ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.config import TASK_PRESETS, FiberConfig
from fiber_tpu.parallel.mesh import create_mesh
from fiber_tpu.train.checkpoint import CheckpointManager
from fiber_tpu.train.trainer import CoarseTrainer


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def synthetic_batches(cfg: FiberConfig, batch_size: int,
                      seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Random data matching the pretraining batch schema — for smoke runs
    and throughput measurement without a dataset."""
    rng = np.random.default_rng(seed)
    L = cfg.max_text_len
    while True:
        ids = rng.integers(5, cfg.vocab_size, (batch_size, L)).astype(
            np.int32)
        ids[:, 0] = 0
        masks = np.ones_like(ids)
        labels = np.full_like(ids, -100)
        sel = rng.random((batch_size, L)) < 0.15
        labels[sel] = ids[sel]
        mlm_ids = ids.copy()
        mlm_ids[sel] = 4
        yield {
            "image": rng.standard_normal(
                (batch_size, cfg.image_size, cfg.image_size, 3)
            ).astype(np.float32),
            "text_ids": ids, "text_masks": masks,
            "text_ids_mlm": mlm_ids, "text_labels_mlm": labels,
        }


def arrow_batches(cfg: FiberConfig, paths, batch_size: int,
                  tokenizer=None, seed: int = 0,
                  device_preprocess: bool = False,
                  staging_size: int = 0):
    """Batches from reference-format .arrow files.

    With device_preprocess=True the host only decodes to uint8 staging
    buffers ("image_staged" (B, S0, S0, 3) uint8 + "image_sizes" (B, 2));
    all geometric work (RandomResizedCrop/flip/RandAugment/normalize)
    runs inside the jit program (data/device_transforms.py) — the single
    host core cannot keep the chip fed doing PIL bicubic at 384^2
    (tools/bench_input.py measures both paths)."""
    from fiber_tpu.data.arrow_dataset import (ArrowCaptionDataset,
                                              ShardedBatchIterator)
    from fiber_tpu.data.mlm import mlm_mask
    from fiber_tpu.data.tokenizer import WhitespaceTokenizer, load_tokenizer
    if tokenizer is None:
        try:
            tokenizer = load_tokenizer("roberta-base")
        except Exception:
            tokenizer = WhitespaceTokenizer()
    ds = ArrowCaptionDataset(paths)
    it = ShardedBatchIterator(len(ds), batch_size,
                              host_id=jax.process_index(),
                              num_hosts=jax.process_count(), seed=seed)
    rng = np.random.default_rng(seed)
    staging = staging_size or (cfg.image_size * 3) // 2
    for idx in it:
        if device_preprocess:
            staged, sizes = zip(*(ds.stage_image(i, staging)
                                  for i in idx))
            img_fields = {"image_staged": np.stack(staged),
                          "image_sizes": np.stack(sizes)}
        else:
            images = np.stack([ds.get_image(i, cfg.image_size, train=True,
                                            rng=rng) for i in idx])
            images = ((images.astype(np.float32) / 255.0
                       - np.array([0.485, 0.456, 0.406], np.float32))
                      / np.array([0.229, 0.224, 0.225], np.float32))
            img_fields = {"image": images}
        caps = [ds.get_caption(i) for i in idx]
        if hasattr(tokenizer, "batch"):
            enc = tokenizer.batch(caps, max_length=cfg.max_text_len)
        else:
            enc = tokenizer(caps, max_length=cfg.max_text_len,
                            padding="max_length", truncation=True,
                            return_tensors="np")
        ids = np.asarray(enc["input_ids"], np.int32)
        masks = np.asarray(enc["attention_mask"], np.int32)
        special = (ids == getattr(tokenizer, "bos_token_id", 0)) | \
                  (ids == getattr(tokenizer, "eos_token_id", 2)) | \
                  (masks == 0)
        mlm_ids, labels = mlm_mask(
            ids, special, cfg.vocab_size,
            getattr(tokenizer, "mask_token_id", 4), rng)
        yield {**img_fields, "text_ids": ids, "text_masks": masks,
               "text_ids_mlm": mlm_ids.astype(np.int32),
               "text_labels_mlm": labels.astype(np.int32)}


def train(args) -> Dict[str, float]:
    overrides = _parse_overrides(args.set)
    cfg = TASK_PRESETS[args.task](**overrides)
    if args.steps:
        cfg = cfg.replace(max_steps=args.steps)
    if args.tiny:
        cfg = FiberConfig.tiny_test(loss_names=cfg.loss_names,
                                    max_steps=cfg.max_steps)

    mesh = create_mesh()
    trainer = CoarseTrainer(cfg, mesh=mesh, ema_decay=args.ema)
    state = trainer.shard_state(trainer.init_state(
        jax.random.PRNGKey(args.seed)))

    ckpt = None
    if args.output_dir:
        ckpt = CheckpointManager(args.output_dir,
                                 best_metric_name="the_metric")
        if args.resume and ckpt.latest_step() is not None:
            state = ckpt.restore(jax.tree_util.tree_map(
                ocp_abstract, state))
            print(f"resumed from step {int(state.step)}")

    n_dev = mesh.devices.size
    global_batch = args.per_device_batch * n_dev
    device_pp = args.data != "synthetic" and not args.host_transforms
    if args.data == "synthetic":
        batches = synthetic_batches(cfg, global_batch, args.seed)
    else:
        batches = arrow_batches(cfg, args.data.split(","), global_batch,
                                seed=args.seed,
                                device_preprocess=device_pp)
    if device_pp:
        from fiber_tpu.data.device_transforms import \
            device_train_preprocess

        def finish_batch(batch, key):
            staged = batch.pop("image_staged")
            sizes = batch.pop("image_sizes")
            batch["image"] = device_train_preprocess(
                staged, sizes, key, cfg.image_size,
                dtype_name=jnp.dtype(cfg.compute_dtype).name)
            return batch

    rng = jax.random.PRNGKey(args.seed + 1)
    metrics = {}
    t0 = time.time()
    from fiber_tpu.utils.nan_debug import NanDumper
    nan_dumper = NanDumper(getattr(args, "nan_dump_dir", None)
                           or (args.output_dir and
                               os.path.join(args.output_dir, "nan_dumps")))
    for step in range(int(state.step), cfg.max_steps):
        batch = trainer.shard_batch(next(batches))
        rng, sub = jax.random.split(rng)
        if device_pp:
            sub, pp_key = jax.random.split(sub)
            batch = finish_batch(batch, pp_key)
        state, metrics = trainer.train_step(state, batch, sub)
        loss = float(metrics["total_loss"])
        # train_step zeroes non-finite grads (ref trainer.py:162-164), so
        # post-step params differ from the offending forward only by the
        # decoupled weight-decay step — valid for replay.
        nan_dumper.check(step, loss, batch, state.params, metrics)
        if step % args.log_every == 0 or step == cfg.max_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            print(f"step {step} " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())) +
                  f" ({global_batch * (step + 1) / max(dt, 1e-6):.1f} ex/s)")
        if ckpt and args.ckpt_every and (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
    if ckpt:
        ckpt.save(cfg.max_steps, jax.device_get(state))
    return {k: float(v) for k, v in metrics.items()}


def ocp_abstract(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default="pretrain_mlm_itm_itc",
                   choices=sorted(TASK_PRESETS))
    p.add_argument("--set", nargs="*", metavar="KEY=VALUE",
                   help="FiberConfig overrides")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or comma-separated .arrow paths")
    p.add_argument("--per-device-batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", type=float, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model for smoke tests")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--host-transforms", action="store_true",
                   help="PIL geometric transforms on the host instead of "
                        "the on-device XLA pipeline (arrow data only)")
    p.add_argument("--nan-dump-dir", default=None,
                   help="dump batch+params here on a non-finite loss "
                        "(default: <output-dir>/nan_dumps)")
    args = p.parse_args(argv)
    from fiber_tpu.parallel.multihost import maybe_initialize_distributed
    if maybe_initialize_distributed():
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices")
    return train(args)


if __name__ == "__main__":
    main()
