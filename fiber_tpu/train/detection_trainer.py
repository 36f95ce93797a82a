"""Detection training: solver + jit train step for the grounding detector.

Behavioral spec:
* solver/build.py:8-120 — AdamW with per-group LRs: language backbone at
  SOLVER.LANG_LR, bias params at BIAS_LR_FACTOR, weight-decay off for
  norm/bias; full-model grad clipping (CLIP_GRADIENTS).
* solver/lr_scheduler.py:11-94 — WarmupMultiStepLR (gamma decay at
  fractional milestones) and WarmupCosine with linear warmup from
  WARMUP_FACTOR.
* engine/trainer.py:46-370 — AMP loop (bf16 on TPU, no GradScaler
  needed), NaN-loss guard (zero the step instead of poisoning params,
  ref :140-164), EMA update (MODEL_EMA=0.999, ref :222-224).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fiber_tpu.detection.detector import (DetectorConfig, GroundingDetector,
                                          detection_loss)


@flax.struct.dataclass
class DetTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def warmup_multistep_schedule(base_lr: float, max_iter: int,
                              milestones: Sequence[float] = (0.67, 0.89),
                              gamma: float = 0.1,
                              warmup_iters: int = 2000,
                              warmup_factor: float = 0.001
                              ) -> optax.Schedule:
    """WarmupMultiStepLR (ref lr_scheduler.py:11-49): linear warmup from
    warmup_factor*lr, then step-decay by gamma at fractional milestones."""
    boundaries = [int(m * max_iter) if m <= 1 else int(m)
                  for m in milestones]

    def schedule(step):
        step = jnp.asarray(step)
        warm = jnp.minimum(step / jnp.maximum(warmup_iters, 1), 1.0)
        scale = warmup_factor * (1 - warm) + warm
        decay = jnp.ones_like(scale)
        for b in boundaries:
            decay = decay * jnp.where(step >= b, gamma, 1.0)
        return base_lr * scale * decay

    return schedule


class WarmupReduceLROnPlateau:
    """Host-side plateau scheduler (ref lr_scheduler.py:94-160,
    SOLVER.AUTO_TERMINATE_PATIENCE / autostep eval-during-training,
    engine/trainer.py:255-360): after warmup, decay the LR scale by
    `gamma` whenever the eval metric hasn't improved for `patience`
    evals.  The scale is passed into the jit train step as data."""

    def __init__(self, patience: int = 2, gamma: float = 0.1,
                 minimize: bool = False, max_decays: int = 4):
        self.patience = patience
        self.gamma = gamma
        self.minimize = minimize
        self.max_decays = max_decays
        self.best = None
        self.bad = 0
        self.decays = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        better = (self.best is None
                  or (metric < self.best if self.minimize
                      else metric > self.best))
        if better:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad >= self.patience and self.decays < self.max_decays:
                self.scale *= self.gamma
                self.decays += 1
                self.bad = 0
        return self.scale

    @property
    def exhausted(self) -> bool:
        return self.decays >= self.max_decays


def _det_param_group(path, _leaf) -> str:
    name = "/".join(str(getattr(k, "key", k)) for k in path)
    is_lang = "language_backbone" in name
    leaf_name = name.rsplit("/", 1)[-1]
    in_norm = any("norm" in part.lower() for part in name.split("/"))
    no_decay = (leaf_name == "bias") or (in_norm and leaf_name in
                                         ("scale", "bias"))
    grp = "lang" if is_lang else "base"
    return f"{grp}_{'nodecay' if no_decay else 'decay'}"


def make_detection_optimizer(cfg_lr: float, lang_lr: float,
                             weight_decay: float, max_iter: int,
                             params,
                             milestones: Sequence[float] = (0.67, 0.89),
                             warmup_iters: int = 2000,
                             warmup_factor: float = 0.001,
                             clip_norm: Optional[float] = 1.0
                             ) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(_det_param_group, params)

    def adamw(lr, wd):
        return optax.adamw(
            learning_rate=warmup_multistep_schedule(
                lr, max_iter, milestones, warmup_iters=warmup_iters,
                warmup_factor=warmup_factor),
            weight_decay=wd)

    tx = optax.multi_transform({
        "base_decay": adamw(cfg_lr, weight_decay),
        "base_nodecay": adamw(cfg_lr, 0.0),
        "lang_decay": adamw(lang_lr, weight_decay),
        "lang_nodecay": adamw(lang_lr, 0.0),
    }, labels)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


class DetectionTrainer:
    def __init__(self, cfg: DetectorConfig, base_lr: float = 1e-5,
                 lang_lr: float = 1e-5, weight_decay: float = 1e-4,
                 max_iter: int = 100000, ema_decay: Optional[float] = 0.999,
                 clip_norm: Optional[float] = None,
                 warmup_iters: int = 2000, mesh=None):
        self.cfg = cfg
        self.model = GroundingDetector(cfg)
        self.base_lr = base_lr
        self.lang_lr = lang_lr
        self.weight_decay = weight_decay
        self.max_iter = max_iter
        self.ema_decay = ema_decay
        self.clip_norm = clip_norm
        self.warmup_iters = warmup_iters
        self.mesh = mesh
        self._tx = None

    # -- multi-chip placement (ref trains fine-grained on 4x16 V100 DDP,
    # fine_grained/README.md:44): params/opt replicated, batch sharded
    # over the `data` mesh axis; the jit train step runs SPMD with XLA
    # inserting the grad all-reduces.
    def shard_state(self, state: DetTrainState) -> DetTrainState:
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state)

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        from fiber_tpu.parallel.mesh import DATA_AXIS
        out = {}
        for k, v in batch.items():
            spec = (P() if v.ndim == 0
                    else P(DATA_AXIS, *([None] * (v.ndim - 1))))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def init_state(self, rng: jax.Array) -> DetTrainState:
        c = self.cfg
        H, W = c.image_size
        img = jnp.zeros((1, H, W, 3), c.compute_dtype)
        ids = jnp.zeros((1, c.max_query_len), jnp.int32)
        msk = jnp.ones((1, c.max_query_len), jnp.int32)
        variables = self.model.init(rng, img, ids, msk)
        params = variables["params"]
        self._tx = make_detection_optimizer(
            self.base_lr, self.lang_lr, self.weight_decay, self.max_iter,
            params, clip_norm=self.clip_norm,
            warmup_iters=self.warmup_iters)
        return DetTrainState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=self._tx.init(params),
                             ema_params=jax.tree_util.tree_map(
                                 jnp.copy, params)
                             if self.ema_decay else None)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: DetTrainState, batch, rng,
                   lr_scale: jax.Array = jnp.float32(1.0)
                   ) -> Tuple[DetTrainState, Dict[str, jax.Array]]:
        return self._train_step_body(state, batch, rng, lr_scale)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_steps_scan(self, state: DetTrainState, batches, rng):
        """R chained steps in ONE program: `batches` carries a leading
        steps axis; params/opt-state live in the scan carry so nothing
        crosses the host between steps.  Same rationale as
        CoarseTrainer.train_steps_scan (trainer.py): the reference's fit
        loop dispatches one step per python iteration (tools/train_net.py
        -> trainer.py do_train), which on a tunneled runtime re-marshals
        the ~2000-leaf param tree every step; the scan form pays that
        once per R steps, which is how a production input pipeline
        (data/loader.py prefetch) actually feeds the chip.  Returns the
        final state and the per-step total-loss vector.  Pinned against
        sequential train_step in tests/test_detection_trainer.py."""
        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = self._train_step_body(st, batch, sub)
            return (st, r), metrics["total_loss"]

        (state, _), losses = jax.lax.scan(body, (state, rng), batches)
        return state, losses

    def _train_step_body(self, state: DetTrainState, batch, rng,
                         lr_scale: jax.Array = jnp.float32(1.0)
                         ) -> Tuple[DetTrainState, Dict[str, jax.Array]]:
        def loss_fn(params):
            losses = detection_loss(self.model, {"params": params}, batch,
                                    rngs={"dropout": rng}, train=True)
            return losses["total_loss"], losses

        (loss, metrics), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(
            state.params)
        # NaN guard (ref trainer.py:140-164): skip the update rather than
        # poisoning the params
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = self._tx.update(grads, state.opt_state,
                                           state.params)
        # plateau-autostep LR scale (data, not recompile)
        updates = jax.tree_util.tree_map(
            lambda u: u * lr_scale.astype(u.dtype), updates)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
        metrics = dict(metrics)
        metrics["finite"] = finite.astype(jnp.float32)
        return DetTrainState(step=state.step + 1, params=new_params,
                             opt_state=new_opt, ema_params=ema), metrics


class MultiScaleDetectionTrainer:
    """Multi-scale training over the loader's fixed bucket set.

    The reference resizes every batch to a random MULT_MIN_SIZE_TRAIN
    scale (transforms.py Resize); on TPU each bucket shape gets its own
    jit-compiled step (the flax model is rebuilt per bucket since block
    resolutions are static), all sharing ONE param/optimizer state —
    weights are shape-independent (convs/denses/window-relative biases).
    """

    def __init__(self, cfg: DetectorConfig, **trainer_kwargs):
        import dataclasses
        self.base_cfg = cfg
        self.trainer_kwargs = trainer_kwargs
        self._replace = dataclasses.replace
        self.primary = DetectionTrainer(cfg, **trainer_kwargs)
        self._trainers: Dict[Tuple[int, int], DetectionTrainer] = {
            tuple(cfg.image_size): self.primary}

    def init_state(self, rng: jax.Array) -> DetTrainState:
        return self.primary.init_state(rng)

    def trainer_for(self, image_size: Tuple[int, int]) -> "DetectionTrainer":
        key = tuple(int(s) for s in image_size)
        if key not in self._trainers:
            t = DetectionTrainer(
                self._replace(self.base_cfg, image_size=key),
                **self.trainer_kwargs)
            t._tx = self.primary._tx  # shared optimizer/schedule state
            self._trainers[key] = t
        return self._trainers[key]

    def train_step(self, state: DetTrainState, batch, rng,
                   lr_scale: jax.Array = jnp.float32(1.0)):
        t = self.trainer_for(batch["images"].shape[1:3])
        return t.train_step(state, batch, rng, lr_scale)
