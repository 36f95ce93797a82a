"""Optimizer with FIBER's 6-way param grouping + warmup schedules.

Behavioral spec: coarse_grained/fiber/modules/fiber_utils.py:156-287.
Groups = {decay, no_decay} x {base, head(xlr_mult_head),
cross_modal(xlr_mult_cross_modal)}; AdamW betas (0.9, 0.98) eps 1e-8;
polynomial (power=decay_power, default linear) or cosine decay with linear
warmup.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from fiber_tpu.config import FiberConfig

HEAD_NAMES = ("vqa_classifier", "nlvr2_classifier", "mlm_score", "itm_score")
CROSS_MODAL_NAMES = ("cross_modal", "i2t", "t2i")
# flax LayerNorm params are {scale, bias}; reference no-decays *.bias and all
# norm weights (fiber_utils.py:160-170).
NORM_MODULE_HINTS = ("norm", "LayerNorm", "ln", "layer_norm")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_group(path, _leaf) -> str:
    name = _path_str(path)
    is_head = any(h in name for h in HEAD_NAMES)
    is_cross = any(c in name for c in CROSS_MODAL_NAMES)
    leaf_name = name.rsplit("/", 1)[-1]
    in_norm = any(h in part.lower() for part in name.split("/")
                  for h in ("norm",))
    no_decay = (leaf_name == "bias") or (in_norm and leaf_name in
                                         ("scale", "bias"))
    if is_head and not is_cross:
        grp = "head"
    elif is_cross and not is_head:
        grp = "cross"
    else:
        grp = "base"
    return f"{grp}_{'nodecay' if no_decay else 'decay'}"


def make_lr_schedule(cfg: FiberConfig, base_lr: float) -> optax.Schedule:
    warmup = cfg.warmup_steps
    if isinstance(warmup, float) and warmup < 1:
        warmup = int(cfg.max_steps * warmup)
    warmup = int(warmup)
    decay_steps = max(cfg.max_steps - warmup, 1)
    if cfg.decay_power == "cosine":
        decay = optax.cosine_decay_schedule(base_lr, decay_steps)
    else:
        decay = optax.polynomial_schedule(
            init_value=base_lr, end_value=cfg.end_lr,
            power=float(cfg.decay_power), transition_steps=decay_steps)
    warmup_fn = optax.linear_schedule(0.0, base_lr, max(warmup, 1))
    return optax.join_schedules([warmup_fn, decay], [warmup])


def make_optimizer(cfg: FiberConfig, params) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(param_group, params)

    def adamw(mult: float, wd: float):
        return optax.adamw(
            learning_rate=make_lr_schedule(cfg, cfg.learning_rate * mult),
            b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps,
            weight_decay=wd)

    transforms = {
        "base_decay": adamw(1.0, cfg.weight_decay),
        "base_nodecay": adamw(1.0, 0.0),
        "head_decay": adamw(cfg.lr_mult_head, cfg.weight_decay),
        "head_nodecay": adamw(cfg.lr_mult_head, 0.0),
        "cross_decay": adamw(cfg.lr_mult_cross_modal, cfg.weight_decay),
        "cross_nodecay": adamw(cfg.lr_mult_cross_modal, 0.0),
    }
    return optax.multi_transform(transforms, labels)


def summarize_groups(params) -> Dict[str, int]:
    """Debug helper: param count per optimizer group."""
    counts: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        g = param_group(path, leaf)
        counts[g] = counts.get(g, 0) + leaf.size
    return counts
