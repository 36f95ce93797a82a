"""Detection losses: sigmoid focal, token sigmoid focal, centerness BCE.

TPU-native replacements for the reference CUDA kernels
(csrc/cuda/SigmoidFocalLoss_cuda.cu, layers/sigmoid_focal_loss.py:11-199):
on TPU these are pure fused elementwise programs — XLA emits one VPU
kernel, so no Pallas needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits: jax.Array, class_targets: jax.Array,
                       num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25) -> jax.Array:
    """Class-indexed focal loss matching the CUDA kernel semantics
    (ref csrc: targets are 1-based class ids, 0 = background).

    logits: (N, C); class_targets: (N,) int in [0, C] (0 = background).
    Returns per-element loss (N, C).
    """
    logits = logits.astype(jnp.float32)
    t = class_targets[:, None]
    cls = jnp.arange(1, num_classes + 1)[None, :]
    pos = (t == cls).astype(jnp.float32)
    neg = ((t != cls) & (t >= 0)).astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    pos_term = -pos * alpha * ((1 - p) ** gamma) * jnp.log(
        jnp.clip(p, 1e-12))
    neg_term = -neg * (1 - alpha) * (p ** gamma) * jnp.log(
        jnp.clip(1 - p, 1e-12))
    return pos_term + neg_term


def token_sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                             text_mask: Optional[jax.Array] = None,
                             gamma: float = 2.0,
                             alpha: float = 0.25) -> jax.Array:
    """Binary token focal loss for dot-product grounding logits
    (ref layers/sigmoid_focal_loss.py:78-141 TokenSigmoidFocalLoss binary).

    logits/targets: (..., T) where T is the token dimension; targets are
    the 0/1 positive-map rows.  text_mask: (..., T) valid-token mask.
    Returns per-element loss.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if text_mask is not None:
        loss = loss * text_mask.astype(jnp.float32)
    return loss


def centerness_targets(reg_targets: jax.Array) -> jax.Array:
    """ATSS centerness from (l, t, r, b) regression targets
    (ref rpn/loss.py compute_centerness_targets)."""
    l, t, r, b = (reg_targets[..., 0], reg_targets[..., 1],
                  reg_targets[..., 2], reg_targets[..., 3])
    lr = jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-9)
    tb = jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-9)
    return jnp.sqrt(jnp.clip(lr * tb, 0))


def centerness_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return _bce_with_logits(logits.astype(jnp.float32),
                            targets.astype(jnp.float32))


def smooth_l1_loss(pred: jax.Array, target: jax.Array,
                   beta: float = 1.0 / 9) -> jax.Array:
    """(ref layers/smooth_l1_loss.py)"""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
