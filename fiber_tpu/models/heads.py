"""Task heads (ref: coarse_grained/fiber/modules/heads.py:8-43)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.models.layers import bert_normal_init

Dtype = Any


class Pooler(nn.Module):
    """First-token pooler: dense + tanh (ref: heads.py:8-19)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, D) -> (B, D)
        first = x[:, 0]
        out = nn.Dense(self.hidden_size, dtype=self.dtype,
                       kernel_init=bert_normal_init, name="dense")(first)
        return jnp.tanh(out)


class ITMHead(nn.Module):
    """Binary image-text-match head (ref: heads.py:21-29)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, 2D) -> (B, 2)
        return nn.Dense(2, dtype=self.dtype, kernel_init=bert_normal_init,
                        name="fc")(x)


class MLMHead(nn.Module):
    """BERT MLM head: transform (dense+gelu+LN) + vocab decoder
    (ref: heads.py:31-43)."""

    hidden_size: int
    vocab_size: int
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, D) -> (B, L, V)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=bert_normal_init, name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="transform_ln")(x)
        x = nn.Dense(self.vocab_size, dtype=self.dtype,
                     kernel_init=bert_normal_init, name="decoder")(x)
        return x


class MLPClassifier(nn.Module):
    """dense -> LN -> GELU -> dense, used for VQA / NLVR2 heads
    (ref: fiber_module.py:151-166)."""

    hidden_dim: int
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=bert_normal_init, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     kernel_init=bert_normal_init, name="fc2")(x)
        return x
