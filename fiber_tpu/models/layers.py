"""Shared flax building blocks (MLP, stochastic depth, init helpers)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# timm-style truncated-normal init used by the reference Swin
# (ref: swin_transformer.py:183,601 trunc_normal_(std=.02)).
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
# BERT-style normal init used by reference heads (objectives.init_weights).
bert_normal_init = nn.initializers.normal(stddev=0.02)


class Mlp(nn.Module):
    """Transformer MLP: dense -> GELU -> dense (+ optional dropout)."""

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc1")(x)
        # Reference uses erf-based GELU (torch nn.GELU default).
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32))
        return out.astype(orig_dtype if self.dtype is None else self.dtype)


def dense(features: int, dtype, name: str, kernel_init: Callable = bert_normal_init,
          use_bias: bool = True) -> nn.Dense:
    return nn.Dense(features, dtype=dtype, name=name, kernel_init=kernel_init,
                    use_bias=use_bias)
