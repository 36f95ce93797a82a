"""Standalone layer zoo: SE, DropBlock, EvoNorm, class-only DyHead.

TPU-native (NHWC flax) equivalents of the reference's python op wrappers
(layers/se.py, layers/dropblock.py, layers/evonorm.py, layers/dyhead.py —
the language-free DyHead used by non-VL configs).  The VL DyHead lives in
fiber_tpu.detection.dyhead; this module completes the registry surface.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (ref se.py:4-20)."""
    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x.mean(axis=(1, 2))                       # (B, C)
        y = nn.relu(nn.Dense(max(1, self.channels // self.reduction),
                             dtype=self.dtype, name="fc1")(y))
        y = jax.nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                    name="fc2")(y))
        return x * y[:, None, None, :]


class SEBlock(nn.Module):
    """SE residual block: 1x1 reduce -> 3x3 -> SE -> 1x1 expand + skip
    (ref se.py:22-60)."""
    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = self.channels // self.reduction
        y = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype,
                            name="conv1")(x))
        y = nn.relu(nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype,
                            name="conv2")(y))
        y = SELayer(channels=mid, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name="conv3")(y)
        return nn.relu(x + y)


class DropBlock2D(nn.Module):
    """Structured feature dropout (ref dropblock.py:6-78): drop
    block_size x block_size regions seeded by Bernoulli centers, rescale
    by kept fraction."""
    drop_prob: float
    block_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        if deterministic or self.drop_prob == 0.0:
            return x
        B, H, W, C = x.shape
        bs = self.block_size
        gamma = (self.drop_prob / bs ** 2) * (H * W) \
            / max((H - bs + 1) * (W - bs + 1), 1)
        rng = self.make_rng("dropout")
        centers = jax.random.bernoulli(
            rng, gamma, (B, H, W, C)).astype(jnp.float32)
        # expand each center into a block via max pooling
        block = nn.max_pool(centers, (bs, bs), strides=(1, 1),
                            padding="SAME")
        mask = 1.0 - block
        keep = jnp.maximum(mask.mean(), 1e-7)
        return x * mask.astype(x.dtype) / keep.astype(x.dtype)


class EvoNorm2d(nn.Module):
    """EvoNorm-S0 (ref evonorm.py): x*sigmoid(v*x)/group_std * w + b."""
    channels: int
    groups: int = 32
    eps: float = 1e-5
    nonlinearity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.channels,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.channels,),
                       jnp.float32)
        if not self.nonlinearity:
            return x * w.astype(x.dtype) + b.astype(x.dtype)
        v = self.param("v", nn.initializers.ones, (self.channels,),
                       jnp.float32)
        B, H, W, C = x.shape
        g = min(self.groups, C)
        xf = x.astype(jnp.float32)
        grouped = xf.reshape(B, H, W, g, C // g)
        # torch.std over (H, W) with Bessel correction (evonorm.py:33)
        n = H * W * (C // g)
        mean = grouped.mean(axis=(1, 2, 4), keepdims=True)
        var = ((grouped - mean) ** 2).sum(axis=(1, 2, 4),
                                          keepdims=True) / max(n - 1, 1)
        std = jnp.sqrt(var) + self.eps
        std = jnp.broadcast_to(std, grouped.shape).reshape(B, H, W, C)
        num = xf * jax.nn.sigmoid(v * xf)
        return (num / std * w + b).astype(x.dtype)


class PlainDyHead(nn.Module):
    """Language-free DyHead tower (ref layers/dyhead.py DyHead): the
    scale/spatial/task attention DyConv stack without VL fusion — reuses
    the detection stack's DyConv."""
    channels: int
    n_convs: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], *,
                 deterministic: bool = True) -> List[jax.Array]:
        from fiber_tpu.detection.dyhead import DyConv
        feats = list(features)
        for i in range(self.n_convs):
            in_ch = feats[0].shape[-1]
            feats = DyConv(in_channels=in_ch, out_channels=self.channels,
                           dtype=self.dtype, name=f"dyconv_{i}")(feats)
        return feats
