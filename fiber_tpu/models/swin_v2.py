"""Swin-v2 detection trunk: overlapping conv embeddings + layer-scale.

Behavioral spec: fine_grained/maskrcnn_benchmark/modeling/backbone/
swint_v2.py — the "v2" of this codebase differs from v1 by (a) an
overlapping ConvEmbed stem (7x7 stride 4 pad 2) and conv downsamples
(3x3 stride 2 pad 1) instead of patchify/PatchMerging
(swint_v2.py:472-506, 377-382), (b) optional per-block layer-scale gammas
(swint_v2.py:210-214, 265-268), (c) per-output-stage LayerNorms
(out_norm, swint_v2.py:636-646).  Window attention itself is unchanged,
so the blocks reuse the coarse stack's WindowAttention (incl. the Pallas
fused kernel on TPU).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.models.layers import DropPath, Mlp, trunc_normal_init
from fiber_tpu.models.swin import (WindowAttention, shifted_window_mask,
                                   window_partition, window_reverse)

Dtype = jnp.dtype


class ConvEmbed(nn.Module):
    """Overlapping conv patch embedding + optional LN (NHWC),
    ref swint_v2.py:472-506."""
    embed_dim: int
    patch_size: int = 7
    stride: int = 4
    padding: int = 2
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=self.padding, dtype=self.dtype, name="proj")(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm")(x)
        return x


class SwinV2Block(nn.Module):
    """Swin block with static pad-to-window and optional layer-scale."""
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        H, W = self.input_resolution
        shift = self.shift_size
        if max(H, W) <= self.window_size:
            shift = 0  # single padded window: shift is a no-op
        self.window, self.shift = self.window_size, shift
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = WindowAttention(
            dim=self.dim, window=self.window, num_heads=self.num_heads,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            use_pallas=self.use_pallas, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                       out_features=self.dim, drop_rate=self.drop,
                       dtype=self.dtype)
        self.drop_path_mod = DropPath(self.drop_path)
        if self.layer_scale:
            self.gamma = self.param("gamma",
                                    nn.initializers.constant(1e-4),
                                    (self.dim,), jnp.float32)

    def _scale(self, x: jax.Array) -> jax.Array:
        if self.layer_scale:
            return x * self.gamma.astype(x.dtype)
        return x

    def __call__(self, x: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        H, W = self.input_resolution
        shortcut = x
        x = self.norm1(x)
        Hp = -(-H // self.window) * self.window
        Wp = -(-W // self.window) * self.window
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if self.shift > 0:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, self.window,
                                                   self.shift))
        else:
            mask = None
        xw = window_partition(x, self.window)
        xw = self.attn(xw, shift_mask=mask, deterministic=deterministic)
        x = window_reverse(xw, self.window, Hp, Wp)
        if self.shift > 0:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))
        if (Hp, Wp) != (H, W):
            x = x[:, :H, :W]
        x = shortcut + self.drop_path_mod(self._scale(x),
                                          deterministic=deterministic)
        x = x + self.drop_path_mod(
            self._scale(self.mlp(self.norm2(x),
                                 deterministic=deterministic)),
            deterministic=deterministic)
        return x


class SwinV2Backbone(nn.Module):
    """4-stage Swin-v2 trunk emitting multi-scale NHWC features
    (strides 4/8/16/32), ref swint_v2.py:507-718."""
    image_size: Tuple[int, int]
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    layer_scale: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    out_norm: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        H, W = self.image_size
        self.patch_embed = ConvEmbed(embed_dim=self.embed_dim,
                                     patch_size=7, stride=4, padding=2,
                                     dtype=self.dtype)
        dpr = [float(x) for x in
               jnp.linspace(0, self.drop_path_rate, sum(self.depths))]
        stages = []
        downs = []
        res = (H // 4, W // 4)
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            blocks = [
                SwinV2Block(
                    dim=dim, input_resolution=res,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                    drop_path=dpr[sum(self.depths[:i]) + b],
                    layer_scale=self.layer_scale,
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name=f"stage{i}_block{b}")
                for b in range(depth)
            ]
            stages.append(blocks)
            if i < len(self.depths) - 1:
                downs.append(ConvEmbed(embed_dim=dim * 2, patch_size=3,
                                       stride=2, padding=1,
                                       dtype=self.dtype,
                                       name=f"downsample{i}"))
            res = (-(-res[0] // 2), -(-res[1] // 2))
        self.stages = stages
        self.downsamples = downs
        if self.out_norm:
            self.out_norms = {
                str(i): nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f"out_norm{i}")
                for i in self.out_indices
            }

    def __call__(self, img: jax.Array, *,
                 deterministic: bool = True) -> List[jax.Array]:
        x = self.patch_embed(img)
        outs = []
        for i, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x, deterministic=deterministic)
            if i in self.out_indices:
                out = x
                if self.out_norm:
                    out = self.out_norms[str(i)](out)
                outs.append(out)
            if i < len(self.stages) - 1:
                x = self.downsamples[i](x)
        return outs
