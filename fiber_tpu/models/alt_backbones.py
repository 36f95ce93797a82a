"""Alternative backbones (reference registry parity).

* BertTextEncoder — plain BERT encoder (ref language_backbone/bert_model.py):
  structurally the RoBERTa stack with 0-based positions and no pad offset.
* ClipTextEncoder — CLIP text tower (ref language_backbone/clip_model.py):
  pre-LN causal transformer, learned positions, EOT-token pooling.
* ResNetBackbone — ResNet-50/101 with frozen BatchNorm
  (ref modeling/backbone/resnet.py: FrozenBN semantics = affine-only
  normalization with baked statistics) producing C2..C5 FPN taps.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.models.roberta import RobertaLayer, extended_attention_mask

Dtype = Any


class BertTextEncoder(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    drop: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, *,
                 deterministic: bool = True):
        L = input_ids.shape[1]
        pos = jnp.arange(L)[None, :]
        x = (nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
             + nn.Embed(self.max_position_embeddings, self.hidden_size,
                        dtype=self.dtype, name="position_embeddings")(pos)
             + nn.Embed(self.type_vocab_size, self.hidden_size,
                        dtype=self.dtype, name="token_type_embeddings")(
                 jnp.zeros_like(input_ids)))
        x = nn.LayerNorm(dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        mask = extended_attention_mask(attention_mask, self.dtype)
        for i in range(self.num_layers):
            x = RobertaLayer(hidden_size=self.hidden_size,
                             num_heads=self.num_heads,
                             intermediate_size=self.hidden_size * 4,
                             attn_drop=self.drop, hidden_drop=self.drop,
                             dtype=self.dtype, name=f"layer_{i}")(
                x, attn_mask=mask, deterministic=deterministic)
        return x


class ClipTextEncoder(nn.Module):
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    context_length: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, deterministic: bool = True):
        B, L = input_ids.shape
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width), jnp.float32)
        x = x + pos[:L].astype(x.dtype)
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
        h = self.num_heads
        hd = self.width // h
        for i in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * self.width, dtype=self.dtype,
                           name=f"qkv_{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
            a = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            a = a * hd ** -0.5 + causal[None, None]
            a = jax.nn.softmax(a, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, L, self.width)
            x = x + nn.Dense(self.width, dtype=self.dtype,
                             name=f"attn_out_{i}")(o)
            y = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            y = nn.Dense(4 * self.width, dtype=self.dtype,
                         name=f"mlp_fc_{i}")(y)
            y = y * jax.nn.sigmoid(1.702 * y)  # quick-gelu
            x = x + nn.Dense(self.width, dtype=self.dtype,
                             name=f"mlp_proj_{i}")(y)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)  # EOT has the max token id
        pooled = x[jnp.arange(B), eot]
        return {"hidden": x, "aggregate": pooled}


class FrozenBatchNorm(nn.Module):
    """Affine-only normalization with baked statistics
    (ref layers/batch_norm.py FrozenBatchNorm2d)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        return x * inv + (bias - mean * scale
                          / jnp.sqrt(var + 1e-5)).astype(x.dtype)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if residual.shape[-1] != y.shape[-1] or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.features * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet-50/101 trunk -> [C2, C3, C4, C5] NHWC taps."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)  # 50; (3,4,23,3) = 101
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(FrozenBatchNorm(64, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        feats = 64
        for s, depth in enumerate(self.layers):
            for b in range(depth):
                x = Bottleneck(features=feats,
                               stride=2 if (b == 0 and s > 0) else 1,
                               dtype=self.dtype,
                               name=f"layer{s + 1}_block{b}")(x)
            outs.append(x)
            feats *= 2
        return outs
