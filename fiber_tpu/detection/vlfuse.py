"""GLIP-style early fusion in the detection head (VLFuse).

Behavioral spec: modeling/rpn/vldyhead.py:367-585 (VLFuse) and
utils/fuse_helper.py:185-470 (BiMultiHeadAttention / BiAttentionBlock).
FIBER's shipped configs set FUSE_CONFIG.TYPE="NONE" (fusion lives in the
backbone), but the MHA-B path is part of the framework's surface for
GLIP-style configs: a single joint attention-weight matrix between all
flattened FPN image tokens and text tokens, softmaxed both ways
(image->text and text->image), with layer-scale gammas on the residuals.

The fp16 stable-softmax/±50000 clamps of the reference are unnecessary in
bf16/fp32 on TPU (softmax runs in fp32 here); the masking semantics are
preserved.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BiMultiHeadAttention(nn.Module):
    """Joint bidirectional cross attention (ref fuse_helper.py:185-321):
    one QK^T between image and text, row-softmax for image->text and
    column-softmax for text->image."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v: jax.Array, l: jax.Array,
                 attention_mask_l: Optional[jax.Array] = None, *,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        h = self.num_heads
        hd = self.embed_dim // h
        scale = hd ** -0.5
        B, Nv = v.shape[0], v.shape[1]
        Nl = l.shape[1]

        def proj(x, feats, name):
            y = nn.Dense(feats, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=name)(x)
            return y.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)

        q = proj(v, self.embed_dim, "v_proj") * scale       # (B,h,Nv,hd)
        k = proj(l, self.embed_dim, "l_proj")               # (B,h,Nl,hd)
        val_v = proj(v, self.embed_dim, "values_v_proj")
        val_l = proj(l, self.embed_dim, "values_l_proj")

        attn = jnp.einsum("bhvd,bhld->bhvl", q, k,
                          preferred_element_type=jnp.float32)

        # text->image: softmax over image tokens (columns)
        attn_l = jax.nn.softmax(attn.transpose(0, 1, 3, 2), axis=-1)
        # image->text: mask padded text, softmax over text tokens
        if attention_mask_l is not None:
            neg = (1.0 - attention_mask_l.astype(jnp.float32)) * -9e15
            attn = attn + neg[:, None, None, :]
        attn_v = jax.nn.softmax(attn, axis=-1)

        attn_v = nn.Dropout(self.dropout, deterministic=deterministic)(
            attn_v.astype(self.dtype))
        attn_l = nn.Dropout(self.dropout, deterministic=deterministic)(
            attn_l.astype(self.dtype))

        out_v = jnp.einsum("bhvl,bhld->bhvd", attn_v, val_l)
        out_l = jnp.einsum("bhlv,bhvd->bhld", attn_l, val_v)
        out_v = out_v.transpose(0, 2, 1, 3).reshape(B, Nv, self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(B, Nl, self.embed_dim)
        out_v = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(
            out_v)
        out_l = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(
            out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """LN + BiMHA + layer-scale residuals (ref fuse_helper.py:325-470)."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    init_gamma: float = 1.0 / 8  # ref USE_LAYER_SCALE init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, attention_mask_l=None, *,
                 deterministic: bool = True):
        vn = nn.LayerNorm(dtype=self.dtype, name="layer_norm_v")(v)
        ln = nn.LayerNorm(dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="attn")(
            vn, ln, attention_mask_l, deterministic=deterministic)
        gamma_v = self.param("gamma_v",
                             nn.initializers.constant(self.init_gamma),
                             (self.v_dim,), jnp.float32)
        gamma_l = self.param("gamma_l",
                             nn.initializers.constant(self.init_gamma),
                             (self.l_dim,), jnp.float32)
        v = v + gamma_v.astype(v.dtype) * dv
        l = l + gamma_l.astype(l.dtype) * dl
        return v, l


class VLFuse(nn.Module):
    """Cross-modality fusion over all FPN levels (ref vldyhead.py:367-585,
    TYPE="MHA-B"): flatten the 5 levels into one image-token sequence,
    run one BiAttentionBlock, scatter back."""

    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: Sequence[jax.Array], lang: Dict[str, Any],
                 *, deterministic: bool = True):
        shapes = [f.shape for f in visual]
        flat = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in visual],
            axis=1)
        v, l = BiAttentionBlock(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dtype=self.dtype, name="b_attn")(
            flat, lang["hidden"], lang.get("masks"),
            deterministic=deterministic)
        outs = []
        start = 0
        for (B, H, W, C) in shapes:
            outs.append(v[:, start:start + H * W].reshape(B, H, W, C))
            start += H * W
        new_lang = dict(lang)
        new_lang["hidden"] = l
        return outs, new_lang
