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


class AttentionT2I(nn.Module):
    """Single-direction text->image attention with layer-scale residual
    (ref fuse_helper.py AttentionT2I, VLFuse TYPE="MHA-S"): image queries
    attend text K/V; only the visual stream is updated."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    init_gamma: float = 1.0 / 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v: jax.Array, l: jax.Array,
                 attention_mask_l: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        h = self.num_heads
        hd = self.embed_dim // h
        B, Nv = v.shape[0], v.shape[1]
        vn = nn.LayerNorm(dtype=self.dtype, name="layer_norm_q")(v)
        ln = nn.LayerNorm(dtype=self.dtype, name="layer_norm_k")(l)

        def proj(x, name):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=name)(x)
            return y.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)

        q = proj(vn, "q_proj") * (hd ** -0.5)
        k = proj(ln, "k_proj")
        val = proj(ln, "v_proj")
        attn = jnp.einsum("bhvd,bhld->bhvl", q, k,
                          preferred_element_type=jnp.float32)
        if attention_mask_l is not None:
            neg = (1.0 - attention_mask_l.astype(jnp.float32)) * -9e15
            attn = attn + neg[:, None, None, :]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout,
                          deterministic=deterministic)(attn)
        out = jnp.einsum("bhvl,bhld->bhvd", attn, val)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nv, self.embed_dim)
        out = nn.Dense(self.v_dim, dtype=self.dtype, name="out_proj")(out)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.init_gamma),
                           (self.v_dim,), jnp.float32)
        return v + gamma.astype(v.dtype) * out


def make_coord_features(B: int, H: int, W: int) -> jax.Array:
    """(B, H, W, 8) relative-position encoding
    (ref fuse_helper.py:92-134 _make_coord), NHWC."""
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    yv = jnp.broadcast_to(ys, (H, W))
    xv = jnp.broadcast_to(xs, (H, W))
    # the reference meshgrid swaps axes (xv indexes rows); preserved
    xv, yv = yv, xv
    xv_min = (xv * 2 - W) / W
    yv_min = (yv * 2 - H) / H
    xv_max = ((xv + 1) * 2 - W) / W
    yv_max = ((yv + 1) * 2 - H) / H
    feats = jnp.stack([
        xv_min, yv_min, xv_max, yv_max,
        (xv_min + xv_max) / 2, (yv_min + yv_max) / 2,
        jnp.full((H, W), 1.0 / H), jnp.full((H, W), 1.0 / W)], axis=-1)
    return jnp.broadcast_to(feats[None], (B, H, W, 8))


class ScanFuse(nn.Module):
    """SCAN-style fusion (ref VLFuse TYPE="SCAN" + fuse_helper
    func_attention): each pixel soft-attends the projected text tokens,
    the attended text vector is fused by a per-level 1x1 conv."""

    l_dim: int = 768
    joint_emb: int = 256
    joint_out: int = 256
    num_levels: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: Sequence[jax.Array], lang: Dict[str, Any],
                 *, deterministic: bool = True):
        text = lang["hidden"]
        mask = lang.get("masks")
        text = nn.Dense(self.joint_emb, dtype=self.dtype,
                        name="mapping_lang")(text)    # (B, T, E)
        outs = []
        for i, feat in enumerate(visual):
            B, H, W, C = feat.shape
            q = nn.Dense(self.joint_emb, dtype=self.dtype,
                         name=f"query_proj_{i}")(
                feat.reshape(B, H * W, C))
            attn = jnp.einsum("bqc,btc->bqt", q, text,
                              preferred_element_type=jnp.float32)
            if mask is not None:
                attn = attn + (1.0 - mask.astype(jnp.float32)
                               )[:, None, :] * -9e15
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            att_text = jnp.einsum("bqt,bte->bqe", attn, text)
            joint = jnp.concatenate(
                [feat, att_text.reshape(B, H, W, self.joint_emb)], -1)
            outs.append(nn.relu(nn.Conv(self.joint_out, (1, 1),
                                        dtype=self.dtype,
                                        name=f"joint_fusion_{i}")(joint)))
        return outs, lang


class FilmFuse(nn.Module):
    """FiLM conditioning (ref VLFuse TYPE="FILM"): per-level tanh
    gamma/beta from the aggregate text feature modulate
    [feat, coord] channels, then a 1x1 conv."""

    l_dim: int = 768
    joint_emb: int = 256
    joint_out: int = 256
    num_levels: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: Sequence[jax.Array], lang: Dict[str, Any],
                 *, deterministic: bool = True):
        agg = lang.get("aggregate")
        if agg is None:  # masked mean over tokens
            m = lang["masks"].astype(jnp.float32)[..., None]
            agg = (lang["hidden"] * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        agg = nn.relu(nn.Dense(self.joint_emb, dtype=self.dtype,
                               name="mapping_lang")(agg))   # (B, E)
        outs = []
        for i, feat in enumerate(visual):
            B, H, W, C = feat.shape
            joint = jnp.concatenate(
                [feat, make_coord_features(B, H, W).astype(feat.dtype)],
                axis=-1)
            g = jnp.tanh(nn.Dense(joint.shape[-1], dtype=self.dtype,
                                  name=f"gamma_{i}")(agg))
            b = jnp.tanh(nn.Dense(joint.shape[-1], dtype=self.dtype,
                                  name=f"beta_{i}")(agg))
            mod = nn.relu(g[:, None, None, :] * joint
                          + b[:, None, None, :])
            outs.append(nn.relu(nn.Conv(self.joint_out, (1, 1),
                                        dtype=self.dtype,
                                        name=f"joint_fusion_{i}")(mod)))
        return outs, lang


class VLFuse(nn.Module):
    """Cross-modality fusion over all FPN levels (ref vldyhead.py:367-585).

    fuse_type selects the reference's FUSE_CONFIG.TYPE registry:
    MHA-B (bidirectional, default), MHA-S (text->image only),
    SCAN, FILM, NONE."""

    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    fuse_type: str = "MHA-B"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, visual: Sequence[jax.Array], lang: Dict[str, Any],
                 *, deterministic: bool = True):
        kind = self.fuse_type.upper()
        if kind == "NONE":
            return list(visual), lang
        if kind in ("SCAN", "FILM"):
            mod = (ScanFuse if kind == "SCAN" else FilmFuse)(
                l_dim=self.l_dim, joint_out=self.v_dim,
                num_levels=len(visual), dtype=self.dtype,
                name=kind.lower())
            return mod(visual, lang, deterministic=deterministic)

        shapes = [f.shape for f in visual]
        flat = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in visual],
            axis=1)
        if kind == "MHA-S":
            v = AttentionT2I(
                v_dim=self.v_dim, l_dim=self.l_dim,
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="t2i_attn")(
                flat, lang["hidden"], lang.get("masks"),
                deterministic=deterministic)
            l = lang["hidden"]
        elif kind == "MHA-B":
            v, l = BiAttentionBlock(
                v_dim=self.v_dim, l_dim=self.l_dim,
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="b_attn")(
                flat, lang["hidden"], lang.get("masks"),
                deterministic=deterministic)
        else:
            raise ValueError(f"unknown fuse_type {self.fuse_type!r}")
        outs = []
        start = 0
        for (B, H, W, C) in shapes:
            outs.append(v[:, start:start + H * W].reshape(B, H, W, C))
            start += H * W
        new_lang = dict(lang)
        new_lang["hidden"] = l
        return outs, new_lang
