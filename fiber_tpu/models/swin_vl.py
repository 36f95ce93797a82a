"""Language-aware Swin backbones (GLIP "swint_vl" / "swint_v2_vl"), in flax.

Behavioral spec: fine_grained/maskrcnn_benchmark/modeling/backbone/
swint_vl.py (joint windowed image<->text attention in the LAST stage:
text tokens contribute extra key/value columns to every window's
attention, and a text->image+text attention updates the language hidden
states, with learned i2t (2, nH, ntext) and t2t (nH, ntext, ntext)
position biases — swint_vl.py:124-232) and swint_v2_vl.py (the same
joint attention on the v2 trunk: overlapping ConvEmbed patch embedding
and conv downsampling, swint_v2_vl.py:592-640).

TPU-first redesign notes:
* Windows stay a separate tensor axis (B, nW, N, C); text K/V broadcast
  over it inside einsums instead of the reference's
  ``torch.repeat_interleave(k_text, nW, dim=0)`` (swint_vl.py:278) —
  no nW-fold HBM duplication.
* The text length is static (= MAX_QUERY_LEN), so the joint attention
  (N + ntext keys) is a single fixed-shape softmax XLA fuses.
* Softmax accumulates in fp32 under a bf16 compute policy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.models.layers import DropPath, Mlp, trunc_normal_init
from fiber_tpu.models.swin import (PatchEmbed, PatchMerging, SwinBlock,
                                   relative_position_index,
                                   shifted_window_mask, window_partition,
                                   window_reverse)
from fiber_tpu.models.swin_v2 import ConvEmbed, SwinV2Block

Dtype = Any

NEG_INF = -1e30  # additive key mask; finite to stay NaN-free on TPU


class JointWindowAttention(nn.Module):
    """W-MSA where text tokens join every window's attention.

    Image side (ref swint_vl.py:137-204): per-window QK^T + relative
    position bias (+ shift mask) gets ntext extra columns
    ``q @ k_text^T + i2t_bias[0] + text_mask``; one softmax over the
    N + ntext keys; values are ``[v, v_text]``.

    Text side (ref swint_vl.py:205-229): text queries attend to ALL
    image tokens of the map (every window) plus the text tokens:
    ``[q_text @ k_all^T + i2t_bias[1], q_text @ k_text^T + t2t_bias
    + text_mask]`` -> softmax -> ``[v_all, v_text]`` -> proj_text.
    """

    dim: int
    window: int
    num_heads: int
    ntext: int
    dim_text: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 shift_mask: Optional[jax.Array],
                 text: jax.Array,
                 text_mask_add: Optional[jax.Array],
                 *, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        """x (B, nW, N, C) windows; text (B, Lt, C_text);
        text_mask_add (B, Lt) additive 0/NEG_INF or None.
        Returns (windows out (B, nW, N, C), text out (B, Lt, C_text))."""
        B, nW, N, C = x.shape
        h, hd = self.num_heads, C // self.num_heads
        Lt = text.shape[1]
        scale = hd ** -0.5

        qkv = nn.Dense(3 * C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="qkv")(x)
        qkv = qkv.reshape(B, nW, N, 3, h, hd)
        q = qkv[..., 0, :, :].transpose(0, 1, 3, 2, 4)  # (B, nW, h, N, hd)
        k = qkv[..., 1, :, :].transpose(0, 1, 3, 2, 4)
        v = qkv[..., 2, :, :].transpose(0, 1, 3, 2, 4)

        # text QKV projects C_text -> C (ref swint_vl.py:125-126)
        qkv_t = nn.Dense(3 * C, dtype=self.dtype,
                         kernel_init=trunc_normal_init,
                         name="qkv_text")(text)
        qkv_t = qkv_t.reshape(B, Lt, 3, h, hd)
        q_t = qkv_t[:, :, 0].transpose(0, 2, 1, 3)      # (B, h, Lt, hd)
        k_t = qkv_t[:, :, 1].transpose(0, 2, 1, 3)
        v_t = qkv_t[:, :, 2].transpose(0, 2, 1, 3)

        # learned position biases (ref swint_vl.py:128-131)
        rpb_table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window)
        rpb = rpb_table[idx.reshape(-1)].reshape(N, N, h)
        rpb = rpb.transpose(2, 0, 1)[None, None]        # (1, 1, h, N, N)
        i2t_bias = self.param("i2t_relative_position_bias",
                              trunc_normal_init, (2, h, self.ntext),
                              jnp.float32)
        t2t_bias = self.param("t2t_relative_position_bias",
                              trunc_normal_init,
                              (h, self.ntext, self.ntext), jnp.float32)

        # ---- image rows: one softmax over N window keys + Lt text keys
        a_ii = jnp.einsum("bwhnd,bwhmd->bwhnm", q * scale, k,
                          preferred_element_type=jnp.float32) + rpb
        if shift_mask is not None:                      # (nW, N, N)
            a_ii = a_ii + shift_mask[None, :, None]
        a_it = jnp.einsum("bwhnd,bhld->bwhnl", q * scale, k_t,
                          preferred_element_type=jnp.float32)
        it_add = i2t_bias[0][None, None, :, None, :Lt]  # (1,1,h,1,Lt)
        if text_mask_add is not None:
            it_add = it_add + text_mask_add[:, None, None, None, :]
        a_it = a_it + it_add
        a = jax.nn.softmax(jnp.concatenate([a_ii, a_it], axis=-1), axis=-1)
        a = nn.Dropout(self.attn_drop, deterministic=deterministic,
                       name="attn_drop_img")(a.astype(self.dtype))
        out = (jnp.einsum("bwhnm,bwhmd->bwhnd", a[..., :N], v)
               + jnp.einsum("bwhnl,bhld->bwhnd", a[..., N:], v_t))
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic,
                         name="proj_drop_img")(out)

        # ---- text rows: keys are all nW*N image tokens + the text tokens
        k_all = k.transpose(0, 2, 1, 3, 4).reshape(B, h, nW * N, hd)
        v_all = v.transpose(0, 2, 1, 3, 4).reshape(B, h, nW * N, hd)
        a_ti = jnp.einsum("bhld,bhmd->bhlm", q_t * scale, k_all,
                          preferred_element_type=jnp.float32)
        # per-(head, text-token) scalar bias on every image key
        # (ref swint_vl.py:215: i2t_bias[1:].unsqueeze(-1))
        a_ti = a_ti + i2t_bias[1][None, :, :Lt, None]
        a_tt = jnp.einsum("bhld,bhmd->bhlm", q_t * scale, k_t,
                          preferred_element_type=jnp.float32)
        a_tt = a_tt + t2t_bias[None, :, :Lt, :Lt]
        if text_mask_add is not None:
            a_tt = a_tt + text_mask_add[:, None, None, :]
        a_t = jax.nn.softmax(jnp.concatenate([a_ti, a_tt], axis=-1), axis=-1)
        a_t = nn.Dropout(self.attn_drop, deterministic=deterministic,
                         name="attn_drop_text")(a_t.astype(self.dtype))
        t_out = (jnp.einsum("bhlm,bhmd->bhld", a_t[..., :nW * N], v_all)
                 + jnp.einsum("bhlm,bhmd->bhld", a_t[..., nW * N:], v_t))
        t_out = t_out.transpose(0, 2, 1, 3).reshape(B, Lt, C)
        t_out = nn.Dense(self.dim_text, dtype=self.dtype,
                         kernel_init=trunc_normal_init,
                         name="proj_text")(t_out)
        t_out = nn.Dropout(self.proj_drop, deterministic=deterministic,
                           name="proj_drop_text")(t_out)
        return out, t_out


class SwinBlockVL(nn.Module):
    """Swin block whose (S)W-MSA is the joint image<->text attention;
    both streams get residual + MLP (ref swint_vl.py:305-375).

    Detection flavor: feature maps are statically padded to window
    multiples (padded tokens participate in the joint attention exactly
    as the reference's zero-padded tokens do)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    ntext: int
    dim_text: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_scale: bool = False  # v2 trunk option (swint_v2_vl.py:238-247)
    dtype: Dtype = jnp.float32

    def setup(self):
        # The reference swint_vl/swint_v2_vl never clamp the shift: they
        # pad to window multiples and roll unconditionally
        # (swint_v2_vl.py:338-370) — with padding or the shifted region
        # mask the shift is NOT a no-op, so parity requires keeping it.
        self.window, self.shift = self.window_size, self.shift_size
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm1_text = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = JointWindowAttention(
            dim=self.dim, window=self.window, num_heads=self.num_heads,
            ntext=self.ntext, dim_text=self.dim_text,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2_text = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                       out_features=self.dim, drop_rate=self.drop,
                       dtype=self.dtype)
        self.mlp_text = Mlp(
            hidden_features=int(self.dim_text * self.mlp_ratio),
            out_features=self.dim_text, drop_rate=self.drop,
            dtype=self.dtype)
        self.drop_path_mod = DropPath(self.drop_path)
        if self.layer_scale:
            self.gamma = self.param("gamma",
                                    nn.initializers.constant(1e-4),
                                    (self.dim,), jnp.float32)
            # Text residuals carry their own layer-scale gain
            # (ref swint_v2_vl.py:310-312, 380-381).
            self.gamma_text = self.param("gamma_text",
                                         nn.initializers.constant(1e-4),
                                         (self.dim_text,), jnp.float32)

    def _scale(self, x: jax.Array) -> jax.Array:
        if self.layer_scale:
            return x * self.gamma.astype(x.dtype)
        return x

    def _scale_text(self, t: jax.Array) -> jax.Array:
        if self.layer_scale:
            return t * self.gamma_text.astype(t.dtype)
        return t

    def __call__(self, x: jax.Array, text: jax.Array,
                 text_mask_add: Optional[jax.Array], *,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        H, W = self.input_resolution
        shortcut, shortcut_t = x, text
        x = self.norm1(x)
        text = self.norm1_text(text)

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
        xw, t_out = self.attn(xw, mask, text, text_mask_add,
                              deterministic=deterministic)
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
        text = shortcut_t + self.drop_path_mod(self._scale_text(t_out),
                                               deterministic=deterministic)
        text = text + self.drop_path_mod(
            self._scale_text(self.mlp_text(self.norm2_text(text),
                                           deterministic=deterministic)),
            deterministic=deterministic)
        return x, text


class SwinVLBackbone(nn.Module):
    """4-stage language-aware Swin trunk: stages 1..3 are plain Swin,
    the last stage runs joint image<->text attention and updates the
    language hidden states (ref swint_vl.py:673-694, 788-797).

    version "v1": PatchEmbed(4) + LN/linear PatchMerging downsamples
    (swint_vl.py).  version "v2": overlapping ConvEmbed(7,s4) + conv
    downsamples ConvEmbed(3,s2) and optional layer-scale
    (swint_v2_vl.py:592-640).
    """

    image_size: Tuple[int, int]
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    max_query_len: int = 256   # ntext (bias tables sized to this)
    lang_dim: int = 768
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    version: str = "v1"        # "v1" (swint_vl) | "v2" (swint_v2_vl)
    # vl=False builds the language-free trunk (ref swint.py /
    # swint_v2.py stage layout) — used for the plain SWINT-FPN
    # detection backbones; text inputs are then ignored.
    vl: bool = True
    layer_scale: bool = False
    out_indices: Sequence[int] = (1, 2, 3)
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.version in ("v1", "v2")
        H, W = self.image_size
        if self.version == "v1":
            self.patch_embed = PatchEmbed(patch_size=4,
                                          embed_dim=self.embed_dim,
                                          dtype=self.dtype)
        else:
            self.patch_embed = ConvEmbed(embed_dim=self.embed_dim,
                                         patch_size=7, stride=4, padding=2,
                                         dtype=self.dtype)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        n_stages = len(self.depths)
        stages, downs = [], []
        res = (-(-H // 4), -(-W // 4))
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** s)
            lo = sum(self.depths[:s])
            blocks = []
            for b in range(depth):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                if s == n_stages - 1 and self.vl:
                    blocks.append(SwinBlockVL(
                        dim=dim, input_resolution=res,
                        num_heads=self.num_heads[s],
                        window_size=self.window_size, shift_size=shift,
                        ntext=self.max_query_len, dim_text=self.lang_dim,
                        mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                        drop_path=dpr[lo + b],
                        layer_scale=(self.layer_scale
                                     and self.version == "v2"),
                        dtype=self.dtype, name=f"stage{s}_block{b}"))
                elif self.version == "v1":
                    blocks.append(SwinBlock(
                        dim=dim, input_resolution=res,
                        num_heads=self.num_heads[s],
                        window_size=self.window_size, shift_size=shift,
                        mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                        drop_path=dpr[lo + b], pad_to_window=True,
                        use_pallas=self.use_pallas, dtype=self.dtype,
                        name=f"stage{s}_block{b}"))
                else:
                    blocks.append(SwinV2Block(
                        dim=dim, input_resolution=res,
                        num_heads=self.num_heads[s],
                        window_size=self.window_size, shift_size=shift,
                        mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                        drop_path=dpr[lo + b],
                        layer_scale=self.layer_scale,
                        use_pallas=self.use_pallas, dtype=self.dtype,
                        name=f"stage{s}_block{b}"))
            stages.append(blocks)
            if s < n_stages - 1:
                if self.version == "v1":
                    downs.append(PatchMerging(dim=dim, dtype=self.dtype,
                                              name=f"downsample{s}"))
                else:
                    downs.append(ConvEmbed(embed_dim=dim * 2, patch_size=3,
                                           stride=2, padding=1,
                                           dtype=self.dtype,
                                           name=f"downsample{s}"))
            res = (-(-res[0] // 2), -(-res[1] // 2))
        self.stages = stages
        self.downsamples = downs
        self.out_norms = {
            str(i): nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"out_norm{i}")
            for i in self.out_indices
        }

    def __call__(self, images: jax.Array,
                 lang_hidden: Optional[jax.Array] = None,
                 lang_masks: Optional[jax.Array] = None, *,
                 deterministic: bool = True
                 ) -> Tuple[List[jax.Array], Optional[Dict[str, jax.Array]]]:
        """images (B, H, W, 3) NHWC; lang_hidden (B, Lt, lang_dim);
        lang_masks (B, Lt) 1 = valid.  Returns (multi-scale NHWC
        features at out_indices, language dict with updated hidden —
        None when vl=False)."""
        x = self.patch_embed(images)
        text = lang_hidden
        mask_add = None
        if lang_masks is not None:
            mask_add = jnp.where(lang_masks.astype(bool), 0.0, NEG_INF
                                 ).astype(jnp.float32)

        outs = []
        n_stages = len(self.stages)
        for s, blocks in enumerate(self.stages):
            for blk in blocks:
                if s == n_stages - 1 and self.vl:
                    x, text = blk(x, text, mask_add,
                                  deterministic=deterministic)
                else:
                    x = blk(x, deterministic=deterministic)
            if s in self.out_indices:
                outs.append(self.out_norms[str(s)](x))
            if s < n_stages - 1:
                x = self.downsamples[s](x)

        if not self.vl:
            return outs, None
        from fiber_tpu.models.roberta import make_lang_dict
        return outs, make_lang_dict(text, lang_masks)
