"""Swin transformer backbone with image->text (i2t) fusion hooks, in flax.

TPU-first re-design of the reference Swin-B backbone
(behavioral spec: coarse_grained/fiber/modules/swin_transformer.py):

* NHWC feature layout throughout; window partition/reverse are pure
  reshape/transposes that XLA folds into the surrounding matmuls.
* Text K/V in the i2t cross-attention are kept at shape (B, H, Lt, d) and
  broadcast over the window axis inside an einsum instead of being
  materialized per-window (the reference repeat_interleaves them,
  swin_transformer.py:237-238) — saves nW x HBM traffic.
* Shift masks and relative-position indices are static numpy constants
  baked at trace time (shapes are static under jit).
* Softmax/LayerNorm accumulate in fp32 under a bf16 compute policy.

Behavioral parity targets (see tests/test_swin.py):
  - window partition order, cyclic shift, SW-MSA mask values (-100 fill)
  - relative position bias indexing
  - fusion: q from LayerNorm of the W-MSA output, gate alpha_i2t init 0
    (ref: swin_transformer.py:186-259)
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.models.layers import DropPath, Mlp, trunc_normal_init

Dtype = Any


# --------------------------------------------------------------------------
# Static (trace-time) helpers
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """(N, N) int32 index into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)                            # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)           # (N, N, 2)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)                     # (N, N)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask for SW-MSA (0 allowed / -100 blocked).

    Matches the reference mask construction (swin_transformer.py:327-354).
    """
    img_mask = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, H - window), slice(H - window, H - shift),
               slice(H - shift, H)):
        for ws in (slice(0, W - window), slice(W - window, W - shift),
                   slice(W - shift, W)):
            img_mask[hs, ws] = cnt
            cnt += 1
    # partition into windows
    m = img_mask.reshape(H // window, window, W // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, N)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B, nW, window*window, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // window) * (W // window), window * window, C)


def window_reverse(x: jax.Array, window: int, H: int, W: int) -> jax.Array:
    """(B, nW, window*window, C) -> (B, H, W, C)."""
    B = x.shape[0]
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


# --------------------------------------------------------------------------
# Modules
# --------------------------------------------------------------------------
class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding (conv + LayerNorm), NHWC in/out."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x  # (B, H/p, W/p, C)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias + optional i2t text cross-attention.

    Operates on pre-partitioned windows (B, nW, N, C).  The attention core
    (QK^T + bias + mask + softmax + PV) runs as a fused Pallas kernel on
    TPU (use_pallas=True) or as the jnp reference path elsewhere — both
    paths are numerically equivalent (tests/test_pallas_ops.py).

    The i2t cross-attention is window-independent math (every image token
    attends to all text tokens; the reference merely broadcasts text K/V
    per window, swin_transformer.py:237-238), so it is computed over flat
    tokens with no nW-fold duplication.
    """

    dim: int
    window: int
    num_heads: int
    fuse_text: bool = False
    # LayerNorm on the i2t image queries: present in the coarse stack and
    # detection fusion v3 (swin_transformer.py:193, _v3.py:135), ABSENT in
    # detection fusion v1/v2
    i2t_query_norm: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 shift_mask: Optional[jax.Array] = None,
                 text: Optional[jax.Array] = None,
                 text_bias: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        from fiber_tpu.ops.window_attention import (
            fused_window_attention_windows,
            window_attention_windows_reference)

        B, nW, N, C = x.shape
        h, hd = self.num_heads, C // self.num_heads
        scale = hd ** -0.5

        qkv = nn.Dense(3 * C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="qkv")(x)

        rpb_table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window)  # (N, N) static
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, h)
        bias = bias.transpose(2, 0, 1)[None]        # (1, h, N, N)
        if shift_mask is not None:                  # (nW, N, N) additive
            bias = bias + shift_mask[:, None]       # (nW, h, N, N)
        else:
            bias = jnp.broadcast_to(bias, (nW, h, N, N))

        # NB: attention-prob dropout is not applied on either path — the
        # reference's Swin configs run with attn_drop=0 (only hidden
        # dropout is set, ref config.py:57); the kernel requires it.
        use_kernel = (self.use_pallas and self.attn_drop == 0.0
                      and jax.default_backend() == "tpu")
        if use_kernel:
            out = fused_window_attention_windows(qkv, bias, h)
        else:
            out = window_attention_windows_reference(qkv, bias, h)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)

        if self.fuse_text and text is not None:
            # image-to-text cross attention over flat tokens
            Lt = text.shape[1]
            kv_t = nn.Dense(2 * C, dtype=self.dtype,
                            kernel_init=trunc_normal_init,
                            name="qkv_text_i2t")(text)
            kv_t = kv_t.reshape(B, Lt, 2, h, hd)
            k_t = kv_t[:, :, 0].transpose(0, 2, 1, 3)   # (B, h, Lt, hd)
            v_t = kv_t[:, :, 1].transpose(0, 2, 1, 3)

            xq = out
            if self.i2t_query_norm:
                xq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="norm_i2t_i")(out)
            q_t = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                           name="qkv_i2t")(xq)
            q_t = q_t.reshape(B, nW * N, h, hd).transpose(0, 2, 1, 3)

            a = jnp.einsum("bhnd,bhmd->bhnm", q_t * scale, k_t,
                           preferred_element_type=jnp.float32)
            if text_bias is not None:  # (B, Lt) additive (0 / -1e4)
                a = a + text_bias[:, None, None, :].astype(jnp.float32)
            a = jax.nn.softmax(a, axis=-1)
            a = a.astype(self.dtype)
            a = nn.Dropout(self.attn_drop, deterministic=deterministic,
                           name="attn_drop_i2t")(a)
            y = jnp.einsum("bhnm,bhmd->bhnd", a, v_t)
            y = y.transpose(0, 2, 1, 3).reshape(B, nW, N, C)
            y = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                         name="proj_i2t")(y)
            y = nn.Dropout(self.proj_drop, deterministic=deterministic,
                           name="proj_drop_i2t")(y)
            alpha = self.param("alpha_i2t", nn.initializers.zeros, (1,),
                               jnp.float32)
            out = out + alpha.astype(self.dtype) * y

        return out


class SwinBlock(nn.Module):
    """One Swin block: (S)W-MSA (+ optional i2t fusion) + MLP, NHWC."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    fuse_text: bool = False
    i2t_query_norm: bool = True
    use_pallas: bool = False
    # Detection-flavor blocks keep the configured window and statically pad
    # feature maps to window multiples instead of clamping the window
    # (ref: fusion_swin_transformer_v2.py:293-340).
    pad_to_window: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        H, W = self.input_resolution
        window, shift = self.window_size, self.shift_size
        if self.pad_to_window:
            # Detection flavor NEVER clamps: even when the padded map is a
            # single window, the reference rolls and applies the shifted
            # region mask (fusion_swin_transformer_v2.py:304-332 pads then
            # shifts unconditionally) — with padding or a region mask the
            # shift is NOT a no-op, so parity requires keeping it.
            pass
        else:
            # Coarse flavor: window larger than the map -> one global
            # window, no shift (ref: swin_transformer.py:304-307).
            if min(H, W) <= window:
                window, shift = min(H, W), 0
        self.window, self.shift = window, shift

        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = WindowAttention(
            dim=self.dim, window=window, num_heads=self.num_heads,
            fuse_text=self.fuse_text,
            i2t_query_norm=self.i2t_query_norm,
            attn_drop=self.attn_drop,
            proj_drop=self.drop, use_pallas=self.use_pallas,
            dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                       out_features=self.dim, drop_rate=self.drop,
                       dtype=self.dtype)
        self.drop_path_mod = DropPath(self.drop_path)

    # NB: `deterministic` is positional (no keyword-only marker) so the
    # remat wrapper can declare it static (static_argnums=(4,)); a
    # rematted keyword bool becomes a traced bool[] that DropPath/Dropout
    # cannot branch on (train-config failure: remat + drop_path > 0).
    def __call__(self, x: jax.Array,
                 text: Optional[jax.Array] = None,
                 text_bias: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        H, W = self.input_resolution
        B = x.shape[0]
        C = self.dim
        shortcut = x
        x = self.norm1(x)

        # static pad to window multiples (detection flavor; no-op when the
        # resolution already divides the window)
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

        xw = window_partition(x, self.window)  # (B, nW, N, C)
        xw = self.attn(xw, shift_mask=mask, text=text, text_bias=text_bias,
                       deterministic=deterministic)
        x = window_reverse(xw, self.window, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))

        if (Hp, Wp) != (H, W):
            x = x[:, :H, :W]

        x = shortcut + self.drop_path_mod(x, deterministic=deterministic)
        x = x + self.drop_path_mod(self.mlp(self.norm2(x),
                                            deterministic=deterministic),
                                   deterministic=deterministic)
        return x


class PatchMerging(nn.Module):
    """2x2 patch merging: concat 4 neighbors -> LN -> linear 4C->2C."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        # order matches reference cat([x0, x1, x2, x3]) =
        # [(0,0), (1,0), (0,1), (1,1)] (ref: swin_transformer.py:422-426)
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 4, 2, 5)  # (B, H/2, W/2, wcol, hrow, C)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="reduction")(x)
        return x


class SwinStage(nn.Module):
    """One stage: a list of blocks + optional downsample."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    drop: float
    attn_drop: float
    drop_path: Tuple[float, ...]
    has_downsample: bool
    # per-block fusion flags
    fuse_flags: Tuple[bool, ...] = ()
    i2t_query_norm: bool = True
    pad_to_window: bool = False
    use_pallas: bool = False
    # jax.checkpoint each block (ref use_checkpoint,
    # swin_transformer.py:516-517): saves only block boundaries,
    # recomputing attention/MLP internals in the backward pass
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        fuse = self.fuse_flags or tuple(False for _ in range(self.depth))
        # static_argnums=(4,): `deterministic` (0 is self) must stay a
        # Python bool through the checkpoint wrapper — see
        # SwinBlock.__call__ note.
        block_cls = (nn.remat(
            SwinBlock, static_argnums=(4,),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            if self.remat else SwinBlock)
        self.blocks = [
            block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, drop=self.drop,
                attn_drop=self.attn_drop, drop_path=self.drop_path[i],
                fuse_text=fuse[i],
                i2t_query_norm=self.i2t_query_norm,
                pad_to_window=self.pad_to_window,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.downsample = (PatchMerging(dim=self.dim, dtype=self.dtype,
                                        name="downsample")
                           if self.has_downsample else None)

    def __call__(self, x, text=None, text_bias=None, *,
                 deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, text, text_bias, deterministic)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class SwinTransformer(nn.Module):
    """Swin backbone (coarse-grained flavor: fixed square input resolution).

    Fusion layout matches the reference: stage-3 blocks with global index
    >= 20 - num_fuse_block and all stage-4 blocks carry i2t fusion params
    (ref: swin_transformer.py:502,628).
    """

    image_size: int
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: Optional[int] = None
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    num_fuse_block: int = 6
    use_pallas: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        window = (self.window_size if self.window_size is not None
                  else self.image_size // 32)
        grid = self.image_size // self.patch_size
        self.patch_embed = PatchEmbed(patch_size=self.patch_size,
                                      embed_dim=self.embed_dim,
                                      dtype=self.dtype)
        self.pos_drop = nn.Dropout(self.drop_rate)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        stages = []
        for s, depth in enumerate(self.depths):
            if s < 2:
                fuse = tuple(False for _ in range(depth))
            elif s == 2:
                # stage-3: only the tail blocks fuse
                # (ref gating `i < 20 - NUM_FUSE_BLOCK` with depth 18;
                #  generalized: last (num_fuse_block - last_stage_depth))
                n_tail = self.num_fuse_block - self.depths[3]
                fuse = tuple(i >= depth - n_tail for i in range(depth))
            else:
                fuse = tuple(True for _ in range(depth))
            lo = sum(self.depths[:s])
            stages.append(SwinStage(
                dim=self.embed_dim * (2 ** s),
                input_resolution=(grid // (2 ** s), grid // (2 ** s)),
                depth=depth, num_heads=self.num_heads[s],
                window_size=window, mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[lo:lo + depth]),
                has_downsample=(s < len(self.depths) - 1),
                fuse_flags=fuse, use_pallas=self.use_pallas,
                remat=self.remat, dtype=self.dtype, name=f"layers_{s}"))
        self.stages = stages
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    # -- stepwise API used by the fusion interleave -------------------------
    def embed(self, img: jax.Array, *, deterministic: bool = True):
        """img NHWC (B, S, S, 3) -> (B, G, G, C) patch tokens."""
        x = self.patch_embed(img)
        return self.pos_drop(x, deterministic=deterministic)

    def __call__(self, img: jax.Array, text=None, text_bias=None, *,
                 deterministic: bool = True) -> jax.Array:
        """Full forward; returns final (B, L, num_features) after norm."""
        x = self.embed(img, deterministic=deterministic)
        for stage in self.stages:
            x = stage(x, text=text, text_bias=text_bias,
                      deterministic=deterministic)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        return self.norm(x)
