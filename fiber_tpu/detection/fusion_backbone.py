"""Fusion-in-the-backbone for detection: Swin-B + RoBERTa interleave with
per-stage FPN taps.

Behavioral spec: modeling/backbone/fusion_swin_transformer_v2.py:803-953
(the shipped "fusion v2" forward), with fusion_version selecting the
sibling variants: "v1" (fusion_swin_transformer.py:802-942 — asymmetric:
stage-3 fuses i2t only on its last v1_num_pre blocks with NO text
updates, the text stream fuses only at stage 4 through dedicated
1024->768 image projections cross_modal_image_transform2/3) and "v3"
(fusion_swin_transformer_v3.py — v2 plus a LayerNorm on the i2t image
queries).  The v2/v1 i2t attention has no query norm; the coarse stack
and v3 do (i2t_query_norm):

  text embeddings + text layers 0-5
  Swin stages 1-2 unfused (per-stage LayerNorm taps -> outs)
  stage-3 blocks 0-13 plain, 14-17 fused with text layers 6-9
  stage-3 norm tap -> outs; PatchMerging
  stage-4 blocks 0-1 fused with text layers 10-11 (no deferred norm,
  unlike the coarse stack)
  stage-4 norm tap -> outs
  FPN over the last 3 taps (strides 8/16/32) + P6/P7
  language dict: {hidden, embedded=hidden*mask, aggregate=masked mean,
  masks} (ref: roberta_fused_model_v2.py:86-100)

Images are statically padded NHWC; window padding inside blocks handles
non-multiple feature sizes (pad_to_window=True).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.fpn import FPN
from fiber_tpu.models.roberta import (RobertaEncoderModel,
                                      extended_attention_mask,
                                      make_lang_dict)
from fiber_tpu.models.swin import PatchEmbed, SwinStage

Dtype = Any


class FusionSwinFPN(nn.Module):
    """Fused Swin-B + RoBERTa detection backbone with FPN."""

    image_size: Tuple[int, int]  # static padded (H, W), divisible by 32
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    drop_path_rate: float = 0.0  # 0.4 in the finetune config (train only)
    num_fuse_block: int = 6
    out_channels: int = 256
    # text encoder
    vocab_size: int = 50265
    lang_dim: int = 768
    num_text_layers: int = 12
    num_text_heads: int = 12
    max_query_len: int = 256
    fusion_version: str = "v2"   # v1 | v2 | v3
    v1_num_pre_block: int = 9    # ref fusion_swin_transformer.py:866
    # zero-init tunable prompt added to the text embeddings
    # (ref fusion_swin_transformer.py:810-814 tunable_linear;
    # enabled by the language_prompt_v2/v4 tuning modes)
    add_linear_layer: bool = False
    use_pallas: bool = False
    # jax.checkpoint each Swin block (training memory: the detection
    # fwd+bwd program at 800x1344 B=2 needs ~15 GB without it)
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        H, W = self.image_size
        gh, gw = H // self.patch_size, W // self.patch_size
        self.patch_embed = PatchEmbed(patch_size=self.patch_size,
                                      embed_dim=self.embed_dim,
                                      dtype=self.dtype)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        stages = []
        for s, depth in enumerate(self.depths):
            if s < 2:
                fuse = tuple(False for _ in range(depth))
            elif s == 2:
                if self.fusion_version == "v1":
                    n_tail = depth - self.v1_num_pre_block
                else:
                    n_tail = self.num_fuse_block - self.depths[3]
                fuse = tuple(i >= depth - n_tail for i in range(depth))
            else:
                fuse = tuple(True for _ in range(depth))
            lo = sum(self.depths[:s])
            stages.append(SwinStage(
                dim=self.embed_dim * (2 ** s),
                input_resolution=(-(-gh // (2 ** s)), -(-gw // (2 ** s))),
                depth=depth, num_heads=self.num_heads[s],
                window_size=self.window_size, mlp_ratio=4.0,
                drop=0.0, attn_drop=0.0,
                drop_path=tuple(dpr[lo:lo + depth]),
                has_downsample=(s < len(self.depths) - 1),
                fuse_flags=fuse,
                i2t_query_norm=(self.fusion_version == "v3"),
                pad_to_window=True,
                use_pallas=self.use_pallas, remat=self.remat,
                dtype=self.dtype, name=f"layers_{s}"))
        self.stages = stages
        if self.fusion_version == "v1":
            # stage-4 text fusion reads projected image tokens
            # (ref fusion_swin_transformer.py:806-808, 906-917)
            self.cross_modal_image_transform2 = nn.Dense(
                self.lang_dim, dtype=self.dtype,
                name="cross_modal_image_transform2")
            self.cross_modal_image_transform3 = nn.Dense(
                self.lang_dim, dtype=self.dtype,
                name="cross_modal_image_transform3")
        # per-stage output norms for the FPN taps (ref swint `norm{i}`;
        # OUT_FEATURES covers strides 8/16/32 only — the reference builds
        # no norm0 and the FPN's in_channels_list leads with 0, skipping
        # the stride-4 level, backbone/__init__.py + fpn.py:44-45)
        self.out_norms = {
            s: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name=f"out_norm_{s}")
            for s in range(1, len(self.depths))
        }
        self.text = RobertaEncoderModel(
            vocab_size=self.vocab_size, hidden_size=self.lang_dim,
            num_layers=self.num_text_layers, num_heads=self.num_text_heads,
            intermediate_size=self.lang_dim * 4,
            max_position_embeddings=514,
            num_fuse_block=self.num_fuse_block,
            attn_drop=0.1, hidden_drop=0.1, dtype=self.dtype,
            name="language_backbone")
        self.fpn = FPN(out_channels=self.out_channels, dtype=self.dtype,
                       name="fpn")
        if self.add_linear_layer:
            self.tunable_linear = self.param(
                "tunable_linear", nn.initializers.zeros,
                (1000, self.lang_dim), jnp.float32)

    def __call__(self, images: jax.Array, input_ids: jax.Array,
                 attention_mask: jax.Array, *,
                 deterministic: bool = True
                 ) -> Tuple[List[jax.Array], Dict[str, jax.Array]]:
        """images (B, H, W, 3) padded NHWC; input_ids/attention_mask
        (B, T).  Returns (5 FPN levels NHWC, language dict)."""
        x = self.patch_embed(images)

        text = self.text.embeddings(input_ids, deterministic=deterministic)
        if self.add_linear_layer:
            T = text.shape[1]
            text = text + self.tunable_linear[None, :T].astype(text.dtype)
        ext_mask = extended_attention_mask(attention_mask, self.dtype)
        text_bias = ((1.0 - attention_mask.astype(jnp.float32)) * -10000.0
                     ).astype(self.dtype)

        n_pre_text = (10 if self.fusion_version == "v1"
                      else self.num_text_layers - self.num_fuse_block)
        for i in range(n_pre_text):
            text = self.text.layers[i](text, attn_mask=ext_mask,
                                       deterministic=deterministic)

        outs = []
        # stages 1-2 unfused; the stride-4 stage-1 output feeds no FPN
        # level (see out_norms above), so it gets no norm tap
        # blocks are invoked positionally: under remat the block class is
        # wrapped with static_argnums=(4,) (`deterministic`), which only
        # covers positional arguments
        for s in range(2):
            stage = self.stages[s]
            for blk in stage.blocks:
                x = blk(x, None, None, deterministic)
            if s >= 1:
                outs.append(self.out_norms[s](x))
            x = stage.downsample(x)

        # stage 3: plain blocks then fused interleave (v1: i2t-only —
        # the text stream is untouched until stage 4)
        stage3 = self.stages[2]
        if self.fusion_version == "v1":
            n_pre_block = self.v1_num_pre_block
        else:
            n_tail = self.num_fuse_block - self.depths[3]
            n_pre_block = self.depths[2] - n_tail
        for bi, blk in enumerate(stage3.blocks):
            if bi < n_pre_block:
                x = blk(x, None, None, deterministic)
            elif self.fusion_version == "v1":
                x = blk(x, text, text_bias, deterministic)
            else:
                B, H, W, C3 = x.shape
                img_tokens = x.reshape(B, H * W, C3)
                fused_x = blk(x, text, text_bias, deterministic)
                text = self.text.layers[n_pre_text + (bi - n_pre_block)](
                    text, attn_mask=ext_mask, image_feats=img_tokens,
                    deterministic=deterministic)
                x = fused_x
        outs.append(self.out_norms[2](x))
        x = stage3.downsample(x)

        # stage 4: both blocks fused (no deferred LayerNorm here,
        # ref fusion_swin_transformer_v2.py:906-938); v1 feeds the text
        # layers 1024->768 projected image tokens instead
        stage4 = self.stages[3]
        for bi, blk in enumerate(stage4.blocks):
            B, H, W, C4 = x.shape
            img_tokens = x.reshape(B, H * W, C4)
            fused_x = blk(x, text, text_bias, deterministic)
            if self.fusion_version == "v1":
                proj = (self.cross_modal_image_transform2 if bi == 0
                        else self.cross_modal_image_transform3)
                img_tokens = proj(img_tokens)
                text_layer = self.text.layers[10 + bi]
            else:
                text_layer = self.text.layers[n_pre_text + n_tail + bi]
            text = text_layer(
                text, attn_mask=ext_mask, image_feats=img_tokens,
                deterministic=deterministic)
            x = fused_x
        outs.append(self.out_norms[3](x))

        lang_dict = make_lang_dict(text, attention_mask)

        # FPN over the stride-8/16/32 taps + P6/P7
        feats = self.fpn(outs)
        return feats, lang_dict
