"""FIBER coarse-grained model: Swin-B + RoBERTa with fusion-in-the-backbone.

Behavioral spec: coarse_grained/fiber/modules/fiber_module.py.  The fused
forward interleaves the top Swin blocks with the top RoBERTa layers
(fiber_module.py:310-355); ITC towers run each backbone unfused
(fiber_module.py:249-308); the captioning decoder runs all text layers with
causal masks and cross-attends to the final Swin features
(fiber_module.py:369-429).

Everything here is a pure flax module; sharded training state (ITC queue,
EMA, optimizer) lives outside in fiber_tpu.train.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.config import FiberConfig
from fiber_tpu.models import heads
from fiber_tpu.models.layers import bert_normal_init
from fiber_tpu.models.roberta import (RobertaEncoderModel,
                                      causal_attention_mask,
                                      extended_attention_mask)
from fiber_tpu.models.swin import SwinTransformer


class FiberCoarse(nn.Module):
    cfg: FiberConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.swin = SwinTransformer(
            image_size=c.image_size, patch_size=c.patch_size,
            embed_dim=c.swin_embed_dim, depths=c.swin_depths,
            num_heads=c.swin_num_heads, window_size=c.window_size,
            mlp_ratio=c.swin_mlp_ratio, drop_path_rate=c.swin_drop_path_rate,
            num_fuse_block=c.num_fuse_block,
            use_pallas=c.use_pallas_attention, remat=c.remat, dtype=dt,
            name="vit_model")
        self.text = RobertaEncoderModel(
            vocab_size=c.vocab_size, hidden_size=c.text_hidden_size,
            num_layers=c.num_text_layers, num_heads=c.num_text_heads,
            intermediate_size=c.text_intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            num_fuse_block=c.num_fuse_block, pad_token_id=c.pad_token_id,
            attn_drop=c.drop_rate, hidden_drop=c.drop_rate, dtype=dt,
            name="text_transformer")

        hs = c.hidden_size
        mk = lambda name: nn.Dense(hs, dtype=dt, kernel_init=bert_normal_init,
                                   name=name)
        self.cross_modal_text_transform = mk("cross_modal_text_transform")
        self.cross_modal_image_transform = mk("cross_modal_image_transform")
        self.cross_modal_text_transform_itc = mk(
            "cross_modal_text_transform_itc")
        self.cross_modal_image_transform_itc = mk(
            "cross_modal_image_transform_itc")

        self.cross_modal_text_pooler = heads.Pooler(hs, dtype=dt)
        self.cross_modal_image_pooler = heads.Pooler(hs, dtype=dt)
        if c.itc_pooler:
            self.cross_modal_text_pooler_itc = heads.Pooler(hs, dtype=dt)
            self.cross_modal_image_pooler_itc = heads.Pooler(hs, dtype=dt)

        losses = set(c.loss_names)
        caption_losses = {"caption_mle", "caption_gold", "caption_cider"}
        if losses & ({"mlm"} | caption_losses):
            self.mlm_score = heads.MLMHead(hidden_size=hs,
                                           vocab_size=c.vocab_size, dtype=dt)
        if "itm" in losses:
            self.itm_score = heads.ITMHead(dtype=dt)
            # rank head reuses the positive-class row of the ITM weights at
            # conversion time (ref: fiber_module.py:112-114)
            self.rank_output = nn.Dense(1, dtype=dt,
                                        kernel_init=bert_normal_init)
        if "itc" in losses:
            self.temp = self.param("temp",
                                   nn.initializers.constant(c.itc_temp_init),
                                   (), jnp.float32)
        if "vqa" in losses:
            self.vqa_classifier = heads.MLPClassifier(
                hidden_dim=hs * 2, num_classes=c.vqav2_label_size, dtype=dt)
        if "nlvr2" in losses:
            self.nlvr2_classifier = heads.MLPClassifier(
                hidden_dim=hs * 2, num_classes=2, dtype=dt)
        if losses & caption_losses:
            # Projections feeding stage-3-dim cross-attention during
            # captioning; only layers [n_pre, num_layers-2) use them
            # (ref: fiber_module.py:121-128, 405-414).
            n_pre = c.num_text_layers - c.num_fuse_block
            self.caption_image_proj = {
                str(i): nn.Dense(c.input_image_embed_size // 2, dtype=dt,
                                 kernel_init=bert_normal_init,
                                 name=f"caption_image_proj_{i}")
                for i in range(n_pre, c.num_text_layers - 2)
            }

    # ------------------------------------------------------------------
    # ITC towers (unfused single-modality encoders)
    # ------------------------------------------------------------------
    def encode_image_itc(self, img: jax.Array, *,
                         deterministic: bool = True) -> Dict[str, jax.Array]:
        """Full unfused Swin + ITC transform + pool + normalize
        (ref: fiber_module.py:278-308)."""
        c = self.cfg
        x = self.swin(img, deterministic=deterministic)  # (B, L, 1024) normed
        x = self.cross_modal_image_transform_itc(x)      # (B, L, hs)
        avg = jnp.mean(x, axis=1, keepdims=True)         # (B, 1, hs)
        if c.itc_pooler:
            cls = self.cross_modal_image_pooler_itc(avg)
        else:
            cls = avg[:, 0]
        cls = cls / jnp.linalg.norm(cls.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(cls.dtype)
        return {"image_feats": x, "cls_feats": cls}

    def encode_text_itc(self, text_ids: jax.Array, text_masks: jax.Array, *,
                        deterministic: bool = True) -> Dict[str, jax.Array]:
        """Unfused 12-layer text encoder + ITC transform + pool + normalize
        (ref: fiber_module.py:249-276)."""
        c = self.cfg
        x = self.text(text_ids, text_masks, deterministic=deterministic)
        x = self.cross_modal_text_transform_itc(x)
        if c.itc_pooler:
            cls = self.cross_modal_text_pooler_itc(x)
        else:
            cls = x[:, 0]
        cls = cls / jnp.linalg.norm(cls.astype(jnp.float32), axis=-1,
                                    keepdims=True).astype(cls.dtype)
        return {"text_feats": x, "cls_feats": cls}

    # ------------------------------------------------------------------
    # Fused forward (the hot path) — expressed as
    # trunk(image-only) + prefix(text-only) + fused tail, so serving
    # pipelines can cache the text-independent pieces per image/text
    # (the reference recomputes the full forward per rerank pair,
    # objectives.py:388-499).
    # ------------------------------------------------------------------
    def encode_image_trunk(self, img: jax.Array, *,
                           deterministic: bool = True) -> jax.Array:
        """Text-independent image trunk: patch embed + stages 1-2 + the
        unfused stage-3 prefix (blocks 0..n_pre_block-1).  Returns
        (B, H3, W3, C3) stage-3 activations — the exact input of the
        first fused block.  ~85% of the per-pair FLOPs live here, all
        reusable across every text paired with the image."""
        c = self.cfg
        x = self.swin.embed(img, deterministic=deterministic)
        for s in range(2):
            x = self.swin.stages[s](x, deterministic=deterministic)
        stage3 = self.swin.stages[2]
        n_tail = c.num_fuse_block - c.swin_depths[3]
        n_pre_block = c.swin_depths[2] - n_tail
        for bi in range(n_pre_block):
            x = stage3.blocks[bi](x, None, None, deterministic)
        return x

    def encode_text_pre(self, text_ids: jax.Array, text_masks: jax.Array, *,
                        deterministic: bool = True) -> jax.Array:
        """Image-independent text prefix: embeddings + the first
        (num_text_layers - num_fuse_block) layers.  Returns (B, Lt, ht),
        the exact text state entering the first fused block."""
        c = self.cfg
        text = self.text.embeddings(text_ids, deterministic=deterministic)
        ext_mask = extended_attention_mask(text_masks, c.compute_dtype)
        n_pre_text = c.num_text_layers - c.num_fuse_block
        for i in range(n_pre_text):
            text = self.text.layers[i](text, attn_mask=ext_mask,
                                       deterministic=deterministic)
        return text

    def infer_fused_tail(self, trunk: jax.Array, text: jax.Array,
                         text_masks: jax.Array, *,
                         deterministic: bool = True) -> Dict[str, jax.Array]:
        """Fused interleave from cached (trunk, text-prefix) states:
        stage-3 fused tail + stage-4 + transforms/poolers.  Composes with
        encode_image_trunk/encode_text_pre to EXACTLY reproduce infer()
        (tests/test_retrieval_caption.py parity)."""
        c = self.cfg
        dt = c.compute_dtype
        x = trunk
        ext_mask = extended_attention_mask(text_masks, dt)
        text_bias = ((1.0 - text_masks.astype(jnp.float32)) * -10000.0
                     ).astype(dt)  # (B, Lt) additive for i2t attention

        n_pre_text = c.num_text_layers - c.num_fuse_block
        stage3 = self.swin.stages[2]
        n_tail = c.num_fuse_block - c.swin_depths[3]
        n_pre_block = c.swin_depths[2] - n_tail
        for bi in range(n_pre_block, c.swin_depths[2]):
            blk = stage3.blocks[bi]
            B, H, W, C3 = x.shape
            img_tokens = x.reshape(B, H * W, C3)
            fused_x = blk(x, text, text_bias, deterministic)
            text = self.text.layers[n_pre_text + (bi - n_pre_block)](
                text, attn_mask=ext_mask, image_feats=img_tokens,
                deterministic=deterministic)
            x = fused_x
        x = stage3.downsample(x)

        stage4 = self.swin.stages[3]
        for bi, blk in enumerate(stage4.blocks):
            B, H, W, C4 = x.shape
            img_tokens = x.reshape(B, H * W, C4)
            fused_x = blk(x, text, text_bias, deterministic)
            # last_norm deferred on the final text layer
            # (ref: fiber_module.py:339-344, last_norm=(blk_cnt == 0))
            text = self.text.layers[n_pre_text + n_tail + bi](
                text, attn_mask=ext_mask, image_feats=img_tokens,
                last_norm=(bi == 0), deterministic=deterministic)
            x = fused_x

        B, H, W, C4 = x.shape
        image_feats = self.cross_modal_image_transform(
            x.reshape(B, H * W, C4))
        text_feats = self.cross_modal_text_transform(text)

        cls_text = self.cross_modal_text_pooler(text_feats)
        avg_image = jnp.mean(image_feats, axis=1, keepdims=True)
        cls_image = self.cross_modal_image_pooler(avg_image)
        cls_feats = jnp.concatenate([cls_text, cls_image], axis=-1)

        return {"text_feats": text_feats, "image_feats": image_feats,
                "cls_feats": cls_feats}

    def infer(self, img: jax.Array, text_ids: jax.Array,
              text_masks: jax.Array, *,
              deterministic: bool = True) -> Dict[str, jax.Array]:
        """Interleaved fusion forward (ref: fiber_module.py:310-367).

        img: (B, S, S, 3) NHWC.  Returns text_feats (B, Lt, hs),
        image_feats (B, Li, hs), cls_feats (B, 2*hs).  Composed of the
        cacheable trunk/prefix + fused tail; rng folds are per module
        path in flax, so dropout draws match the monolithic forward.
        """
        trunk = self.encode_image_trunk(img, deterministic=deterministic)
        text = self.encode_text_pre(text_ids, text_masks,
                                    deterministic=deterministic)
        return self.infer_fused_tail(trunk, text, text_masks,
                                     deterministic=deterministic)

    # ------------------------------------------------------------------
    # Captioning decoder forward
    # ------------------------------------------------------------------
    def encode_image_caption(self, img: jax.Array, *,
                             deterministic: bool = True) -> jax.Array:
        """Unfused Swin features for captioning — note: NOT final-normed
        (ref: fiber_module.py:388-393 skips vit_model.norm)."""
        x = self.swin.embed(img, deterministic=deterministic)
        for stage in self.swin.stages:
            x = stage(x, deterministic=deterministic)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)

    def infer_caption(self, text_ids: jax.Array, text_masks: jax.Array,
                      image_embeds: jax.Array, *,
                      deterministic: bool = True) -> Dict[str, jax.Array]:
        """Causal text decoder over image features
        (ref: fiber_module.py:369-429)."""
        c = self.cfg
        dt = c.compute_dtype
        text = self.text.embeddings(text_ids, deterministic=deterministic)
        mask = causal_attention_mask(text_masks, dt)
        n_pre = c.num_text_layers - c.num_fuse_block
        for i, layer in enumerate(self.text.layers):
            if i < n_pre:
                text = layer(text, attn_mask=mask,
                             deterministic=deterministic)
            elif i < c.num_text_layers - 2:
                proj = self.caption_image_proj[str(i)](image_embeds)
                text = layer(text, attn_mask=mask, image_feats=proj,
                             deterministic=deterministic)
            else:
                text = layer(text, attn_mask=mask, image_feats=image_embeds,
                             deterministic=deterministic)
        text_feats = self.cross_modal_text_transform(text)
        cls_feats = self.cross_modal_text_pooler(text_feats)
        return {"text_feats": text_feats, "cls_feats": cls_feats}

    # ------------------------------------------------------------------
    # KV-cached captioning decode (SURVEY.md §7 step 5).  The reference
    # decoder re-encodes the full prefix per token (objectives.py:560-644);
    # here per-layer self-attention K/V are cached and the constant image
    # K/V are projected once, making each step O(L) instead of O(L^2).
    # ------------------------------------------------------------------
    def init_caption_cache(self, image_embeds: jax.Array, max_len: int):
        """Per-layer decode state: zeroed self-attention caches + the
        image cross-attention K/V, projected once per decode."""
        c = self.cfg
        B = image_embeds.shape[0]
        h = c.num_text_heads
        hd = c.text_hidden_size // h
        n_pre = c.num_text_layers - c.num_fuse_block
        caches = []
        for i, layer in enumerate(self.text.layers):
            kv = (jnp.zeros((B, h, max_len, hd), c.compute_dtype),
                  jnp.zeros((B, h, max_len, hd), c.compute_dtype))
            if i < n_pre:
                img_kv = None
            elif i < c.num_text_layers - 2:
                proj = self.caption_image_proj[str(i)](image_embeds)
                img_kv = layer.crossattention_t2i.project_kv(proj)
            else:
                img_kv = layer.crossattention_t2i.project_kv(image_embeds)
            caches.append({"self_kv": kv, "image_kv": img_kv})
        return caches

    def decode_caption_step(self, token_ids: jax.Array, pos, caches):
        """One decode step: token_ids (B, 1) at sequence position `pos`
        (0-based); returns (next-token logits (B, V), updated caches)."""
        c = self.cfg
        # live prefixes contain no PAD, so position = pos + 1 + pad_idx
        # (roberta.py create_position_ids semantics)
        position_ids = jnp.full_like(token_ids, 0) + pos + 1 + c.pad_token_id
        x = self.text.embeddings(token_ids, position_ids=position_ids)
        new_caches = []
        for layer, cache in zip(self.text.layers, caches):
            x, new_kv = layer.decode_step(x, cache["self_kv"], pos,
                                          image_kv=cache["image_kv"])
            new_caches.append({"self_kv": new_kv,
                               "image_kv": cache["image_kv"]})
        feats = self.cross_modal_text_transform(x)
        logits = self.mlm_score(feats)[:, 0, :]
        return logits, new_caches

    # ------------------------------------------------------------------
    # Heads
    # ------------------------------------------------------------------
    def mlm_logits(self, text_feats: jax.Array) -> jax.Array:
        return self.mlm_score(text_feats)

    def itm_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.itm_score(cls_feats)

    def rank_scores(self, cls_feats: jax.Array) -> jax.Array:
        return self.rank_output(cls_feats)

    def vqa_logits(self, cls_feats: jax.Array) -> jax.Array:
        return self.vqa_classifier(cls_feats)

    def nlvr2_logits(self, cls_feats_pair: jax.Array) -> jax.Array:
        return self.nlvr2_classifier(cls_feats_pair)

    def itc_temperature(self) -> jax.Array:
        # clamped as in the reference objective (objectives.py:123)
        return jnp.clip(self.temp, 0.001, 1.0)

    # Convenience full pretraining forward used by the graft entry:
    def __call__(self, img: jax.Array, text_ids: jax.Array,
                 text_masks: jax.Array, *, deterministic: bool = True):
        out = self.infer(img, text_ids, text_masks,
                         deterministic=deterministic)
        logits = {}
        if "itm" in self.cfg.loss_names:
            logits["itm"] = self.itm_logits(out["cls_feats"])
        if "mlm" in self.cfg.loss_names:
            logits["mlm"] = self.mlm_logits(out["text_feats"])
        return {**out, **logits}

    def init_full(self, img: jax.Array, text_ids: jax.Array,
                  text_masks: jax.Array):
        """Initialization-only forward touching every parameterized path
        (flax materializes params lazily per-method; init must visit all)."""
        losses = set(self.cfg.loss_names)
        caption_losses = {"caption_mle", "caption_gold", "caption_cider"}
        out = self.infer(img, text_ids, text_masks)
        self.encode_image_itc(img)
        self.encode_text_itc(text_ids, text_masks)
        if "itm" in losses:
            self.itm_logits(out["cls_feats"])
            self.rank_scores(out["cls_feats"])
        if losses & ({"mlm"} | caption_losses):
            self.mlm_logits(out["text_feats"])
        if "vqa" in losses:
            self.vqa_logits(out["cls_feats"])
        if "nlvr2" in losses:
            self.nlvr2_logits(jnp.concatenate(
                [out["cls_feats"], out["cls_feats"]], axis=-1))
        if losses & caption_losses:
            img_emb = self.encode_image_caption(img)
            self.infer_caption(text_ids, text_masks, img_emb)
        return out


def init_rank_from_itm(params):
    """Copy the ITM head's positive-class row into the rank head — the
    reference does this at irtr-finetune start so rerank scores begin as
    the ITM match logit (ref fiber_module.py:112-114).  Returns a new
    params tree; no-op if either head is absent."""
    if "itm_score" not in params or "rank_output" not in params:
        return params
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    k = flat.get(("itm_score", "fc", "kernel"))
    b = flat.get(("itm_score", "fc", "bias"))
    if k is None:
        return params
    flat[("rank_output", "kernel")] = k[:, 1:2]
    flat[("rank_output", "bias")] = b[1:2]
    return flax.traverse_util.unflatten_dict(flat)
