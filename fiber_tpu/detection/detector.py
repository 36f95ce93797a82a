"""Grounding detector meta-architecture (GeneralizedVLRCNN equivalent).

Behavioral spec: modeling/detector/generalized_vl_rcnn.py:64-404 with
FIBER's fusion config: captions are tokenized host-side (the reference
tokenizes inside forward, :268-275 — host work that doesn't belong in the
jit program), the fused backbone produces FPN features + language dict,
VLDyHead produces per-level predictions, and ATSS loss / postprocessor
consume them.  RPN_ONLY=True (no ROI heads) matches every FIBER config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.anchors import fpn_anchors
from fiber_tpu.detection.atss_loss import atss_grounding_loss
from fiber_tpu.detection.dyhead import VLDyHead
from fiber_tpu.detection.fusion_backbone import FusionSwinFPN
from fiber_tpu.detection.postprocess import Detections, atss_postprocess

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    # static padded image size (H, W); reference pads dynamically to
    # SIZE_DIVISIBILITY=32 — TPU buckets to a fixed size instead
    image_size: Tuple[int, int] = (1344, 1344)
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    drop_path_rate: float = 0.0
    num_fuse_block: int = 6
    out_channels: int = 256
    num_dyhead_convs: int = 6
    max_query_len: int = 256
    vocab_size: int = 50265
    lang_dim: int = 768
    num_text_heads: int = 12
    anchor_sizes: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    use_dyrelu: bool = True
    use_dyfuse: bool = True
    use_deform: bool = True
    atss_topk: int = 9
    reg_loss_weight: float = 2.0
    fusion_version: str = "v2"       # fusion_swin_transformer v1|v2|v3
    add_linear_layer: bool = False   # tunable text prompt (prompt tuning)
    # GLIP-style MLM pretext (ref defaults.py:516-520, default-off in
    # FIBER configs): random_word masking + BertLMPredictionHead over the
    # embedded language features.
    mlm_loss: bool = False
    mlm_loss_coef: float = 1.0
    mlm_loss_for_only_positives: bool = True
    mask_token_id: int = 50264       # roberta <mask>
    pad_token_id: int = 1
    # GLIP soft-token head + loss (ref USE_TOKEN_LOSS, defaults.py:488)
    use_token_loss: bool = False
    token_loss_weight: float = 1.0
    # MDETR contrastive alignment (ref USE_CONTRASTIVE_ALIGN_LOSS,
    # defaults.py:496-498); mutually exclusive with the dot-product head
    # in the reference but independently togglable here
    use_contrastive_align: bool = False
    contrastive_hdim: int = 64
    contrastive_align_loss_weight: float = 1.0
    # GLIP shallow contrastive loss over FPN features (ref
    # USE_SHALLOW_CONTRASTIVE_LOSS, defaults.py:521-528)
    use_shallow_contrastive: bool = False
    shallow_contrastive_hdim: int = 64
    shallow_max_positive_anchors: int = 100
    shallow_zero_pads: bool = False
    shallow_contrastive_loss_weight: float = 1.0
    # Pallas fused window-attention kernel in the Swin stages (vs the XLA
    # lowering, which at detection resolutions round-trips multi-GB fp32
    # attention probs through HBM); auto-gated off on non-TPU backends.
    use_pallas_attention: bool = True
    # jax.checkpoint Swin blocks + DyConvs (training memory; the
    # fwd+bwd program at 800x1344 B=2 needs ~15 GB HBM without it)
    remat: bool = False
    # GLIP early fusion in the head tower ("none" for FIBER — fusion lives
    # in the backbone; "mha-b" enables VLFuse+lang layers, ref
    # vldyhead.py:627-668)
    early_fuse: str = "none"
    lang_model: str = "bert"              # lang self-path: bert | clip
    clamp_bertattn: bool = False          # CLAMP_BERTATTN_* (defaults.py:511)
    use_fused_features_dot_product: bool = False   # defaults.py:506
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny_test(cls, **kw) -> "DetectorConfig":
        d = dict(image_size=(64, 64), embed_dim=16, depths=(1, 1, 3, 2),
                 num_heads=(2, 2, 2, 2), window_size=2, num_fuse_block=4,
                 out_channels=16, num_dyhead_convs=2, max_query_len=16,
                 vocab_size=99, lang_dim=32, num_text_heads=2,
                 anchor_sizes=(16, 32, 64, 128, 256),
                 use_deform=False)
        d.update(kw)
        return cls(**d)

    def feat_sizes(self) -> List[Tuple[int, int]]:
        H, W = self.image_size
        return [(-(-H // s), -(-W // s)) for s in self.anchor_strides]


class GroundingDetector(nn.Module):
    cfg: DetectorConfig

    def setup(self):
        c = self.cfg
        self.backbone = FusionSwinFPN(
            image_size=c.image_size, patch_size=c.patch_size,
            embed_dim=c.embed_dim, depths=c.depths, num_heads=c.num_heads,
            window_size=c.window_size, drop_path_rate=c.drop_path_rate,
            num_fuse_block=c.num_fuse_block, out_channels=c.out_channels,
            vocab_size=c.vocab_size, lang_dim=c.lang_dim,
            num_text_heads=c.num_text_heads,
            max_query_len=c.max_query_len,
            fusion_version=c.fusion_version,
            add_linear_layer=c.add_linear_layer,
            use_pallas=c.use_pallas_attention, remat=c.remat,
            dtype=c.compute_dtype)
        self.rpn = VLDyHead(
            num_convs=c.num_dyhead_convs, in_channels=c.out_channels,
            channels=c.out_channels, lang_dim=c.lang_dim,
            use_dyrelu=c.use_dyrelu, use_dyfuse=c.use_dyfuse,
            use_deform=c.use_deform, max_query_len=c.max_query_len,
            early_fuse=c.early_fuse, lang_model=c.lang_model,
            clamp_bertattn=c.clamp_bertattn,
            use_fused_features_dot_product=c.use_fused_features_dot_product,
            num_text_heads=c.num_text_heads,
            use_token_loss=c.use_token_loss,
            use_contrastive_align=c.use_contrastive_align,
            contrastive_hdim=c.contrastive_hdim,
            remat=c.remat, dtype=c.compute_dtype)
        if c.use_shallow_contrastive:
            from fiber_tpu.detection.contrastive import ShallowProjections
            self.shallow_head = ShallowProjections(
                hdim=c.shallow_contrastive_hdim)
        if c.mlm_loss:
            # BertLMPredictionHead equivalent (ref vldyhead.py:751-756)
            from fiber_tpu.models import heads
            self.mlm_head = heads.MLMHead(hidden_size=c.lang_dim,
                                          vocab_size=c.vocab_size,
                                          dtype=c.compute_dtype)

    def __call__(self, images: jax.Array, input_ids: jax.Array,
                 attention_mask: jax.Array, *,
                 deterministic: bool = True) -> Dict[str, Any]:
        feats, lang = self.backbone(images, input_ids, attention_mask,
                                    deterministic=deterministic)
        head_out = self.rpn(feats, lang["embedded"],
                            lang_mask=attention_mask)
        out = {"head_out": head_out, "lang": lang}
        if self.cfg.mlm_loss:
            # ref vldyhead.py:776-777: the MLM head reads the embedded
            # language features
            out["mlm_logits"] = self.mlm_head(lang["embedded"])
        if self.cfg.use_shallow_contrastive:
            # ref vldyhead.py:894-898: the shallow loss reads the RAW FPN
            # features (pre-dyhead-tower), flattened per level
            fpn_flat = jnp.concatenate(
                [f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats],
                axis=1)
            qi, qt, ls = self.shallow_head(fpn_flat, lang["embedded"])
            out["shallow_qi"], out["shallow_qt"] = qi, qt
            out["shallow_log_scale"] = ls
        return out


def detector_anchors(cfg: DetectorConfig, image_size=None):
    """(concat anchors (N,4) jnp, per-level sizes, per-level arrays).

    image_size overrides cfg.image_size for multi-scale buckets (the
    input pipeline pads each batch to one of a fixed bucket set and jit
    compiles one program per bucket, data/loader.py)."""
    if image_size is None:
        feat = cfg.feat_sizes()
    else:
        H, W = image_size
        feat = [(-(-H // s), -(-W // s)) for s in cfg.anchor_strides]
    per_level = fpn_anchors(tuple(feat), strides=cfg.anchor_strides,
                            sizes=cfg.anchor_sizes)
    sizes = tuple(a.shape[0] for a in per_level)
    cat = jnp.asarray(np.concatenate(per_level, axis=0))
    return cat, sizes, [jnp.asarray(a) for a in per_level]


def detection_loss(model: GroundingDetector, variables, batch, *,
                   rngs=None, train: bool = True,
                   mlm_rng: Optional[jax.Array] = None
                   ) -> Dict[str, jax.Array]:
    """batch: images (B,H,W,3), input_ids/attention_mask (B,T),
    gt_boxes (B,G,4), gt_valid (B,G), positive_map (B,G,T), optional
    greenlight_map (B,T) when cfg.mlm_loss (ref collate_batch.py:28-69).
    """
    cfg = model.cfg
    input_ids = batch["input_ids"]
    mlm_labels = None
    if cfg.mlm_loss and train:
        from fiber_tpu.detection import mlm as det_mlm
        if mlm_rng is None:
            mlm_rng = (rngs or {}).get("mlm", jax.random.PRNGKey(0))
        greenlight = batch.get("greenlight_map")
        if not cfg.mlm_loss_for_only_positives:
            greenlight = None   # ref generalized_vl_rcnn.py:277-278
        input_ids, mlm_labels = det_mlm.random_word_mask(
            mlm_rng, input_ids, cfg.mask_token_id, cfg.vocab_size,
            cfg.pad_token_id, greenlight)
    out = model.apply(variables, batch["images"], input_ids,
                      batch["attention_mask"], deterministic=not train,
                      rngs=rngs)
    anchors, level_sizes, _ = detector_anchors(
        cfg, batch["images"].shape[1:3])
    assign = None
    if cfg.use_shallow_contrastive:
        from fiber_tpu.detection.atss import batched_atss_assign
        assign = batched_atss_assign(anchors, level_sizes,
                                     batch["gt_boxes"], batch["gt_valid"],
                                     topk=cfg.atss_topk)
    losses = atss_grounding_loss(
        out["head_out"], anchors, level_sizes, batch["gt_boxes"],
        batch["gt_valid"], batch["positive_map"], batch["attention_mask"],
        reg_loss_weight=cfg.reg_loss_weight, topk=cfg.atss_topk,
        assign=assign)
    if cfg.use_token_loss:
        losses["loss_token"] = losses["loss_token"] * cfg.token_loss_weight
    if cfg.use_contrastive_align:
        losses["loss_contrastive_align"] = (
            losses["loss_contrastive_align"]
            * cfg.contrastive_align_loss_weight)
    if cfg.use_shallow_contrastive:
        # batch supplies gt_od_labels (B, G) "original_od_label" and
        # od_label_of_tokens (B, T) "positive_map_for_od_labels" (-1 = no
        # label), built by data/od_to_grounding.py
        from fiber_tpu.detection.contrastive import (
            select_shallow_anchors, shallow_contrastive_loss)
        num_pos = jnp.maximum(
            assign.pos_mask.sum().astype(jnp.float32), 1.0)
        sel_idx, sel_is_pos = select_shallow_anchors(
            assign.pos_mask, assign.assigned_gt,
            cfg.shallow_max_positive_anchors)
        losses["loss_shallow_contrastive"] = shallow_contrastive_loss(
            out["shallow_qi"], out["shallow_qt"],
            out["shallow_log_scale"], batch["attention_mask"], sel_idx,
            sel_is_pos, assign.assigned_gt, batch["positive_map"],
            batch["gt_od_labels"], batch["od_label_of_tokens"], num_pos,
            zero_pads=cfg.shallow_zero_pads,
        ) * cfg.shallow_contrastive_loss_weight
    if mlm_labels is not None:
        from fiber_tpu.detection import mlm as det_mlm
        losses["mlm_loss"] = det_mlm.mlm_loss(
            out["mlm_logits"], mlm_labels, cfg.mlm_loss_coef)
    losses["total_loss"] = sum(losses.values())
    return losses


def detection_inference(model: GroundingDetector, variables, batch,
                        agg_matrix: jax.Array, **pp_kwargs) -> Detections:
    cfg = model.cfg
    out = model.apply(variables, batch["images"], batch["input_ids"],
                      batch["attention_mask"], deterministic=True)
    _, _, per_level = detector_anchors(cfg, batch["images"].shape[1:3])
    return atss_postprocess(out["head_out"], per_level, agg_matrix,
                            batch["image_sizes"], **pp_kwargs)
