"""VLDyHead detection tower in flax: DyConv (3-scale dynamic conv +
level attention + DyReLU + optional deformable offsets) and the
classification / box / centerness / dot-product-grounding heads.

Behavioral spec: modeling/rpn/vldyhead.py:157-916 with FIBER's config
(USE_GN + USE_DYRELU + USE_DYFUSE + USE_DFCONV, EARLY_FUSE=NONE — fusion
lives in the backbone; USE_DOT_PRODUCT_TOKEN_LOSS).  Layout is NHWC;
per-level 2D convs run as plain XLA convs on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.detection.deform_conv import modulated_deform_conv2d

Dtype = Any


def h_sigmoid(x: jax.Array, h_max: float = 1.0) -> jax.Array:
    return jnp.clip(x + 3.0, 0.0, 6.0) * h_max / 6.0


class DyReLU(nn.Module):
    """Dynamic ReLU-B (ref layers/dyrelu.py:39-129, exp=4 path):
    out = max(x*a1 + b1, x*a2 + b2) with (a, b) predicted from GAP."""

    channels: int
    reduction: int = 4
    lambda_a: float = 2.0  # reference lambda_a=1.0 doubled in __init__
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        C = self.channels
        y = x.mean(axis=(1, 2))                     # (B, C)
        y = nn.Dense(C // self.reduction, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(4 * C, dtype=self.dtype, name="fc2")(y)
        y = h_sigmoid(y)
        a1, b1, a2, b2 = jnp.split(y, 4, axis=-1)
        a1 = (a1 - 0.5) * self.lambda_a + 1.0
        a2 = (a2 - 0.5) * self.lambda_a
        b1 = b1 - 0.5
        b2 = b2 - 0.5
        a1, b1, a2, b2 = (t[:, None, None, :] for t in (a1, b1, a2, b2))
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class Conv3x3Norm(nn.Module):
    """3x3 conv (optionally modulated-deformable) + GroupNorm
    (ref vldyhead.py Conv3x3Norm)."""

    out_channels: int
    stride: int = 1
    deformable: bool = False
    num_groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 offsets: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        if self.deformable and offsets is not None:
            Cin = x.shape[-1]
            w = self.param("kernel", nn.initializers.normal(0.01),
                           (3, 3, Cin, self.out_channels), jnp.float32)
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
            fn = lambda xi, oi, mi: modulated_deform_conv2d(
                xi, oi, mi, w.astype(x.dtype), b.astype(x.dtype),
                stride=self.stride)
            x = jax.vmap(fn)(x, offsets, mask)
        else:
            # torch padding=1 semantics: symmetric (1,1) even at stride 2
            # (flax "SAME" would pad (0,1) there and shift the windows)
            x = nn.Conv(self.out_channels, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name="conv")(x)
        # torch nn.GroupNorm eps default (1e-5; flax defaults to 1e-6)
        x = nn.GroupNorm(num_groups=min(self.num_groups,
                                        self.out_channels),
                         epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        return x


def _upsample_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) interpolation matrix for torch F.upsample_bilinear
    semantics (align_corners=True): src_i = i * (n_in-1)/(n_out-1)."""
    import numpy as np
    if n_in == 1 or n_out == 1:
        src = np.zeros(n_out)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    t = src - i0
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), i0] += 1.0 - t
    m[np.arange(n_out), i1] += t
    return jnp.asarray(m)


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear upsample with the reference's align_corners=True
    convention (vldyhead.py:228 F.upsample_bilinear) as two dense
    matmuls — MXU-friendly, and exact where jax.image.resize's
    half-pixel convention diverges."""
    mh = _upsample_matrix(x.shape[1], h).astype(x.dtype)
    mw = _upsample_matrix(x.shape[2], w).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


class DyConv(nn.Module):
    """One dynamic-conv stage over all FPN levels (ref vldyhead.py:157-251).

    For level l: combine conv(level l), stride-2 conv(level l-1) and
    upsampled conv(level l+1), weighted by per-feature level attention
    (h_sigmoid of GAP->1x1->relu), then DyReLU.
    """

    in_channels: int
    out_channels: int
    use_dyrelu: bool = True
    use_dyfuse: bool = True
    use_deform: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv_same = Conv3x3Norm(self.out_channels, 1,
                                     deformable=self.use_deform,
                                     dtype=self.dtype)
        self.conv_down = Conv3x3Norm(self.out_channels, 2,
                                     deformable=self.use_deform,
                                     dtype=self.dtype)
        self.conv_up = Conv3x3Norm(self.out_channels, 1,
                                   deformable=self.use_deform,
                                   dtype=self.dtype)
        if self.use_dyfuse:
            self.attn_conv = nn.Dense(1, dtype=self.dtype)
        if self.use_dyrelu:
            self.dyrelu = DyReLU(self.out_channels, dtype=self.dtype)
        if self.use_deform:
            self.offset_conv = nn.Conv(27, (3, 3), padding="SAME",
                                       dtype=self.dtype)

    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        n = len(feats)
        offsets, masks = [None] * n, [None] * n
        if self.use_deform:
            for i, f in enumerate(feats):
                om = self.offset_conv(f)              # (B, H, W, 27)
                offsets[i] = om[..., :18]
                masks[i] = jax.nn.sigmoid(om[..., 18:])

        def _reinterpret(buf, hu, wu):
            # The reference passes the LEVEL-l offset/mask buffer (NCHW
            # contiguous) to the stride-1 conv over level l+1; the CUDA
            # kernel has no offset shape check (deform_conv_cuda.cu:548
            # passes offset[b] raw) and indexes it flat with the
            # level-(l+1) output strides (deform_conv_kernel_cuda.cu
            # im2col: ((2k)*h_col + h)*w_col + w) — a flat buffer
            # reinterpretation, NOT a spatial crop.  Reproduce exactly.
            if buf is None:
                return None
            B, _, _, C = buf.shape
            flat = buf.transpose(0, 3, 1, 2).reshape(B, -1)
            flat = flat[:, :C * hu * wu].reshape(B, C, hu, wu)
            return flat.transpose(0, 2, 3, 1)

        outs = []
        for l, feat in enumerate(feats):
            # The reference computes conv_args (offset/mask) once per level
            # from `feature` and passes them to all three convs
            # (vldyhead.py:215-228): the stride-2 conv over level l-1
            # lands exactly on level-l resolution; the stride-1 conv over
            # level l+1 reinterprets the level-l offset buffer (see
            # _reinterpret above).
            temp = [self.conv_same(feat, offsets[l], masks[l])]
            if l > 0:
                temp.append(self.conv_down(feats[l - 1], offsets[l],
                                           masks[l]))
            if l < n - 1:
                hu, wu = feats[l + 1].shape[1], feats[l + 1].shape[2]
                off_u = _reinterpret(offsets[l], hu, wu)
                msk_u = _reinterpret(masks[l], hu, wu)
                up = self.conv_up(feats[l + 1], off_u, msk_u)
                temp.append(_resize_bilinear(up, feat.shape[1],
                                             feat.shape[2]))
            stacked = jnp.stack(temp)                 # (k, B, H, W, C)
            if self.use_dyfuse:
                attn = jnp.stack([
                    h_sigmoid(nn.relu(self.attn_conv(t.mean(axis=(1, 2)))))
                    for t in temp])                   # (k, B, 1)
                mean = (stacked * attn[:, :, None, None, :]).mean(axis=0)
            else:
                mean = stacked.mean(axis=0)
            outs.append(mean)

        if self.use_dyrelu:
            outs = [self.dyrelu(o) for o in outs]
        else:
            outs = [nn.relu(o) for o in outs]
        return outs


class CLIPTransformerLayer(nn.Module):
    """Pre-LN CLIP text layer with QuickGELU MLP — the lang self-path used
    under early fusion when LANGUAGE_BACKBONE.MODEL_TYPE == "clip"
    (ref vldyhead.py:306-357: ln_1 -> MHA(key_padding_mask) -> residual,
    ln_2 -> c_fc/QuickGELU/c_proj -> residual; DROP_PATH defaults 0)."""

    width: int = 512
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        B, L, _ = x.shape
        h, hd = self.num_heads, self.width // self.num_heads
        y = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, h, hd).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        if mask is not None:
            # key_padding_mask semantics: padded keys excluded everywhere
            a = jnp.where(mask.astype(bool)[:, None, None, :], a, -1e9)
        a = jax.nn.softmax(a, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(o)
        y = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(y)
        y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU
        return x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)


class VLDyHead(nn.Module):
    """Tower of NUM_CONVS DyConvs + prediction heads
    (ref vldyhead.py:587-916)."""

    num_convs: int = 6
    in_channels: int = 256
    channels: int = 256
    num_anchors: int = 1
    lang_dim: int = 768
    log_scale_init: float = 0.0
    prior_prob: float = 0.01
    use_dyrelu: bool = True
    use_dyfuse: bool = True
    use_deform: bool = True
    max_query_len: int = 256
    # "none" (FIBER: fusion lives in the backbone) or "mha-b" (GLIP-style
    # early fusion: VLFuse + text layer before each DyConv,
    # ref vldyhead.py:627-668)
    early_fuse: str = "none"
    num_text_heads: int = 12
    # lang self-path layer flavor under early fusion: "bert" (clamped
    # BertEncoderLayer, ref vldyhead.py:639-652) or "clip"
    # (CLIPTransformerLayer, ref vldyhead.py:306-357)
    lang_model: str = "bert"
    # clamp Bert attention scores to +-50000 (ref modeling_bert.py:139-146,
    # FUSE_CONFIG.CLAMP_BERTATTN_{MIN_FOR_UNDERFLOW,MAX_FOR_OVERFLOW})
    clamp_bertattn: bool = False
    # keep a real lang layer after the LAST VLFuse too; otherwise the
    # reference appends DummyLayer there (ref vldyhead.py:632,658:
    # `i < NUM_CONVS-1 or USE_FUSED_FEATURES_DOT_PRODUCT`)
    use_fused_features_dot_product: bool = False
    # GLIP soft-token head: 1x1 conv to A*T per-token logits
    # (ref vldyhead.py:684-686, USE_TOKEN_LOSS)
    use_token_loss: bool = False
    # MDETR contrastive-align head (ref vldyhead.py:692-698, 845-855,
    # USE_CONTRASTIVE_ALIGN_LOSS; mutually exclusive with the dot-product
    # head in the reference)
    use_contrastive_align: bool = False
    contrastive_hdim: int = 64           # CONTRASTIVE_HIDDEN_DIM
    # jax.checkpoint each DyConv (training memory: the deform-conv
    # gathers' backward temps dominate the det fwd+bwd HBM footprint)
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        chans = self.channels
        if self.early_fuse == "mha-b":
            from fiber_tpu.detection.vlfuse import VLFuse
            from fiber_tpu.models.roberta import RobertaLayer
            self.fuse_layers = [
                VLFuse(v_dim=chans, l_dim=self.lang_dim, dtype=self.dtype,
                       name=f"vlfuse_{i}")
                for i in range(self.num_convs)
            ]
            def _lang_layer(i):
                # the reference puts an identity after the last VLFuse
                # unless the fused dot-product is consumed downstream
                # (vldyhead.py:632,658)
                if (i == self.num_convs - 1
                        and not self.use_fused_features_dot_product):
                    return None
                if self.lang_model == "clip":
                    return CLIPTransformerLayer(
                        width=self.lang_dim, num_heads=self.num_text_heads,
                        dtype=self.dtype, name=f"lang_layer_{i}")
                return RobertaLayer(
                    hidden_size=self.lang_dim,
                    num_heads=self.num_text_heads,
                    intermediate_size=self.lang_dim * 4,
                    attn_drop=0.1, hidden_drop=0.1,
                    score_clamp=50000.0 if self.clamp_bertattn else None,
                    dtype=self.dtype, name=f"lang_layer_{i}")
            self.lang_layers = [_lang_layer(i)
                                for i in range(self.num_convs)]
        dyconv_cls = nn.remat(DyConv) if self.remat else DyConv
        self.tower = [
            dyconv_cls(in_channels=self.in_channels if i == 0 else chans,
                   out_channels=chans,
                   use_dyrelu=(self.use_dyrelu and
                               (i > 0 or self.in_channels == chans)),
                   use_dyfuse=(self.use_dyfuse and
                               (i > 0 or self.in_channels == chans)),
                   use_deform=(self.use_deform and
                               (i > 0 or self.in_channels == chans)),
                   dtype=self.dtype, name=f"dyconv_{i}")
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        self.cls_logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value))
        self.bbox_pred = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01))
        self.centerness = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01))
        # dot-product grounding head (ref vldyhead.py:700-711, 789-891)
        self.dot_product_projection_text = nn.Dense(
            self.num_anchors * chans, dtype=self.dtype)
        self.log_scale = self.param(
            "log_scale", nn.initializers.constant(self.log_scale_init),
            (1,), jnp.float32)
        self.bias_lang = self.param(
            "bias_lang", nn.initializers.zeros, (self.lang_dim,),
            jnp.float32)
        self.bias0 = self.param(
            "bias0", nn.initializers.constant(bias_value), (1,),
            jnp.float32)
        self.scales = self.param("scales", nn.initializers.ones, (5,),
                                 jnp.float32)
        if self.use_token_loss:
            # bias init'd to the focal prior like cls_logits
            # (ref vldyhead.py:725-733)
            self.token_logits = nn.Conv(
                self.num_anchors * self.max_query_len, (1, 1),
                dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.constant(bias_value))
        if self.use_contrastive_align:
            self.contrastive_align_projection_image = nn.Conv(
                self.num_anchors * self.contrastive_hdim, (1, 1),
                dtype=self.dtype, kernel_init=nn.initializers.normal(0.01))
            # ref vldyhead.py:697 declares Linear(channels, hdim) but feeds
            # the lang_dim-wide embedding; input width is inferred here
            self.contrastive_align_projection_text = nn.Dense(
                self.contrastive_hdim, dtype=self.dtype)

    def __call__(self, feats: Sequence[jax.Array],
                 lang_embedding: jax.Array,
                 lang_mask: Optional[jax.Array] = None
                 ) -> Dict[str, List[jax.Array]]:
        """feats: 5 FPN levels NHWC; lang_embedding (B, T, lang_dim).

        Returns dict with per-level lists:
          box_cls    (B, H, W, A)       — binary objectness logits
          bbox_reg   (B, H, W, A*4)
          centerness (B, H, W, A)
          dot_product_logits (B, H*W*A, T) — grounding logits
        """
        x = list(feats)
        lang_hidden = lang_embedding
        if self.early_fuse == "mha-b":
            from fiber_tpu.models.roberta import extended_attention_mask
            lang = {"hidden": lang_hidden, "masks": lang_mask}
            ext = (extended_attention_mask(lang_mask, self.dtype)
                   if lang_mask is not None else None)
            for fuse, lang_layer, dyconv in zip(
                    self.fuse_layers, self.lang_layers, self.tower):
                x, lang = fuse(x, lang)
                if lang_layer is None:          # DummyLayer after last fuse
                    pass
                elif isinstance(lang_layer, CLIPTransformerLayer):
                    lang["hidden"] = lang_layer(lang["hidden"],
                                                mask=lang_mask)
                else:
                    lang["hidden"] = lang_layer(lang["hidden"],
                                                attn_mask=ext)
                x = dyconv(x)
            lang_hidden = lang["hidden"]
            if lang_mask is not None:
                lang_embedding = lang_hidden * lang_mask.astype(
                    lang_hidden.dtype)[..., None]
            else:
                lang_embedding = lang_hidden
        else:
            for dyconv in self.tower:
                x = dyconv(x)

        # text projection: normalized embedding, /2.0, linear; bias from
        # embedding @ bias_lang + bias0 (ref vldyhead.py:789-800)
        emb = lang_embedding.astype(jnp.float32)
        # safe L2 normalize: jnp.linalg.norm has NaN gradients at exactly
        # zero rows (padded text positions are zeroed upstream); torch's
        # F.normalize subgradient there is 0 — sqrt(sum+eps) matches it
        norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True) + 1e-24)
        emb = emb / jnp.maximum(norm, 1e-12)
        proj_tokens = self.dot_product_projection_text(
            (emb / 2.0).astype(self.dtype))            # (B, T, A*C)
        token_bias = emb @ self.bias_lang + self.bias0  # (B, T)

        out = {"box_cls": [], "bbox_reg": [], "centerness": [],
               "dot_product_logits": []}
        B, T = emb.shape[0], emb.shape[1]
        A, C = self.num_anchors, self.channels
        pt = proj_tokens.reshape(B, T, A, C)
        if self.use_token_loss:
            out["token_logits"] = []
        if self.use_contrastive_align:
            # MDETR-style: normalized projection of the RAW text hidden
            # states (ref vldyhead.py:787, before the dot-product head's
            # in-place normalize)
            from fiber_tpu.detection.contrastive import safe_l2_normalize
            ct = safe_l2_normalize(self.contrastive_align_projection_text(
                lang_embedding).astype(jnp.float32))
            ct = ct.reshape(B, T, 1, self.contrastive_hdim)  # A broadcast
            out["contrastive_logits"] = []
        for l, f in enumerate(x):
            out["box_cls"].append(self.cls_logits(f))
            out["bbox_reg"].append(self.bbox_pred(f)
                                   * self.scales[l].astype(self.dtype))
            out["centerness"].append(self.centerness(f))
            Bf, H, W, _ = f.shape
            queries = f.reshape(Bf, H * W, C)          # A folded below
            # logits[b, hw, a, t] = <feat, proj_token> / exp(log_scale)
            logit = jnp.einsum("bqc,btac->bqat", queries, pt,
                               preferred_element_type=jnp.float32)
            logit = logit / jnp.exp(self.log_scale)
            logit = logit + token_bias[:, None, None, :]
            logit = jnp.clip(logit, -50000.0, 50000.0)
            out["dot_product_logits"].append(
                logit.reshape(Bf, H * W * A, T))
            if self.use_token_loss:
                out["token_logits"].append(
                    self.token_logits(f).reshape(Bf, H * W * A, T))
            if self.use_contrastive_align:
                from fiber_tpu.detection.contrastive import \
                    safe_l2_normalize
                q = safe_l2_normalize(
                    self.contrastive_align_projection_image(f).reshape(
                        Bf, H * W, A,
                        self.contrastive_hdim).astype(jnp.float32))
                # (B, HW, A, h) x (B, T, 1, h) -> (B, HW, A, T)
                cl = jnp.einsum("bqah,btzh->bqat", q, ct,
                                preferred_element_type=jnp.float32)
                cl = cl / jnp.exp(self.log_scale)
                out["contrastive_logits"].append(
                    cl.reshape(Bf, H * W * A, T))
        return out
