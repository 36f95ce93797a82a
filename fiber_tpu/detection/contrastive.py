"""MDETR contrastive-alignment + GLIP shallow contrastive losses.

Behavioral spec (reference, fine_grained/maskrcnn_benchmark):
* ``ContrastiveAlignLoss``        rpn/loss.py:560-581
* ``NllSoftMaxLoss``              rpn/loss.py:554-558
* shallow contrastive block       rpn/loss.py:903-1243 (zero-pads and
  random-negative-pads variants, single-process view of the all-gather)
* helpers                         utils/shallow_contrastive_loss_helper.py
* shallow projections + log scale rpn/loss.py:517-541
* contrastive-align head          rpn/vldyhead.py:692-698, 845-855

TPU-first redesign notes
------------------------
The reference pads every image's positive-anchor list to the *batch max*
(``max_anchor_num``) at trace time — a dynamic shape.  Here the selection
is a static ``top_k`` to a fixed ``max_anchors`` slot count with validity
masks; because padded rows carry a zero positive-map row and a -1e6 logit
mask, any ``max_anchors`` >= the true positive count produces bitwise the
same loss as the reference's dynamic padding (softmax contributions of
masked entries underflow to exactly 0 in fp32).

Under pjit the reference's ``gather_tensors`` all-gather is the identity:
these functions see the global batch, so the "N*B" gathered axes are just
the batch axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

MASK_FILL = -1000000.0   # ref loss.py:1165 masked_fill value


def safe_l2_normalize(x: jax.Array) -> jax.Array:
    """L2-normalize the last axis with torch.F.normalize's subgradient at
    exactly-zero rows (0, not the NaN jnp.linalg.norm produces — same
    fix as dyhead.py's dot-product head)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-24)
    return x / jnp.maximum(n, 1e-12)


def contrastive_align_loss(logits: jax.Array,
                           positive_map: jax.Array) -> jax.Array:
    """MDETR box<->token InfoNCE (ref loss.py:560-581).

    logits       (B, N, T) fp32 similarity logits
    positive_map (B, N, T) bool — token span of each anchor's matched gt
    Returns the summed (not averaged) loss; the caller divides by
    num_pos_avg per ref loss.py:1228.
    """
    logits = logits.astype(jnp.float32)
    pm = positive_map.astype(bool)
    pos_logits = jnp.where(pm, -logits, 0.0)

    boxes_with_pos = pm.any(axis=2)
    pos_term = pos_logits.sum(axis=2)
    neg_term = jax.nn.logsumexp(logits, axis=2)
    nb_pos = pm.sum(axis=2) + 1e-6
    box_to_token = jnp.where(boxes_with_pos,
                             pos_term / nb_pos + neg_term, 0.0).sum()

    tokens_with_pos = pm.any(axis=1)
    pos_term_t = pos_logits.sum(axis=1)
    neg_term_t = jax.nn.logsumexp(logits, axis=1)
    nb_pos_t = pm.sum(axis=1) + 1e-6
    token_to_box = jnp.where(tokens_with_pos,
                             pos_term_t / nb_pos_t + neg_term_t, 0.0).sum()
    return (box_to_token + token_to_box) / 2.0


def nll_softmax_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """-target * log_softmax(logits, -1), elementwise (ref loss.py:554-558)."""
    return -target * jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def normalized_positive_map(pm: jax.Array) -> jax.Array:
    """Row-normalize over the last axis; zero rows use a 1e-6 denominator
    (ref shallow_contrastive_loss_helper.py:5-10)."""
    pm = pm.astype(jnp.float32)
    denom = pm.sum(axis=-1)
    denom = jnp.where(denom == 0, 1e-6, denom)
    return pm / denom[..., None]


def select_shallow_anchors(pos_mask: jax.Array, assigned_gt: jax.Array,
                           max_anchors: int
                           ) -> Tuple[jax.Array, jax.Array]:
    """Static top-k replacement for the reference's per-image positive
    index lists (ref loss.py:944-961).

    Reference quirk replicated: the positive set is
    ``torch.nonzero(anchors_to_gt_indexs)`` (loss.py:757-759), i.e.
    anchors whose *matched gt index* is non-zero — positives matched to
    gt slot 0 are dropped.  Returns (idx (B, K) int32, is_pos (B, K)
    bool); positives come first in ascending anchor order (the reference
    keeps ``sorted`` index lists), pad slots continue with ascending-index
    non-positives (used only by the random-negative-pads variant; the
    reference samples them randomly — deterministic here).
    """
    B, N = pos_mask.shape
    shallow_pos = pos_mask & (assigned_gt != 0)
    base = jnp.arange(N, 0, -1, dtype=jnp.int32)        # ascending-index pref
    score = jnp.where(shallow_pos, base + N, base)
    _, idx = jax.lax.top_k(score, max_anchors)
    is_pos = jnp.take_along_axis(shallow_pos, idx, axis=1)
    return idx.astype(jnp.int32), is_pos


class ShallowProjections(nn.Module):
    """Learnable pieces of the shallow contrastive loss: the image/text
    projections + temperature (ref loss.py:517-541).  Runs inside the
    detector's forward so flax init sees the params; projecting every
    anchor position before the loss's row-gather is exactly equivalent to
    the reference's gather-then-project (Dense rows are independent)."""

    hdim: int = 64                       # SHALLOW_CONTRASTIVE_HIDDEN_DIM
    log_scale_init: float = 0.0          # MODEL.DYHEAD.SHALLOW_LOG_SCALE

    @nn.compact
    def __call__(self, img_feats: jax.Array, lang_emb: jax.Array):
        img_proj = nn.Dense(self.hdim, dtype=jnp.float32,
                            name="projection_image")
        txt_proj = nn.Dense(self.hdim, dtype=jnp.float32,
                            name="projection_text")
        log_scale = self.param("shallow_log_scale",
                               nn.initializers.constant(self.log_scale_init),
                               (1,), jnp.float32)

        qi = safe_l2_normalize(
            img_proj(img_feats.astype(jnp.float32)))       # (B, N, h)
        qt = safe_l2_normalize(
            txt_proj(lang_emb.astype(jnp.float32)))        # (B, T, h)
        return qi, qt, log_scale


def shallow_contrastive_loss(qi: jax.Array,     # (B, N, h) norm'd img proj
                             qt: jax.Array,     # (B, T, h) norm'd txt proj
                             log_scale: jax.Array,
                             text_masks: jax.Array,         # (B, T) 0/1
                             sel_idx: jax.Array,            # (B, K)
                             sel_is_pos: jax.Array,         # (B, K) bool
                             assigned_gt: jax.Array,        # (B, N)
                             positive_map: jax.Array,       # (B, G, T)
                             gt_od_labels: jax.Array,       # (B, G)
                             od_label_of_tokens: jax.Array,  # (B, T)
                             num_pos_avg: jax.Array,
                             zero_pads: bool = False) -> jax.Array:
    """Batch-global NCE of the shallow contrastive loss (ref
    loss.py:1066-1243).  ``zero_pads=True`` is USE_SHALLOW_ZERO_PADS (pad
    slots masked out); ``False`` keeps pad slots as real negative anchors
    with no image mask (the reference default)."""
    B, _, h = qi.shape
    T = qt.shape[1]
    K = sel_idx.shape[1]

    qi = jnp.take_along_axis(qi, sel_idx[..., None], axis=1)  # (B, K, h)
    if zero_pads:
        qi = jnp.where(sel_is_pos[..., None], qi, 0.0)

    logits = jnp.einsum("bkh,cth->bkct", qi, qt,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.exp(log_scale)
    logits = logits.reshape(B * K, B * T)

    # masks (ref loss.py:1164-1178): text cols always, image rows only
    # in the zero-pads variant
    tmask = text_masks.reshape(B * T).astype(bool)
    logits = jnp.where(tmask[None, :], logits, MASK_FILL)
    if zero_pads:
        imask = sel_is_pos.reshape(B * K)
        logits = jnp.where(imask[:, None], logits, MASK_FILL)

    # positive map F (B*K, B*T) (ref loss.py:1009-1046): od-label
    # equality across the batch, own-text block overridden by the
    # matched token spans; pad slots carry od label -100 / zero rows
    sel_gt = jnp.take_along_axis(assigned_gt, sel_idx, axis=1)  # (B, K)
    pred_od = jnp.take_along_axis(gt_od_labels, sel_gt, axis=1)
    pred_od = jnp.where(sel_is_pos, pred_od, -100)              # (B, K)
    od_match = (pred_od.reshape(B * K)[:, None]
                == od_label_of_tokens.reshape(B * T)[None, :])
    map_sel = jnp.take_along_axis(
        positive_map.astype(bool),
        jnp.broadcast_to(sel_gt[..., None],
                         (B, K, T)), axis=1)
    map_sel = map_sel & sel_is_pos[..., None]                   # (B, K, T)
    own = jnp.repeat(jnp.eye(B, dtype=bool), K,
                     axis=0).reshape(B * K, B)                  # row blocks
    own = jnp.repeat(own, T, axis=1)                            # (BK, BT)
    map_tiled = jnp.broadcast_to(
        map_sel[:, :, None, :], (B, K, B, T)).reshape(B * K, B * T)
    F = jnp.where(own, map_tiled, od_match)

    # two softmax directions (ref loss.py:1180-1243)
    img_side = nll_softmax_loss(logits, normalized_positive_map(F)).sum()
    txt_side = nll_softmax_loss(
        logits.T, normalized_positive_map(F.T)).sum()
    return (img_side + txt_side) / 2.0 / num_pos_avg
