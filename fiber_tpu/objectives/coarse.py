"""Coarse-grained training objectives as pure jit-compilable functions.

Behavioral spec: coarse_grained/fiber/modules/objectives.py.  Written for
pjit's global view: where the reference all-gathers across DDP ranks
(queue enqueue, fiber_module.py:181-222), these functions operate on the
global batch and let XLA insert ICI collectives from the sharding
annotations on the inputs.

Each function takes the flax module + variables and a batch dict with:
  image:        (B, S, S, 3) float   NHWC, normalized
  text_ids:     (B, L) int32
  text_masks:   (B, L) int32
  text_ids_mlm / text_labels_mlm     (for MLM; labels use -100 ignore)
  vqa_targets:  (B, num_answers) float soft scores        (VQA)
  image_0/image_1, answers                               (NLVR2)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.parallel.itc_queue import ItcQueue

IGNORE_INDEX = -100


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = IGNORE_INDEX
                         ) -> Tuple[jax.Array, jax.Array]:
    """Mean CE over positions whose label != ignore_index.

    Returns (loss, accuracy) computed in fp32.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, nll, 0.0).sum() / denom
    acc = (jnp.where(valid, logits.argmax(-1) == safe, False).sum()
           / denom)
    return loss, acc


# ---------------------------------------------------------------------------
def compute_mlm(model: FiberCoarse, variables, batch, *, rngs=None,
                train: bool = True) -> Dict[str, jax.Array]:
    out = model.apply(variables, batch["image"], batch["text_ids_mlm"],
                      batch["text_masks"], method=FiberCoarse.infer,
                      deterministic=not train, rngs=rngs)
    logits = model.apply(variables, out["text_feats"],
                         method=FiberCoarse.mlm_logits)
    loss, acc = cross_entropy_ignore(logits, batch["text_labels_mlm"])
    return {"mlm_loss": loss, "mlm_accuracy": acc}


# ---------------------------------------------------------------------------
def compute_itc(model: FiberCoarse, variables, batch, queue: ItcQueue,
                rng: jax.Array, *, rngs=None, train: bool = True):
    """ALBEF-style contrastive loss with queue + hard-negative mining
    (ref: objectives.py:119-180).

    Returns (out_dict, new_queue, negatives) where negatives carries the
    mined hard negatives for compute_itm_hardneg.
    """
    img = batch["image"]
    ids = batch["text_ids"]
    masks = batch["text_masks"]
    B = img.shape[0]

    img_out = model.apply(variables, img, method=FiberCoarse.encode_image_itc,
                          deterministic=not train, rngs=rngs)
    txt_out = model.apply(variables, ids, masks,
                          method=FiberCoarse.encode_text_itc,
                          deterministic=not train, rngs=rngs)
    image_feat = img_out["cls_feats"].astype(jnp.float32)   # (B, hs)
    text_feat = txt_out["cls_feats"].astype(jnp.float32)

    temp = model.apply(variables, method=FiberCoarse.itc_temperature)

    sg = jax.lax.stop_gradient
    # columns: [current global batch | full queue] — the unfilled random
    # queue slots intentionally participate in the denominator, matching the
    # reference (objectives.py:128-131 uses the whole 4096-slot buffer).
    text_all = jnp.concatenate([sg(text_feat), queue.text_feats], axis=0)
    image_all = jnp.concatenate([sg(image_feat), queue.image_feats], axis=0)

    sim_i2t = image_feat @ text_all.T / temp     # (B, B+Q)
    sim_t2i = text_feat @ image_all.T / temp

    labels = jnp.arange(B)
    loss_i2t = -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(sim_i2t, -1),
                            labels[:, None], 1))
    loss_t2i = -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(sim_t2i, -1),
                            labels[:, None], 1))
    itc_loss = 0.5 * (loss_i2t + loss_t2i)

    # ---- hard-negative mining (no grad), ref objectives.py:143-170 -------
    valid = B + queue.valid_count()              # usable columns
    col = jnp.arange(B + queue.size)
    col_ok = col[None, :] < valid                # (1, B+Q)
    diag = col[None, :B + queue.size] == labels[:, None]
    neg_inf = jnp.float32(-1e30)

    def mine(sim, key):
        logits = sg(sim)
        logits = jnp.where(col_ok & ~diag, logits, neg_inf)
        return jax.random.categorical(key, logits, axis=-1)   # (B,)

    k1, k2 = jax.random.split(rng)
    idx_t2i = mine(sim_t2i, k1)   # hard negative images for each text
    idx_i2t = mine(sim_i2t, k2)   # hard negative texts for each image

    # Gather the mined negatives' raw inputs from [batch | queue] WITHOUT
    # materializing the concatenation: the raw-image queue is ~3.6 GB at
    # 4096 x 384^2 bf16, and concat+take forced a full extra copy that
    # pushed the B=8 step past the compiler's memory budget (round-3
    # bisect).  Two bounded gathers + a select touch only B rows.
    def dual_gather(batch_arr, queue_arr, idx):
        from_batch = jnp.take(batch_arr, jnp.clip(idx, 0, B - 1), axis=0)
        from_queue = jnp.take(queue_arr,
                              jnp.clip(idx - B, 0, queue.size - 1), axis=0)
        sel = (idx < B).reshape((-1,) + (1,) * (batch_arr.ndim - 1))
        return jnp.where(sel, from_batch,
                         from_queue.astype(batch_arr.dtype))

    negatives = {
        "image_neg": dual_gather(img, queue.image_inputs,
                                 idx_t2i).astype(img.dtype),
        "text_neg": dual_gather(ids, queue.text_inputs, idx_i2t),
        "text_mask_neg": dual_gather(masks, queue.text_masks, idx_i2t),
    }

    new_queue = queue.enqueue(image_feat, text_feat, img, ids, masks) \
        if train else queue
    return {"itc_loss": itc_loss}, new_queue, negatives


# ---------------------------------------------------------------------------
def compute_itm_hardneg(model: FiberCoarse, variables, batch, negatives, *,
                        rngs=None, train: bool = True,
                        chunk: bool = False) -> Dict[str, jax.Array]:
    """ITM on [pos | text-neg | image-neg] triple batch
    (ref: objectives.py:78-116).

    chunk=True runs the three groups through a lax.scan of B-image
    forwards instead of one 3B-image forward — identical losses when
    deterministic (the encoder is batch-independent; dropout draws differ
    per group, which only changes the stochastic sampling).  This keeps
    the largest compiled forward at B images, which is what lets
    micro-batch 8 compile on the tunneled v5e runtime (the 24-image
    monolithic forward crashes its compile helper, docs/ROUND2_NOTES.md).
    """
    img = batch["image"]
    ids = batch["text_ids"]
    masks = batch["text_masks"]
    B = img.shape[0]

    labels = jnp.concatenate(
        [jnp.ones((B,), jnp.int32), jnp.zeros((2 * B,), jnp.int32)])

    if chunk:
        images3 = jnp.stack([img, img, negatives["image_neg"]])
        ids3 = jnp.stack([ids, negatives["text_neg"], ids])
        masks3 = jnp.stack([masks, negatives["text_mask_neg"], masks])
        if rngs:
            keys = {k: jax.random.split(v, 3) for k, v in rngs.items()}
        else:
            keys = {}

        def body(_, xs):
            im, ti, tm, ks = xs
            out = model.apply(variables, im, ti, tm,
                              method=FiberCoarse.infer,
                              deterministic=not train, rngs=ks or None)
            lg = model.apply(variables, out["cls_feats"],
                             method=FiberCoarse.itm_logits)
            return None, lg

        _, logits3 = jax.lax.scan(body, None, (images3, ids3, masks3, keys))
        logits = logits3.reshape(3 * B, logits3.shape[-1])
    else:
        images = jnp.concatenate([img, img, negatives["image_neg"]], axis=0)
        text_ids = jnp.concatenate([ids, negatives["text_neg"], ids], axis=0)
        text_masks = jnp.concatenate(
            [masks, negatives["text_mask_neg"], masks], axis=0)
        out = model.apply(variables, images, text_ids, text_masks,
                          method=FiberCoarse.infer, deterministic=not train,
                          rngs=rngs)
        logits = model.apply(variables, out["cls_feats"],
                             method=FiberCoarse.itm_logits)
    loss, acc = cross_entropy_ignore(logits, labels)
    return {"itm_loss": loss, "itm_accuracy": acc}


def compute_itm_random(model: FiberCoarse, variables, batch, rng, *,
                       rngs=None, train: bool = True) -> Dict[str, jax.Array]:
    """ITM with in-batch random false images (ref: objectives.py:44-75).

    Instead of a pre-drawn `false_image_0`, rolls the batch by a random
    non-zero offset to produce mismatched pairs — equivalent sampling under
    a shuffled loader, with no extra data plumbing.
    """
    img = batch["image"]
    B = img.shape[0]
    k1, k2 = jax.random.split(rng)
    offset = jax.random.randint(k1, (), 1, B)
    false_img = jnp.roll(img, offset, axis=0)
    labels = jax.random.bernoulli(k2, 0.5, (B,)).astype(jnp.int32)
    mixed = jnp.where(labels[:, None, None, None] == 1, img, false_img)

    out = model.apply(variables, mixed, batch["text_ids"],
                      batch["text_masks"], method=FiberCoarse.infer,
                      deterministic=not train, rngs=rngs)
    logits = model.apply(variables, out["cls_feats"],
                         method=FiberCoarse.itm_logits)
    loss, acc = cross_entropy_ignore(logits, labels)
    return {"itm_loss": loss, "itm_accuracy": acc}


# ---------------------------------------------------------------------------
def compute_vqa(model: FiberCoarse, variables, batch, *, rngs=None,
                train: bool = True) -> Dict[str, jax.Array]:
    """BCE over 3129 answers, scaled by label count (ref: objectives.py:182)."""
    out = model.apply(variables, batch["image"], batch["text_ids"],
                      batch["text_masks"], method=FiberCoarse.infer,
                      deterministic=not train, rngs=rngs)
    logits = model.apply(variables, out["cls_feats"],
                         method=FiberCoarse.vqa_logits).astype(jnp.float32)
    targets = batch["vqa_targets"].astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce.mean() * targets.shape[1]
    # VQA score: soft target mass at the argmax answer
    score = jnp.take_along_axis(targets, logits.argmax(-1)[:, None],
                                axis=1).mean()
    return {"vqa_loss": loss, "vqa_score": score}


def compute_nlvr2(model: FiberCoarse, variables, batch, *, rngs=None,
                  train: bool = True) -> Dict[str, jax.Array]:
    """Two-image reasoning (ref: objectives.py:215-262)."""
    out1 = model.apply(variables, batch["image_0"], batch["text_ids"],
                       batch["text_masks"], method=FiberCoarse.infer,
                       deterministic=not train, rngs=rngs)
    out2 = model.apply(variables, batch["image_1"], batch["text_ids"],
                       batch["text_masks"], method=FiberCoarse.infer,
                       deterministic=not train, rngs=rngs)
    cls = jnp.concatenate([out1["cls_feats"], out2["cls_feats"]], axis=-1)
    logits = model.apply(variables, cls, method=FiberCoarse.nlvr2_logits)
    loss, acc = cross_entropy_ignore(logits, batch["answers"])
    return {"nlvr2_loss": loss, "nlvr2_accuracy": acc}


# ---------------------------------------------------------------------------
def compute_caption_mle(model: FiberCoarse, variables, batch, *,
                        pad_token_id: int = 1, rngs=None,
                        train: bool = True) -> Dict[str, jax.Array]:
    """Next-token CE with labels shifted left, pad -> ignore
    (ref: objectives.py:682-710)."""
    img_emb = model.apply(variables, batch["image"],
                          method=FiberCoarse.encode_image_caption,
                          deterministic=not train, rngs=rngs)
    out = model.apply(variables, batch["text_ids"], batch["text_masks"],
                      img_emb, method=FiberCoarse.infer_caption,
                      deterministic=not train, rngs=rngs)
    logits = model.apply(variables, out["text_feats"],
                         method=FiberCoarse.mlm_logits)
    ids = batch["text_ids"]
    labels = jnp.concatenate(
        [ids[:, 1:], jnp.full_like(ids[:, :1], pad_token_id)], axis=1)
    labels = jnp.where(labels == pad_token_id, IGNORE_INDEX, labels)
    loss, acc = cross_entropy_ignore(logits, labels)
    return {"caption_mle_loss": loss, "caption_mle_accuracy": acc}


# ---------------------------------------------------------------------------
def pretrain_losses(model: FiberCoarse, variables, batch, queue: ItcQueue,
                    rng: jax.Array, loss_names, *, rngs=None,
                    train: bool = True, itm_hardneg_chunk: bool = False):
    """MLM + ITC (+queue) + hard-neg ITM, summed like training_step
    (ref: fiber_module.py:431-478)."""
    out: Dict[str, jax.Array] = {}
    negatives = None
    new_queue = queue
    if "mlm" in loss_names:
        out.update(compute_mlm(model, variables, batch, rngs=rngs,
                               train=train))
    if "itc" in loss_names:
        rng, sub = jax.random.split(rng)
        itc_out, new_queue, negatives = compute_itc(
            model, variables, batch, queue, sub, rngs=rngs, train=train)
        out.update(itc_out)
    if "itm" in loss_names:
        if negatives is not None:
            out.update(compute_itm_hardneg(model, variables, batch,
                                           negatives, rngs=rngs,
                                           train=train,
                                           chunk=itm_hardneg_chunk))
        else:
            rng, sub = jax.random.split(rng)
            out.update(compute_itm_random(model, variables, batch, sub,
                                          rngs=rngs, train=train))
    if "vqa" in loss_names:
        out.update(compute_vqa(model, variables, batch, rngs=rngs,
                               train=train))
    if "nlvr2" in loss_names:
        out.update(compute_nlvr2(model, variables, batch, rngs=rngs,
                                 train=train))
    if "caption_mle" in loss_names:
        out.update(compute_caption_mle(model, variables, batch, rngs=rngs,
                                       train=train))
    total = sum(v for k, v in out.items() if k.endswith("_loss"))
    return total, out, new_queue
