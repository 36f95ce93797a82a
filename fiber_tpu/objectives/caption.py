"""Caption generation: greedy and beam-search decoding as one jit program.

Behavioral spec: objectives.py:560-644 (caption_test_step): beam size 5,
length-normalized log-prob, the decoder re-encodes the full prefix each
step (the reference has no KV cache; with max_len <= 50 the prefix
re-encode is cheap relative to the image encoder, and keeping it makes
logits bit-identical to the reference protocol).  The whole decode loop
is a lax.scan inside jit — no per-token host round-trips, unlike the
reference's python loop.

Image features are encoded once (encode_image_caption) and reused every
step.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fiber_tpu.models.fiber import FiberCoarse

NEG_INF = -1e9


def _step_logits(model, variables, ids, mask, image_embeds, pos):
    """Run the causal decoder on the (padded) prefix, return logits at
    position `pos` (the next-token distribution)."""
    out = model.apply(variables, ids, mask, image_embeds,
                      method=FiberCoarse.infer_caption)
    logits = model.apply(variables, out["text_feats"],
                         method=FiberCoarse.mlm_logits)
    return logits[:, pos, :]  # (B, V)


@functools.partial(jax.jit, static_argnames=("model", "max_len"))
def greedy_decode(model: FiberCoarse, variables, image_embeds: jax.Array,
                  bos_id: int, eos_id: int, pad_id: int,
                  max_len: int) -> jax.Array:
    """(B, max_len) token ids, BOS-prefixed, EOS/PAD padded."""
    B = image_embeds.shape[0]
    ids0 = jnp.full((B, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    done0 = jnp.zeros((B,), bool)

    def body(state, t):
        ids, done = state
        mask = (ids != pad_id).astype(jnp.int32)
        logits = _step_logits(model, variables, ids, mask, image_embeds,
                              t - 1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        ids = ids.at[:, t].set(nxt)
        done = done | (nxt == eos_id)
        return (ids, done), None

    (ids, _), _ = jax.lax.scan(body, (ids0, done0),
                               jnp.arange(1, max_len))
    return ids


@functools.partial(jax.jit,
                   static_argnames=("model", "max_len", "beam_size"))
def beam_search_decode(model: FiberCoarse, variables,
                       image_embeds: jax.Array, bos_id: int, eos_id: int,
                       pad_id: int, max_len: int,
                       beam_size: int = 5,
                       length_penalty: float = 1.0
                       ) -> Tuple[jax.Array, jax.Array]:
    """Length-normalized beam search (ref objectives.py:576-635).

    Returns (ids (B, max_len) best beam, scores (B,)).
    """
    B = image_embeds.shape[0]
    K = beam_size
    V = None  # inferred from logits

    # expand image embeds per beam: (B*K, L, D)
    img = jnp.repeat(image_embeds, K, axis=0)
    ids0 = jnp.full((B * K, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    # beam 0 live, others -inf so the first expansion picks distinct tokens
    logp0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B,))
    done0 = jnp.zeros((B * K,), bool)

    def body(state, t):
        ids, logp, done = state
        mask = (ids != pad_id).astype(jnp.int32)
        logits = _step_logits(model, variables, ids, mask, img, t - 1)
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        Vn = lsm.shape[-1]
        # finished beams only extend with PAD at zero extra cost
        pad_only = jnp.full((Vn,), NEG_INF).at[pad_id].set(0.0)
        lsm = jnp.where(done[:, None], pad_only[None, :], lsm)
        cand = logp[:, None] + lsm                     # (B*K, V)
        cand = cand.reshape(B, K * Vn)
        top_logp, top_idx = jax.lax.top_k(cand, K)     # (B, K)
        beam_idx = top_idx // Vn + jnp.arange(B)[:, None] * K
        tok = (top_idx % Vn).astype(jnp.int32)
        ids = ids[beam_idx.reshape(-1)]
        ids = ids.at[:, t].set(tok.reshape(-1))
        done = done[beam_idx.reshape(-1)] | (tok.reshape(-1) == eos_id) \
            | (tok.reshape(-1) == pad_id)
        return (ids, top_logp.reshape(-1), done), None

    (ids, logp, done), _ = jax.lax.scan(body, (ids0, logp0, done0),
                                        jnp.arange(1, max_len))
    # length-normalized selection
    lengths = (ids != pad_id).sum(axis=-1).astype(jnp.float32)
    norm = logp / (lengths ** length_penalty)
    norm = norm.reshape(B, K)
    best = jnp.argmax(norm, axis=-1)
    ids = ids.reshape(B, K, max_len)[jnp.arange(B), best]
    return ids, norm[jnp.arange(B), best]


# ---------------------------------------------------------------------------
# KV-cached decoders — the fast path.  Each step embeds ONE token and
# attends over cached per-layer K/V (fiber.decode_caption_step), making a
# step O(L) instead of the reference's O(L^2) full-prefix re-encode.  The
# uncached decoders above are kept as the bit-parity oracle
# (test_caption_cache.py asserts identical tokens).
# ---------------------------------------------------------------------------
def _init_cache(model, variables, image_embeds, max_len):
    return model.apply(variables, image_embeds, max_len,
                       method=FiberCoarse.init_caption_cache)


def _cached_logits(model, variables, tok, pos, caches):
    return model.apply(variables, tok, pos, caches,
                       method=FiberCoarse.decode_caption_step)


@functools.partial(jax.jit, static_argnames=("model", "max_len"))
def greedy_decode_cached(model: FiberCoarse, variables,
                         image_embeds: jax.Array, bos_id: int, eos_id: int,
                         pad_id: int, max_len: int) -> jax.Array:
    """KV-cached greedy decode; token-identical to greedy_decode."""
    B = image_embeds.shape[0]
    caches = _init_cache(model, variables, image_embeds, max_len)
    ids0 = jnp.full((B, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    done0 = jnp.zeros((B,), bool)

    def body(state, t):
        ids, done, caches = state
        prev = jax.lax.dynamic_slice_in_dim(ids, t - 1, 1, axis=1)
        logits, caches = _cached_logits(model, variables, prev, t - 1,
                                        caches)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, nxt[:, None], t, axis=1)
        done = done | (nxt == eos_id)
        return (ids, done, caches), None

    (ids, _, _), _ = jax.lax.scan(body, (ids0, done0, caches),
                                  jnp.arange(1, max_len))
    return ids


@functools.partial(jax.jit,
                   static_argnames=("model", "max_len", "beam_size"))
def beam_search_decode_cached(model: FiberCoarse, variables,
                              image_embeds: jax.Array, bos_id: int,
                              eos_id: int, pad_id: int, max_len: int,
                              beam_size: int = 5,
                              length_penalty: float = 1.0
                              ) -> Tuple[jax.Array, jax.Array]:
    """KV-cached beam search; token-identical to beam_search_decode.

    Per step the per-layer self-attention caches are gathered along the
    winning beam indices (the image K/V are identical within a beam group
    and stay in place)."""
    B = image_embeds.shape[0]
    K = beam_size
    img = jnp.repeat(image_embeds, K, axis=0)
    caches = _init_cache(model, variables, img, max_len)
    ids0 = jnp.full((B * K, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    logp0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B,))
    done0 = jnp.zeros((B * K,), bool)

    def reorder(caches, beam_idx):
        flat = beam_idx.reshape(-1)
        return [{"self_kv": (c["self_kv"][0][flat], c["self_kv"][1][flat]),
                 "image_kv": c["image_kv"]} for c in caches]

    def body(state, t):
        ids, logp, done, caches = state
        prev = jax.lax.dynamic_slice_in_dim(ids, t - 1, 1, axis=1)
        logits, caches = _cached_logits(model, variables, prev, t - 1,
                                        caches)
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        Vn = lsm.shape[-1]
        pad_only = jnp.full((Vn,), NEG_INF).at[pad_id].set(0.0)
        lsm = jnp.where(done[:, None], pad_only[None, :], lsm)
        cand = (logp[:, None] + lsm).reshape(B, K * Vn)
        top_logp, top_idx = jax.lax.top_k(cand, K)
        beam_idx = top_idx // Vn + jnp.arange(B)[:, None] * K
        tok = (top_idx % Vn).astype(jnp.int32)
        ids = ids[beam_idx.reshape(-1)]
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, tok.reshape(-1, 1), t, axis=1)
        caches = reorder(caches, beam_idx)
        done = done[beam_idx.reshape(-1)] | (tok.reshape(-1) == eos_id) \
            | (tok.reshape(-1) == pad_id)
        return (ids, top_logp.reshape(-1), done, caches), None

    (ids, logp, done, _), _ = jax.lax.scan(body, (ids0, logp0, done0,
                                                  caches),
                                           jnp.arange(1, max_len))
    lengths = (ids != pad_id).sum(axis=-1).astype(jnp.float32)
    norm = (logp / (lengths ** length_penalty)).reshape(B, K)
    best = jnp.argmax(norm, axis=-1)
    ids = ids.reshape(B, K, max_len)[jnp.arange(B), best]
    return ids, norm[jnp.arange(B), best]


def caption_images(model: FiberCoarse, variables, images: jax.Array,
                   bos_id: int, eos_id: int, pad_id: int,
                   max_len: int = 20, beam_size: int = 5,
                   use_cache: bool = True):
    """Encode images once, then beam-decode (ref caption_test_step)."""
    img_emb = model.apply(variables, images,
                          method=FiberCoarse.encode_image_caption)
    decode = beam_search_decode_cached if use_cache else beam_search_decode
    return decode(model, variables, img_emb, bos_id, eos_id,
                  pad_id, max_len, beam_size)


# ---------------------------------------------------------------------------
# "Gold" caption loss (self-distillation), ref fiber_module.py:526-610
# ---------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("model", "min_prob", "train"))
def compute_caption_gold(model: FiberCoarse, variables, gold_variables,
                         batch, pad_id: int, min_prob: float = 0.1,
                         train: bool = True):
    """Weighted next-token CE where weights come from a frozen copy of
    the model ("gold" scorer, refreshed every update_freq steps by the
    trainer): weight = max(cum_future_prob * token_prob, min_prob).

    gold_variables: the frozen copy's params (the reference rebuilds
    copy_module every 1000 steps, fiber_module.py:536-545; here the
    caller swaps in fresh gold params on the same cadence — pure state,
    no module surgery)."""
    ids = batch["text_ids"]
    masks = batch["text_masks"]
    img_emb = model.apply(variables, batch["image"],
                          method=FiberCoarse.encode_image_caption,
                          deterministic=not train)
    out = model.apply(variables, ids, masks, img_emb,
                      method=FiberCoarse.infer_caption,
                      deterministic=not train)
    logits = model.apply(variables, out["text_feats"],
                         method=FiberCoarse.mlm_logits).astype(jnp.float32)

    labels = jnp.concatenate(
        [ids[:, 1:], jnp.full_like(ids[:, :1], pad_id)], axis=1)
    pad_mask = labels == pad_id

    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lsm, labels[..., None], -1)[..., 0]

    if not train:
        loss = nll.mean()
    else:
        # frozen-copy token probabilities
        g_emb = model.apply(gold_variables, batch["image"],
                            method=FiberCoarse.encode_image_caption)
        g_out = model.apply(gold_variables, ids, masks, g_emb,
                            method=FiberCoarse.infer_caption)
        g_logits = model.apply(gold_variables, g_out["text_feats"],
                               method=FiberCoarse.mlm_logits
                               ).astype(jnp.float32)
        g_probs = jnp.take_along_axis(
            jax.nn.softmax(g_logits, -1), labels[..., None], -1)[..., 0]
        g_probs = jnp.where(pad_mask, 0.0, g_probs)
        valid = (~pad_mask).astype(jnp.float32)
        # suffix cumulative mean probability (ref :563-575)
        rev_sum = jnp.cumsum(g_probs[:, ::-1], axis=1)
        rev_len = jnp.cumsum(valid[:, ::-1], axis=1)
        cum_prob = (rev_sum / jnp.maximum(rev_len, 1.0))[:, ::-1]
        weights = jnp.maximum(cum_prob * g_probs, min_prob)
        weights = jax.lax.stop_gradient(weights)
        per_seq = (weights * jnp.where(pad_mask, 0.0, nll)).sum(-1)
        loss = (per_seq / (pad_mask.sum(-1) + 1e-9)).mean()

    acc_valid = ~pad_mask
    acc = (jnp.where(acc_valid, logits.argmax(-1) == labels, False).sum()
           / jnp.maximum(acc_valid.sum(), 1))
    return {"caption_gold_loss": loss, "caption_gold_accuracy": acc}


# ---------------------------------------------------------------------------
# SCST (self-critical CIDEr optimization), ref objectives.py:712-896
# ---------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("model", "max_len", "num_samples",
                                    "mask_token_id"))
def sample_decode(model: FiberCoarse, variables, image_embeds: jax.Array,
                  rng: jax.Array, bos_id: int, eos_id: int, pad_id: int,
                  max_len: int, num_samples: int = 5,
                  mask_token_id: int = -1) -> jax.Array:
    """Multinomial rollouts for SCST: (B*num_samples, max_len) token ids.

    Matches the reference sampler semantics (objectives.py:733-800):
    samples from softmax at each step, the mask token is suppressed,
    finished sequences extend with PAD.
    """
    B = image_embeds.shape[0]
    K = num_samples
    img = jnp.repeat(image_embeds, K, axis=0)
    ids0 = jnp.full((B * K, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    done0 = jnp.zeros((B * K,), bool)

    def body(state, t):
        ids, done, rng = state
        rng, sub = jax.random.split(rng)
        mask = (ids != pad_id).astype(jnp.int32)
        logits = _step_logits(model, variables, ids, mask, img, t - 1)
        logits = logits.astype(jnp.float32)
        if mask_token_id >= 0:
            logits = logits.at[:, mask_token_id].set(-10000.0)
        nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        ids = ids.at[:, t].set(nxt)
        done = done | (nxt == eos_id) | (nxt == pad_id)
        return (ids, done, rng), None

    (ids, _, _), _ = jax.lax.scan(body, (ids0, done0, rng),
                                  jnp.arange(1, max_len))
    return ids


@functools.partial(jax.jit, static_argnames=("model", "alpha"))
def scst_loss(model: FiberCoarse, variables, images: jax.Array,
              sampled_ids: jax.Array, rewards: jax.Array,
              gt_ids: jax.Array, gt_masks: jax.Array,
              pad_id: int, alpha: float = 0.3) -> jax.Array:
    """alpha * MLE(gt) + (1-alpha) * policy-gradient with CIDEr rewards
    (ref objectives.py:800-830, 864-880).

    sampled_ids (B*K, L) from sample_decode; rewards (B*K,) CIDEr in
    [0, 10] (scaled x10 like the native scorer and the reference, which
    multiplies by 100 on 0-1 scores; here 10x on 0-10 = same scale).
    """
    B = images.shape[0]
    K = sampled_ids.shape[0] // B

    img_emb = model.apply(variables, images,
                          method=FiberCoarse.encode_image_caption)
    img_rep = jnp.repeat(img_emb, K, axis=0)
    masks = (sampled_ids != pad_id).astype(jnp.int32)
    out = model.apply(variables, sampled_ids, masks, img_rep,
                      method=FiberCoarse.infer_caption)
    logits = model.apply(variables, out["text_feats"],
                         method=FiberCoarse.mlm_logits).astype(jnp.float32)
    labels = jnp.concatenate(
        [sampled_ids[:, 1:], jnp.full_like(sampled_ids[:, :1], pad_id)],
        axis=1)
    logp = jnp.log(jax.nn.softmax(logits, axis=-1) + 1e-9)
    tok_logp = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    pad_mask = labels == pad_id
    tok_logp = jnp.where(pad_mask, 0.0, tok_logp)
    lens = (1.0 - pad_mask.astype(jnp.float32)).sum(-1)
    seq_logp = tok_logp.sum(-1) / (lens + 1e-9)           # (B*K,)
    # reference scales rewards to ~[0, 100]
    rl = (seq_logp * (100.0 - 10.0 * rewards)).sum() / B

    # MLE term on ground-truth captions
    gt_emb_out = model.apply(variables, gt_ids, gt_masks, img_emb,
                             method=FiberCoarse.infer_caption)
    gt_logits = model.apply(variables, gt_emb_out["text_feats"],
                            method=FiberCoarse.mlm_logits
                            ).astype(jnp.float32)
    gt_labels = jnp.concatenate(
        [gt_ids[:, 1:], jnp.full_like(gt_ids[:, :1], pad_id)], axis=1)
    gt_labels = jnp.where(gt_labels == pad_id, -100, gt_labels)
    from fiber_tpu.objectives.coarse import cross_entropy_ignore
    mle, _ = cross_entropy_ignore(gt_logits, gt_labels)
    return alpha * mle + (1.0 - alpha) * rl


def compute_caption_cider(model: FiberCoarse, variables, batch, scorer,
                          detokenize, rng, *, bos_id: int, eos_id: int,
                          pad_id: int, max_len: int = 50,
                          num_samples: int = 5, alpha: float = 0.3,
                          mask_token_id: int = -1):
    """Full SCST step: jit sampling -> host CIDEr reward (native C++
    scorer) -> jit loss.  `scorer` is fiber_tpu.native.CiderD built over
    the batch's GT captions; `detokenize(ids) -> token list` strips
    specials for reward computation."""
    images = batch["image"]
    B = images.shape[0]
    img_emb = model.apply(variables, images,
                          method=FiberCoarse.encode_image_caption)
    sampled = sample_decode(model, variables, img_emb, rng, bos_id,
                            eos_id, pad_id, max_len, num_samples,
                            mask_token_id)
    import numpy as np
    sampled_np = np.asarray(sampled)
    cands = {i: detokenize(sampled_np[i]) for i in range(len(sampled_np))}
    scores = scorer.score(cands)
    rewards = jnp.asarray([scores[i] for i in range(len(sampled_np))],
                          jnp.float32)
    loss = scst_loss(model, variables, images, sampled, rewards,
                     batch["text_ids"], batch["text_masks"], pad_id,
                     alpha)
    return {"caption_cider_loss": loss,
            "mean_reward": float(rewards.mean())}
