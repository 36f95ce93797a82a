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


def caption_images(model: FiberCoarse, variables, images: jax.Array,
                   bos_id: int, eos_id: int, pad_id: int,
                   max_len: int = 20, beam_size: int = 5):
    """Encode images once, then beam-decode (ref caption_test_step)."""
    img_emb = model.apply(variables, images,
                          method=FiberCoarse.encode_image_caption)
    return beam_search_decode(model, variables, img_emb, bos_id, eos_id,
                              pad_id, max_len, beam_size)
