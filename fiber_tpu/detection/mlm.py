"""GLIP-style MLM pretext for the fine-grained (detection) stack.

Behavioral spec: generalized_vl_rcnn.py:27-61 (`random_word` masking with
greenlight maps) and vldyhead.py:751-756, 776-777, 1075-1078 (the
BertLMPredictionHead over the embedded language features + CE loss with
-100 ignore, scaled by MLM_LOSS_COEF).  Default-off in FIBER configs
(defaults.py:516) but part of the reference capability surface.

The reference draws python `random.random()` per position; here the same
decision tree runs vectorized on uniform draws so it jit-compiles:

    greenlight == -1       -> never masked, label -100
    token == pad           -> never masked, label -100
    u >= 0.15              -> unmasked, label -100
    u < 0.15:  u/0.15<0.8  -> <mask> token      } label = original id
               u/0.15<0.9  -> random vocab token } (then zeroed to -100
               else        -> unchanged          }  wherever greenlight
                                                    != 1, if map given)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = -100


def random_word_mask(rng: jax.Array, input_ids: jax.Array,
                     mask_token_id: int, vocab_size: int,
                     pad_token_id: int,
                     greenlight_map: Optional[jax.Array] = None,
                     mask_prob: float = 0.15,
                     probs: Optional[jax.Array] = None,
                     rand_tokens: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Vectorized `random_word` (generalized_vl_rcnn.py:27-61).

    input_ids: (B, T) int32; greenlight_map: (B, T) in {-1, 0, 1} or
    None.  `probs`/`rand_tokens` exist so parity tests can feed the
    reference's exact random draws.  Returns (masked_ids, labels).
    """
    k1, k2 = jax.random.split(rng)
    if probs is None:
        probs = jax.random.uniform(k1, input_ids.shape)
    if rand_tokens is None:
        rand_tokens = jax.random.randint(k2, input_ids.shape, 0,
                                         vocab_size)

    not_pad = input_ids != pad_token_id
    can_mask = not_pad & (probs < mask_prob)
    if greenlight_map is not None:
        can_mask = can_mask & (greenlight_map != -1)

    sub = probs / mask_prob
    replacement = jnp.where(
        sub < 0.8, jnp.full_like(input_ids, mask_token_id),
        jnp.where(sub < 0.9, rand_tokens, input_ids))
    masked_ids = jnp.where(can_mask, replacement, input_ids)

    labels = jnp.where(can_mask, input_ids, IGNORE_INDEX)
    if greenlight_map is not None:
        labels = jnp.where(greenlight_map != 1, IGNORE_INDEX, labels)
    return masked_ids, labels


def create_greenlight_map(spans: Sequence[Tuple[int, ...]],
                          offsets: Sequence[Tuple[int, int]],
                          max_len: int = 256) -> np.ndarray:
    """Char spans -> (max_len,) greenlight map
    (modulated_coco.py:538-574 create_greenlight_map).

    spans: [(beg, end), ...] char spans whose tokens may be masked AND
    scored; a 3-tuple entry makes the whole caption unmaskable (-1).
    offsets: per-token (char_start, char_end) from the tokenizer
    (char_end exclusive; (0, 0) for special tokens).
    """
    gmap = np.zeros(max_len, np.float32)

    def char_to_token(pos: int) -> Optional[int]:
        for ti, (s, e) in enumerate(offsets):
            if s <= pos < e and e > s:
                return ti
        return None

    for item in spans:
        if len(item) != 2:
            gmap[:] = -1
            break
        beg, end = item
        beg_pos = char_to_token(beg)
        if beg_pos is None:
            beg_pos = char_to_token(beg + 1)
            if beg_pos is None:
                beg_pos = char_to_token(beg + 2)
        end_pos = char_to_token(end - 1)
        if end_pos is None:
            end_pos = char_to_token(end - 2)
            if end_pos is None:
                end_pos = char_to_token(end - 3)
        if beg_pos is None or end_pos is None:
            continue
        gmap[beg_pos:end_pos + 1] = 1
    return gmap


def mlm_loss(mlm_logits: jax.Array, mlm_labels: jax.Array,
             coef: float = 1.0) -> jax.Array:
    """CE with -100 ignore x MLM_LOSS_COEF (vldyhead.py:1075-1078)."""
    logits = mlm_logits.astype(jnp.float32)
    valid = mlm_labels != IGNORE_INDEX
    safe = jnp.where(valid, mlm_labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom * coef
