"""KV-cached decoding must be token-identical to the full-prefix re-encode
oracle (the reference protocol, objectives.py:560-644)."""

import numpy as np

import jax
import jax.numpy as jnp

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.objectives.caption import (beam_search_decode,
                                          beam_search_decode_cached,
                                          greedy_decode,
                                          greedy_decode_cached)

BOS, EOS, PAD = 0, 2, 1
MAX_LEN = 8


def _setup():
    cfg = FiberConfig.tiny_test(loss_names=("caption_mle",))
    model = FiberCoarse(cfg)
    B = 2
    img = jax.random.normal(jax.random.PRNGKey(0),
                            (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), img, ids,
                           jnp.ones_like(ids), method=FiberCoarse.init_full)
    img_emb = model.apply(variables, img,
                          method=FiberCoarse.encode_image_caption)
    return cfg, model, variables, img_emb


def test_greedy_cached_matches_oracle():
    cfg, model, variables, img_emb = _setup()
    ref = greedy_decode(model, variables, img_emb, BOS, EOS, PAD, MAX_LEN)
    got = greedy_decode_cached(model, variables, img_emb, BOS, EOS, PAD,
                               MAX_LEN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_beam_cached_matches_oracle():
    cfg, model, variables, img_emb = _setup()
    ref_ids, ref_scores = beam_search_decode(
        model, variables, img_emb, BOS, EOS, PAD, MAX_LEN, beam_size=3)
    got_ids, got_scores = beam_search_decode_cached(
        model, variables, img_emb, BOS, EOS, PAD, MAX_LEN, beam_size=3)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(ref_scores), rtol=1e-4)
