"""Fine-grained MLM pretext parity + integration.

Pins random_word_mask against the reference's `random_word`
(generalized_vl_rcnn.py:27-61) executed in-process with its python
`random` draws captured and replayed, pins create_greenlight_map against
modulated_coco.py:538-574, and runs one tiny train step with mlm_loss on.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fiber_tpu.detection import mlm as my_mlm  # noqa: E402

from reference_loader_det import setup_fine_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    setup_fine_reference()
    return True


@pytest.mark.parametrize("use_map", [False, True])
def test_random_word_parity(ref, use_map):
    import random as pyrandom

    from maskrcnn_benchmark.modeling.detector.generalized_vl_rcnn import \
        random_word

    rng = np.random.default_rng(0)
    B, T = 4, 24
    PAD, MASK, V = 1, 90, 99
    ids = rng.integers(3, V, (B, T))
    ids[:, -4:] = PAD
    gmap = rng.choice([-1, 0, 1], (B, T)) if use_map else None

    probs = rng.uniform(0, 1, (B, T))
    rand_tok = int(rng.integers(3, V))

    # replay the exact uniform sequence into the reference's loop; its
    # random.choice(vocabs) is pinned to a single-token vocab list
    seq = iter(probs.reshape(-1).tolist())
    orig_random = pyrandom.random
    pyrandom.random = lambda: next(seq)
    try:
        ref_ids, ref_labels = random_word(
            torch.as_tensor(ids.copy()), MASK, [rand_tok], PAD,
            torch.as_tensor(gmap) if use_map else None)
    finally:
        pyrandom.random = orig_random

    my_ids, my_labels = my_mlm.random_word_mask(
        jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32), MASK, V, PAD,
        jnp.asarray(gmap) if use_map else None,
        probs=jnp.asarray(probs),
        rand_tokens=jnp.full((B, T), rand_tok, jnp.int32))

    np.testing.assert_array_equal(np.asarray(my_ids), ref_ids.numpy())
    np.testing.assert_array_equal(np.asarray(my_labels),
                                  ref_labels.numpy())


def test_greenlight_map_parity(ref):
    from maskrcnn_benchmark.data.datasets.modulated_coco import \
        create_greenlight_map

    class FakeTokenized:
        """char_to_token backed by an offsets table (the hf tokenizer
        contract: None outside any token span)."""

        def __init__(self, offsets):
            self.offsets = offsets

        def char_to_token(self, pos):
            for ti, (s, e) in enumerate(self.offsets):
                if s <= pos < e and e > s:
                    return ti
            return None

    # "a cat. red dog." -> tokens with char offsets incl. special (0,0)
    offsets = [(0, 0), (0, 1), (2, 5), (5, 6), (7, 10), (11, 14),
               (14, 15), (0, 0)]
    cases = [
        [(2, 6)],                 # "cat."
        [(0, 6), (7, 15)],        # two spans
        [(2, 6), (-1, -1, -1)],   # special all-unmaskable entry
        [(16, 20)],               # out-of-range span -> skipped
    ]
    for spans in cases:
        ref_map = create_greenlight_map(spans, FakeTokenized(offsets))
        mine = my_mlm.create_greenlight_map(spans, offsets, max_len=256)
        np.testing.assert_array_equal(mine, ref_map.numpy(), err_msg=str(
            spans))


def test_mlm_train_step_finite():
    """One tiny detection loss eval with mlm_loss on: finite mlm_loss
    that responds to the greenlight map."""
    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector,
                                              detection_loss)

    cfg = DetectorConfig.tiny_test(mlm_loss=True, mask_token_id=90,
                                   pad_token_id=1)
    model = GroundingDetector(cfg)
    rng = np.random.default_rng(0)
    B, T, G = 2, cfg.max_query_len, 3
    H, W = cfg.image_size
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(3, cfg.vocab_size - 5, (B, T)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.stack([np.array([[2, 2, 20, 20], [5, 8, 30, 40],
                                [10, 10, 50, 50]])] * B), jnp.float32),
        "gt_valid": jnp.ones((B, G), bool),
        "positive_map": jnp.asarray(rng.uniform(0, 1, (B, G, T)) < 0.1,
                                    jnp.float32),
        "greenlight_map": jnp.ones((B, T), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["input_ids"], batch["attention_mask"])
    losses = detection_loss(model, variables, batch, train=True,
                            rngs={"dropout": jax.random.PRNGKey(9)},
                            mlm_rng=jax.random.PRNGKey(3))
    assert "mlm_loss" in losses
    assert np.isfinite(float(losses["mlm_loss"]))
    assert float(losses["mlm_loss"]) > 0
    # all-greenlight -1 -> no position scored -> zero loss
    batch2 = dict(batch)
    batch2["greenlight_map"] = -jnp.ones((B, T), jnp.int32)
    losses2 = detection_loss(model, variables, batch2, train=True,
                             rngs={"dropout": jax.random.PRNGKey(9)},
                             mlm_rng=jax.random.PRNGKey(3))
    assert float(losses2["mlm_loss"]) == 0.0
