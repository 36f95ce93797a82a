"""SCST caption-CIDEr objective end-to-end (tiny model + native scorer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.objectives import caption as cap

native = pytest.importorskip("fiber_tpu.native")


def test_scst_end_to_end():
    cfg = FiberConfig.tiny_test(loss_names=("caption_cider",))
    model = FiberCoarse(cfg)
    rng = jax.random.PRNGKey(0)
    B = 2
    img = jax.random.normal(rng, (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32)
    msk = jnp.ones((B, cfg.max_text_len), jnp.int32)
    variables = model.init(rng, img, ids, msk,
                           method=FiberCoarse.init_full)

    K = 2
    # reference captions per sampled row (B*K rows -> image i = row // K)
    gt_tokens = {0: [[5, 6, 7, 8]], 1: [[5, 6, 7, 8]],
                 2: [[9, 10, 11]], 3: [[9, 10, 11]]}
    scorer = native.CiderD(gt_tokens)

    def detok(row):
        return [int(t) for t in row if t not in (0, 1, 2)]

    batch = {"image": img, "text_ids": ids, "text_masks": msk}
    out = cap.compute_caption_cider(
        model, variables, batch, scorer, detok, jax.random.PRNGKey(1),
        bos_id=0, eos_id=2, pad_id=1, max_len=6, num_samples=K,
        mask_token_id=4)
    assert np.isfinite(out["caption_cider_loss"])
    assert 0.0 <= out["mean_reward"] <= 10.0

    # gradient flows through the policy term
    def loss_fn(params):
        sampled = cap.sample_decode(model, {"params": params},
                                    model.apply({"params": params}, img,
                                                method=FiberCoarse.
                                                encode_image_caption),
                                    jax.random.PRNGKey(2), 0, 2, 1, 6, K, 4)
        rewards = jnp.ones((B * K,), jnp.float32)
        return cap.scst_loss(model, {"params": params}, img,
                             jax.lax.stop_gradient(sampled), rewards,
                             ids, msk, 1)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


def test_caption_gold_end_to_end():
    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse
    cfg = FiberConfig.tiny_test(loss_names=("caption_gold",))
    model = FiberCoarse(cfg)
    rng = jax.random.PRNGKey(0)
    B = 2
    img = jax.random.normal(rng, (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32).at[:, -2:].set(1)
    msk = (ids != 1).astype(jnp.int32)
    variables = model.init(rng, img, ids, msk,
                           method=FiberCoarse.init_full)
    batch = {"image": img, "text_ids": ids, "text_masks": msk}
    out = cap.compute_caption_gold(model, variables, variables, batch,
                                   pad_id=1, train=True)
    assert np.isfinite(out["caption_gold_loss"])
    # eval path (plain mean CE)
    out_eval = cap.compute_caption_gold(model, variables, variables, batch,
                                        pad_id=1, train=False)
    assert np.isfinite(out_eval["caption_gold_loss"])
    # gradient flows (gold params are stop-gradient)
    def f(p):
        return cap.compute_caption_gold(
            model, {"params": p}, variables, batch, pad_id=1,
            train=True)["caption_gold_loss"]
    g = jax.grad(f)(variables["params"])
    assert any(bool(jnp.any(l != 0))
               for l in jax.tree_util.tree_leaves(g))
