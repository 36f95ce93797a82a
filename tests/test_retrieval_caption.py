"""Tests for retrieval evaluation and caption decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.objectives import caption as cap
from fiber_tpu.objectives import retrieval as ret


def test_recall_at_k_exact():
    # 3 images x 6 texts; image i's captions are {2i, 2i+1}
    score = np.full((3, 6), -1.0)
    img2txt = [[0, 1], [2, 3], [4, 5]]
    txt2img = [0, 0, 1, 1, 2, 2]
    for i, ts in enumerate(img2txt):
        score[i, ts[0]] = 2.0  # best caption
        score[i, ts[1]] = 1.0
    m = ret.recall_at_k(score, img2txt, txt2img, ks=(1, 5))
    assert m["tr_r1"] == 1.0
    assert m["ir_r1"] == 1.0
    # corrupt image 0's ranking for text retrieval
    score[0, img2txt[0][0]] = -2.0
    score[0, img2txt[0][1]] = -2.0
    m = ret.recall_at_k(score, img2txt, txt2img, ks=(1,))
    assert m["tr_r1"] == pytest.approx(2 / 3)


@pytest.fixture(scope="module")
def small_model():
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc",
                                            "caption_mle"))
    model = FiberCoarse(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.ones((1, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((1, cfg.max_text_len), 3, jnp.int32)
    msk = jnp.ones((1, cfg.max_text_len), jnp.int32)
    variables = model.init(rng, img, ids, msk,
                           method=FiberCoarse.init_full)
    return cfg, model, variables


def test_evaluate_retrieval_end_to_end(small_model):
    cfg, model, variables = small_model
    rng = np.random.default_rng(0)
    Ni, Nt = 3, 6
    images = rng.standard_normal(
        (Ni, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ids = rng.integers(3, 90, (Nt, cfg.max_text_len)).astype(np.int32)
    masks = np.ones_like(ids)
    img2txt = [[0, 1], [2, 3], [4, 5]]
    txt2img = [0, 0, 1, 1, 2, 2]
    metrics = ret.evaluate_retrieval(model, variables, images, ids, masks,
                                     img2txt, txt2img, rerank_topk=3,
                                     batch_size=4)
    for k in ("itc_ir_r1", "itc_tr_r1", "itm_ir_r1", "itm_tr_r1"):
        assert 0.0 <= metrics[k] <= 1.0, metrics
    # recall is monotone in k
    assert metrics["itc_ir_r5"] >= metrics["itc_ir_r1"]
    assert metrics["itm_tr_r5"] >= metrics["itm_tr_r1"]


def test_greedy_and_beam_decode(small_model):
    cfg, model, variables = small_model
    B = 2
    images = jax.random.normal(
        jax.random.PRNGKey(1), (B, cfg.image_size, cfg.image_size, 3))
    img_emb = model.apply(variables, images,
                          method=FiberCoarse.encode_image_caption)
    max_len = 6
    ids = cap.greedy_decode(model, variables, img_emb, bos_id=0, eos_id=2,
                            pad_id=1, max_len=max_len)
    assert ids.shape == (B, max_len)
    assert (np.asarray(ids[:, 0]) == 0).all()

    bids, scores = cap.beam_search_decode(model, variables, img_emb,
                                          bos_id=0, eos_id=2, pad_id=1,
                                          max_len=max_len, beam_size=3)
    assert bids.shape == (B, max_len)
    assert np.isfinite(np.asarray(scores)).all()
    # beam-1 equals greedy
    b1, _ = cap.beam_search_decode(model, variables, img_emb, bos_id=0,
                                   eos_id=2, pad_id=1, max_len=max_len,
                                   beam_size=1)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(ids))


def test_cached_rerank_matches_full_forward(small_model):
    """Trunk/prefix-cached rerank == full fused forward per pair
    (infer is trunk + prefix + tail by construction)."""
    cfg, model, variables = small_model
    rng = np.random.default_rng(5)
    n_img, n_txt = 4, 6
    images = jnp.asarray(
        rng.standard_normal((n_img, cfg.image_size, cfg.image_size, 3)),
        cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                   (n_txt, cfg.max_text_len)), jnp.int32)
    masks = np.ones((n_txt, cfg.max_text_len), np.int64)
    masks[2, 3:] = 0  # a padded text exercises the mask path
    masks = jnp.asarray(masks, jnp.int32)

    pair_img = np.asarray([0, 1, 2, 3, 0, 1, 2, 3])
    pair_txt = np.asarray([0, 1, 2, 3, 4, 5, 0, 1])

    s_full = ret._rank_pairs_scan(model, variables, images, ids, masks,
                                  jnp.asarray(pair_img),
                                  jnp.asarray(pair_txt), 4)
    s_cached = ret.rank_pairs_pipeline(model, variables, images, ids,
                                       masks, pair_img, pair_txt, 4,
                                       trunk_batch=2)
    np.testing.assert_allclose(np.asarray(s_cached), np.asarray(s_full),
                               atol=1e-5, rtol=1e-5)


def test_infer_composition_identical(small_model):
    """infer() == encode_image_trunk + encode_text_pre + infer_fused_tail."""
    cfg, model, variables = small_model
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)), cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                   (2, cfg.max_text_len)), jnp.int32)
    msk = jnp.ones((2, cfg.max_text_len), jnp.int32)

    full = model.apply(variables, img, ids, msk, method=FiberCoarse.infer)
    trunk = model.apply(variables, img,
                        method=FiberCoarse.encode_image_trunk)
    pre = model.apply(variables, ids, msk,
                      method=FiberCoarse.encode_text_pre)
    tail = model.apply(variables, trunk, pre, msk,
                       method=FiberCoarse.infer_fused_tail)
    for k in full:
        np.testing.assert_allclose(np.asarray(tail[k], np.float32),
                                   np.asarray(full[k], np.float32),
                                   atol=0, rtol=0)
