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
