"""Integration tests for the FiberCoarse fused forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = FiberConfig.tiny_test(
        loss_names=("itm", "mlm", "itc", "vqa", "nlvr2", "caption_mle"))
    model = FiberCoarse(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((2, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((2, cfg.max_text_len), dtype=jnp.int32)
    variables = model.init(rng, img, ids, mask,
                           method=FiberCoarse.init_full)
    return cfg, model, variables


def test_fused_forward_shapes(model_and_vars):
    cfg, model, variables = model_and_vars
    B = 2
    img = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((B, cfg.max_text_len), dtype=jnp.int32)
    out = model.apply(variables, img, ids, mask, method=FiberCoarse.infer)
    hs = cfg.hidden_size
    g = cfg.image_size // cfg.patch_size // 8
    assert out["text_feats"].shape == (B, cfg.max_text_len, hs)
    assert out["image_feats"].shape == (B, g * g, hs)
    assert out["cls_feats"].shape == (B, 2 * hs)
    for v in out.values():
        assert jnp.isfinite(v).all()


def test_itc_towers(model_and_vars):
    cfg, model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((2, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((2, cfg.max_text_len), dtype=jnp.int32)
    io = model.apply(variables, img, method=FiberCoarse.encode_image_itc)
    to = model.apply(variables, ids, mask,
                     method=FiberCoarse.encode_text_itc)
    assert io["cls_feats"].shape == (2, cfg.hidden_size)
    assert to["cls_feats"].shape == (2, cfg.hidden_size)
    # normalized embeddings
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(io["cls_feats"]), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(to["cls_feats"]), axis=-1), 1.0, atol=1e-5)


def test_caption_forward(model_and_vars):
    cfg, model, variables = model_and_vars
    img = jax.random.normal(jax.random.PRNGKey(3),
                            (2, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((2, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((2, cfg.max_text_len), dtype=jnp.int32)
    img_emb = model.apply(variables, img,
                          method=FiberCoarse.encode_image_caption)
    g = cfg.image_size // cfg.patch_size // 8
    assert img_emb.shape == (2, g * g, cfg.input_image_embed_size)
    out = model.apply(variables, ids, mask, img_emb,
                      method=FiberCoarse.infer_caption)
    assert out["text_feats"].shape == (2, cfg.max_text_len, cfg.hidden_size)

    # causal property: prefix outputs don't depend on future tokens
    ids2 = ids.at[:, -1].set(5)
    out2 = model.apply(variables, ids2, mask, img_emb,
                       method=FiberCoarse.infer_caption)
    np.testing.assert_allclose(np.asarray(out["text_feats"][:, :-1]),
                               np.asarray(out2["text_feats"][:, :-1]),
                               atol=1e-5)


def test_heads(model_and_vars):
    cfg, model, variables = model_and_vars
    cls = jax.random.normal(jax.random.PRNGKey(4), (2, 2 * cfg.hidden_size))
    itm = model.apply(variables, cls, method=FiberCoarse.itm_logits)
    assert itm.shape == (2, 2)
    vqa = model.apply(variables, cls, method=FiberCoarse.vqa_logits)
    assert vqa.shape == (2, cfg.vqav2_label_size)


def test_train_config_remat_droppath_traces():
    """remat + drop_path > 0 (the real pretraining config) must trace:
    nn.remat needs `deterministic` static (SwinBlock static_argnums) or
    DropPath sees a traced bool[] and crashes."""
    import jax
    import jax.numpy as jnp
    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse

    cfg = FiberConfig.tiny_test(loss_names=("itm",)).replace(
        remat=True, swin_drop_path_rate=0.1, drop_rate=0.1)
    model = FiberCoarse(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    msk = jnp.ones((1, cfg.max_text_len), jnp.int32)
    v = jax.eval_shape(lambda r: model.init(r, img, ids, msk),
                       jax.random.PRNGKey(0))
    # and the train-mode apply path with dropout rngs
    variables = model.init(jax.random.PRNGKey(0), img, ids, msk)
    out = model.apply(variables, img, ids, msk,
                      method=FiberCoarse.infer, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert jnp.isfinite(out["cls_feats"].astype(jnp.float32)).all()
