"""Unit tests for the RoBERTa encoder: position ids, masks, fusion gating."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.models.roberta import (RobertaEncoderModel,
                                      causal_attention_mask,
                                      create_position_ids,
                                      extended_attention_mask)


def test_position_ids_pad_offset():
    # roberta quirk: positions start at pad_idx + 1, padding stays pad_idx
    ids = jnp.array([[5, 7, 9, 1, 1], [5, 1, 1, 1, 1]])
    pos = create_position_ids(ids, padding_idx=1)
    np.testing.assert_array_equal(
        np.asarray(pos), np.array([[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]]))


def test_extended_attention_mask_values():
    m = jnp.array([[1, 1, 0]])
    em = extended_attention_mask(m)
    assert em.shape == (1, 1, 1, 3)
    np.testing.assert_array_equal(np.asarray(em[0, 0, 0]),
                                  np.array([0.0, 0.0, -10000.0]))


def test_causal_mask_shape_and_structure():
    m = jnp.array([[1, 1, 1, 0]])
    cm = causal_attention_mask(m)
    assert cm.shape == (1, 1, 4, 4)
    cm = np.asarray(cm[0, 0])
    assert cm[0, 1] < -1e8  # future blocked
    assert cm[1, 0] == 0.0  # past visible
    assert cm[1, 3] < -1e8  # padding blocked


def _tiny_text_model(c):
    return RobertaEncoderModel(
        vocab_size=c.vocab_size, hidden_size=c.text_hidden_size,
        num_layers=c.num_text_layers, num_heads=c.num_text_heads,
        intermediate_size=c.text_intermediate_size,
        max_position_embeddings=c.max_position_embeddings,
        num_fuse_block=c.num_fuse_block, attn_drop=0.0, hidden_drop=0.0)


def test_text_encoder_shapes(tiny_cfg, rng):
    c = tiny_cfg
    model = _tiny_text_model(c)
    ids = jnp.ones((2, c.max_text_len), dtype=jnp.int32) * 3
    mask = jnp.ones((2, c.max_text_len), dtype=jnp.int32)
    variables = model.init(rng, ids, mask)
    out = model.apply(variables, ids, mask)
    assert out.shape == (2, c.max_text_len, c.text_hidden_size)
    assert jnp.isfinite(out).all()


def test_fused_layers_have_cross_attention_params(tiny_cfg, rng):
    c = tiny_cfg
    model = _tiny_text_model(c)
    ids = jnp.ones((1, c.max_text_len), dtype=jnp.int32) * 3
    mask = jnp.ones((1, c.max_text_len), dtype=jnp.int32)
    img_small = jnp.ones((1, 4, c.input_image_embed_size // 2))
    img_large = jnp.ones((1, 4, c.input_image_embed_size))
    variables = model.init(rng, ids, mask, img_small, img_large,
                           method=RobertaEncoderModel.init_full)
    params = variables["params"]
    n_pre = c.num_text_layers - c.num_fuse_block
    for i in range(c.num_text_layers):
        has_cross = f"crossattention_t2i" in params[f"layer_{i}"]
        assert has_cross == (i >= n_pre), f"layer {i}"


def test_padding_does_not_leak(tiny_cfg, rng):
    """Changing a padded token's id must not change unpadded outputs."""
    c = tiny_cfg
    model = _tiny_text_model(c)
    L = c.max_text_len
    ids1 = jnp.full((1, L), 3, dtype=jnp.int32).at[0, L // 2:].set(1)
    mask = jnp.where(ids1 != 1, 1, 0)
    ids2 = ids1.at[0, -1].set(7)  # different content at padded slot
    variables = model.init(rng, ids1, mask)
    o1 = model.apply(variables, ids1, mask)
    o2 = model.apply(variables, ids2, mask)
    np.testing.assert_allclose(np.asarray(o1[0, :L // 2]),
                               np.asarray(o2[0, :L // 2]), atol=1e-5)
