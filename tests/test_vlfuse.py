"""Tests for GLIP-style early fusion (VLFuse / MHA-B)."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.dyhead import VLDyHead
from fiber_tpu.detection.vlfuse import BiMultiHeadAttention, VLFuse


def test_bi_mha_shapes_and_masking():
    m = BiMultiHeadAttention(v_dim=16, l_dim=8, embed_dim=16, num_heads=2,
                             dropout=0.0)
    rng = jax.random.PRNGKey(0)
    v = jax.random.normal(rng, (2, 10, 16))
    l = jax.random.normal(rng, (2, 5, 8))
    mask = jnp.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    vars_ = m.init(rng, v, l, mask)
    dv, dl = m.apply(vars_, v, l, mask)
    assert dv.shape == (2, 10, 16)
    assert dl.shape == (2, 5, 8)
    # image->text attention must ignore masked text: changing a masked
    # text token must not change the image output
    l2 = l.at[0, 3].set(99.0)
    dv2, _ = m.apply(vars_, v, l2, mask)
    np.testing.assert_allclose(np.asarray(dv[0]), np.asarray(dv2[0]),
                               atol=1e-5)


def test_vlfuse_roundtrip_levels():
    m = VLFuse(v_dim=8, l_dim=8, embed_dim=16, num_heads=2)
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (2, 4, 4, 8)),
             jax.random.normal(rng, (2, 2, 2, 8))]
    lang = {"hidden": jax.random.normal(rng, (2, 6, 8)),
            "masks": jnp.ones((2, 6), jnp.int32)}
    vars_ = m.init(rng, feats, lang)
    outs, new_lang = m.apply(vars_, feats, lang)
    assert [o.shape for o in outs] == [(2, 4, 4, 8), (2, 2, 2, 8)]
    assert new_lang["hidden"].shape == (2, 6, 8)


def test_dyhead_with_early_fuse():
    head = VLDyHead(num_convs=2, in_channels=8, channels=8, num_anchors=1,
                    lang_dim=8, use_deform=False, max_query_len=6,
                    early_fuse="mha-b", num_text_heads=2)
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (1, 4, 4, 8)),
             jax.random.normal(rng, (1, 2, 2, 8)),
             jax.random.normal(rng, (1, 1, 1, 8)),
             jax.random.normal(rng, (1, 1, 1, 8)),
             jax.random.normal(rng, (1, 1, 1, 8))]
    lang = jax.random.normal(rng, (1, 6, 8))
    mask = jnp.ones((1, 6), jnp.int32)
    vars_ = head.init(rng, feats, lang, mask)
    out = head.apply(vars_, feats, lang, mask)
    assert len(out["box_cls"]) == 5
    assert out["dot_product_logits"][0].shape == (1, 16, 6)
    for v in out["dot_product_logits"]:
        assert bool(jnp.isfinite(v).all())
