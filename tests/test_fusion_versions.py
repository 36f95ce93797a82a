"""Fusion-in-the-backbone v1/v2/v3 variants
(ref fusion_swin_transformer{,_v2,_v3}.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.detection.fusion_backbone import FusionSwinFPN


def _build(version):
    kw = dict(image_size=(64, 64), embed_dim=16, depths=(1, 1, 3, 2),
              num_heads=(1, 2, 4, 8), window_size=4, vocab_size=64,
              lang_dim=32, num_text_layers=12, num_text_heads=2,
              max_query_len=8, fusion_version=version,
              use_pallas=False)
    if version == "v1":
        kw["v1_num_pre_block"] = 1
        kw["num_fuse_block"] = 2
    else:
        kw["num_fuse_block"] = 4  # 2 in stage-3 + 2 in stage-4
    return FusionSwinFPN(**kw)


def _leaf_paths(params):
    return {"/".join(str(getattr(p, "key", p)) for p in path)
            for path, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}


@pytest.mark.parametrize("version", ["v1", "v2", "v3"])
def test_fusion_versions_forward(version):
    model = _build(version)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.full((1, 8), 3, jnp.int32)
    msk = jnp.ones((1, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(1), img, ids, msk)
    feats, lang = model.apply(v, img, ids, msk)
    assert len(feats) == 5
    assert feats[0].shape[1] == 64 // 8  # stride-8 first level
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()
    assert set(lang) >= {"hidden", "embedded", "aggregate", "masks"}

    paths = _leaf_paths(v["params"])
    has_t23 = any("cross_modal_image_transform2" in p for p in paths)
    has_qnorm = any("norm_i2t_i" in p for p in paths)
    if version == "v1":
        assert has_t23 and not has_qnorm
    elif version == "v2":
        assert not has_t23 and not has_qnorm
    else:
        assert not has_t23 and has_qnorm


def test_v1_keeps_text_stream_frozen_through_stage3():
    """v1's asymmetric protocol: stage-3 i2t fusion must not mutate the
    text stream (fusion only flows text->image until stage 4)."""
    model = _build("v1")
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    ids = jnp.full((1, 8), 3, jnp.int32)
    msk = jnp.ones((1, 8), jnp.int32)
    v = model.init(jax.random.PRNGKey(1), img, ids, msk)
    # with zero i2t gates (alpha_i2t init 0), v1 visual output must match
    # a text-independent forward of the same params
    feats_a, _ = model.apply(v, img, ids, msk)
    ids_b = jnp.full((1, 8), 5, jnp.int32)
    feats_b, _ = model.apply(v, img, ids_b, msk)
    for a, b in zip(feats_a, feats_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
