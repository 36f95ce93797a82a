"""VLFuse variant registry (MHA-S / SCAN / FILM / NONE) and the
standalone layer zoo (SE / DropBlock / EvoNorm / plain DyHead)
(ref vldyhead.py:367-585, layers/{se,dropblock,evonorm,dyhead}.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.detection.vlfuse import VLFuse, make_coord_features
from fiber_tpu.ops.layers_zoo import (DropBlock2D, EvoNorm2d, PlainDyHead,
                                      SEBlock, SELayer)

B, C, T, L = 2, 16, 6, 32


def _inputs():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    visual = [jax.random.normal(keys[0], (B, 8, 8, C)),
              jax.random.normal(keys[1], (B, 4, 4, C))]
    lang = {"hidden": jax.random.normal(keys[2], (B, T, L)),
            "masks": jnp.asarray([[1] * T, [1, 1, 1, 1, 0, 0]]),
            "aggregate": jax.random.normal(keys[2], (B, L))}
    return visual, lang


@pytest.mark.parametrize("fuse_type", ["MHA-B", "MHA-S", "SCAN", "FILM",
                                       "NONE"])
def test_vlfuse_variants(fuse_type):
    visual, lang = _inputs()
    mod = VLFuse(v_dim=C, l_dim=L, embed_dim=32, num_heads=4,
                 fuse_type=fuse_type)
    variables = mod.init(jax.random.PRNGKey(1), visual, lang)
    outs, new_lang = mod.apply(variables, visual, lang)
    assert len(outs) == len(visual)
    for o, v in zip(outs, visual):
        assert o.shape == v.shape
        assert np.isfinite(np.asarray(o)).all()
    if fuse_type == "NONE":
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(visual[0]))
    if fuse_type == "MHA-B":
        assert not np.allclose(np.asarray(new_lang["hidden"]),
                               np.asarray(lang["hidden"]))
    if fuse_type in ("MHA-S", "SCAN", "FILM"):
        np.testing.assert_array_equal(np.asarray(new_lang["hidden"]),
                                      np.asarray(lang["hidden"]))


def test_coord_features():
    f = make_coord_features(2, 4, 6)
    assert f.shape == (2, 4, 6, 8)
    assert np.isfinite(np.asarray(f)).all()
    # reference quirk preserved (fuse_helper.py:92-103): the row index is
    # normalized by WIDTH and the column index by HEIGHT
    np.testing.assert_allclose(float(f[0, 0, 0, 0]), -1.0)       # xv_min
    np.testing.assert_allclose(float(f[0, 2, 0, 0]), (4 - 6) / 6)
    np.testing.assert_allclose(float(f[0, 0, 3, 1]), (6 - 4) / 4)  # yv_min
    np.testing.assert_allclose(float(f[0, 0, 0, 6]), 0.25)       # 1/H
    np.testing.assert_allclose(float(f[0, 0, 0, 7]), 1 / 6)      # 1/W


def test_se_layers():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, C))
    se = SELayer(channels=C, reduction=4)
    v = se.init(jax.random.PRNGKey(1), x)
    y = se.apply(v, x)
    assert y.shape == x.shape
    # gate in (0, 1): output magnitude bounded by input
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x).max()) + 1e-6

    blk = SEBlock(channels=C)
    v = blk.init(jax.random.PRNGKey(2), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0  # final relu


def test_dropblock():
    x = jnp.ones((B, 16, 16, 4))
    db = DropBlock2D(drop_prob=0.3, block_size=5)
    v = db.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x)
    # deterministic -> identity
    np.testing.assert_array_equal(
        np.asarray(db.apply(v, x, deterministic=True)), np.asarray(x))
    y = np.asarray(db.apply(v, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)}))
    assert (y == 0).any(), "no blocks dropped"
    kept = y[y > 0]
    assert kept.min() > 1.0  # rescaled by keep fraction


def test_evonorm():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, C)) * 3
    en = EvoNorm2d(channels=C, groups=4)
    v = en.init(jax.random.PRNGKey(1), x)
    y = np.asarray(en.apply(v, x))
    assert y.shape == x.shape and np.isfinite(y).all()
    # linear mode = affine only
    en2 = EvoNorm2d(channels=C, nonlinearity=False)
    v2 = en2.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(np.asarray(en2.apply(v2, x)),
                               np.asarray(x), atol=1e-6)


def test_plain_dyhead_tower():
    feats = [jax.random.normal(jax.random.PRNGKey(i), (B, s, s, C))
             for i, s in enumerate((8, 4, 2))]
    head = PlainDyHead(channels=C, n_convs=2)
    v = head.init(jax.random.PRNGKey(9), feats)
    outs = head.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
