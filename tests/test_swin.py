"""Unit tests for the Swin backbone: shapes, masks, window round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.models.swin import (PatchMerging, SwinTransformer,
                                   relative_position_index,
                                   shifted_window_mask, window_partition,
                                   window_reverse)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2, 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_layout():
    # token (row r, col c) of window (i, j) must be original (i*w+r, j*w+c)
    H = W = 4
    win = 2
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    w = window_partition(x, win)
    # window (0, 1) covers cols 2-3 of rows 0-1
    expected = np.array([2, 3, 6, 7], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(w[0, 1, :, 0]), expected)


def test_relative_position_index_properties():
    w = 3
    idx = relative_position_index(w)
    N = w * w
    assert idx.shape == (N, N)
    assert idx.max() == (2 * w - 1) ** 2 - 1
    assert idx.min() == 0
    # diagonal = self-offset = centre of the table
    centre = (2 * w - 1) * (w - 1) + (w - 1)
    assert (np.diag(idx) == centre).all()
    # symmetry: idx[i, j] and idx[j, i] are mirror offsets
    assert idx[0, 1] != idx[1, 0]


def test_shifted_window_mask_blocks_cross_region():
    H = W = 8
    mask = shifted_window_mask(H, W, 4, 2)
    assert mask.shape == ((H // 4) * (W // 4), 16, 16)
    # first window (no wrapped content) should be fully visible
    np.testing.assert_array_equal(mask[0], np.zeros((16, 16)))
    # last window (wrapped corner) must have some blocked pairs
    assert (mask[-1] == -100.0).any()


def test_patch_merging_channel_order():
    # reference order: [(r0,c0), (r1,c0), (r0,c1), (r1,c1)]
    x = jnp.arange(1 * 2 * 2 * 1, dtype=jnp.float32).reshape(1, 2, 2, 1)
    # x[0,:,:,0] = [[0, 1], [2, 3]]: r0c0=0, r1c0=2, r0c1=1, r1c1=3
    pm = PatchMerging(dim=1)
    vars_ = pm.init(jax.random.PRNGKey(0), x)
    # intercept the pre-norm concat by monkey inspection: recompute manually
    merged = x.reshape(1, 1, 2, 1, 2, 1).transpose(0, 1, 3, 4, 2, 5)
    merged = merged.reshape(1, 1, 1, 4)
    np.testing.assert_array_equal(np.asarray(merged[0, 0, 0]),
                                  np.array([0., 2., 1., 3.]))
    out = pm.apply(vars_, x)
    assert out.shape == (1, 1, 1, 2)


@pytest.mark.parametrize("fused", [False, True])
def test_swin_forward_shapes(tiny_cfg, rng, fused):
    c = tiny_cfg
    model = SwinTransformer(
        image_size=c.image_size, patch_size=c.patch_size,
        embed_dim=c.swin_embed_dim, depths=c.swin_depths,
        num_heads=c.swin_num_heads, window_size=c.window_size,
        num_fuse_block=c.num_fuse_block, drop_path_rate=0.0)
    img = jnp.ones((2, c.image_size, c.image_size, 3))
    if fused:
        text = jnp.ones((2, c.max_text_len, c.input_text_embed_size))
        bias = jnp.zeros((2, c.max_text_len))
        variables = model.init(rng, img, text, bias)
        out = model.apply(variables, img, text, bias)
    else:
        variables = model.init(rng, img)
        out = model.apply(variables, img)
    g = c.image_size // c.patch_size // 8  # after 3 downsamples
    assert out.shape == (2, g * g, c.swin_embed_dim * 8)
    assert jnp.isfinite(out).all()


def test_swin_fusion_gate_starts_as_noop(tiny_cfg, rng):
    """alpha gates init to 0, so fused forward == unfused forward at init."""
    c = tiny_cfg
    model = SwinTransformer(
        image_size=c.image_size, patch_size=c.patch_size,
        embed_dim=c.swin_embed_dim, depths=c.swin_depths,
        num_heads=c.swin_num_heads, window_size=c.window_size,
        num_fuse_block=c.num_fuse_block, drop_path_rate=0.0)
    img = jax.random.normal(rng, (2, c.image_size, c.image_size, 3))
    text = jax.random.normal(rng, (2, c.max_text_len,
                                   c.input_text_embed_size))
    bias = jnp.zeros((2, c.max_text_len))
    variables = model.init(rng, img, text, bias)
    fused = model.apply(variables, img, text, bias)
    plain = model.apply(variables, img)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=1e-5)
