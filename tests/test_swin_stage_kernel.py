"""Whole-stage fused Swin Pallas kernel vs the per-block oracle
(interpret mode on CPU; the tunneled runtime's Mosaic backend cannot
compile it yet — docs/ROUND2_NOTES.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.models.swin import SwinBlock, shifted_window_mask
from fiber_tpu.ops.swin_stage import fused_swin_blocks, stack_block_params

B, H, W, C = 2, 8, 8, 32
WIN, HEADS, NBLK = 4, 4, 3


def _build(dtype=jnp.float32):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dtype)
    blocks, params = [], []
    for b in range(NBLK):
        blk = SwinBlock(dim=C, input_resolution=(H, W), num_heads=HEADS,
                        window_size=WIN,
                        shift_size=0 if b % 2 == 0 else WIN // 2,
                        drop=0.0, attn_drop=0.0, drop_path=0.0,
                        dtype=dtype)
        params.append(blk.init(jax.random.PRNGKey(b + 1), x)["params"])
        blocks.append(blk)
    return x, blocks, params


@pytest.mark.parametrize("batch_tile", [1, 2])
def test_fused_stage_matches_blocks(batch_tile):
    x, blocks, params = _build()
    y = x
    for blk, p in zip(blocks, params):
        y = blk.apply({"params": p}, y, deterministic=True)
    ref = np.asarray(y)

    sp = stack_block_params(tuple(params), WIN, HEADS)
    mask = jnp.asarray(shifted_window_mask(H, W, WIN, WIN // 2),
                       jnp.float32)
    out = fused_swin_blocks(x, sp, mask, window=WIN, num_heads=HEADS,
                            use_shift=True, batch_tile=batch_tile,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_fused_stage_single_window_no_shift():
    """H == W == window: one window, shifts disabled (stage-4 layout)."""
    x = jax.random.normal(jax.random.PRNGKey(9), (B, WIN, WIN, C))
    blocks, params = [], []
    for b in range(2):
        blk = SwinBlock(dim=C, input_resolution=(WIN, WIN),
                        num_heads=HEADS, window_size=WIN, shift_size=0,
                        drop=0.0, attn_drop=0.0, drop_path=0.0)
        params.append(blk.init(jax.random.PRNGKey(b), x)["params"])
        blocks.append(blk)
    y = x
    for blk, p in zip(blocks, params):
        y = blk.apply({"params": p}, y, deterministic=True)

    sp = stack_block_params(tuple(params), WIN, HEADS)
    mask = jnp.zeros((1, WIN * WIN, WIN * WIN), jnp.float32)
    out = fused_swin_blocks(x, sp, mask, window=WIN, num_heads=HEADS,
                            use_shift=False, batch_tile=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), atol=2e-4)
