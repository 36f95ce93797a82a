"""Whole-stage fused Swin blocks as ONE Pallas kernel.

Motivation (measured, round-2 bench decomposition): through the tunneled
runtime every XLA kernel launch costs ~0.3 ms regardless of size, so a
Swin stage of n blocks x ~8 fused kernels is launch-bound, not FLOP-bound.
This kernel runs an entire run of transformer blocks inside one
pallas_call: grid = (batch_tiles, n_blocks), the activations persist in a
VMEM scratch across grid steps, and each block's weights stream from HBM
exactly once per batch tile (Mosaic re-fetches an input block only when
its index map changes).  Windows are processed with *static* slice
offsets (a python loop) — dynamic program_id-derived slicing of scratch
crashes the libtpu Mosaic backend (bisected).

Semantics match SwinBlock (models/swin.py) with deterministic=True and
drop_path=0 — fp32 LN and softmax, bf16 matmuls with fp32 accumulation,
erf GELU (Abramowitz-Stegun rational erf: Mosaic lowers no erf/erfc) —
so it serves the inference paths (bench, retrieval rerank, eval);
training keeps the autodiff-able per-block path.

Shifted windows: odd blocks cyclically roll the activations by
-window//2 before windowing and roll back after, adding the standard
shift mask (precomputed outside, like the per-block relative-position
bias tables).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STACK_KEYS = ("ln1_s", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
              "ln2_s", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b", "rpb")


def _erf(x: jax.Array) -> jax.Array:
    """fp32 erf via the Abramowitz-Stegun 7.1.26 rational polynomial
    (|error| <= 1.5e-7)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array
               ) -> jax.Array:
    m = x.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    var = ((m - mu) ** 2).mean(-1, keepdims=True)
    out = (m - mu) * jax.lax.rsqrt(var + 1e-5)
    return out * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _kernel(x_ref, ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
            fc1w, fc1b, fc2w, fc2b, rpb, mask, out_ref, acts, attn_acc,
            *, window: int, num_heads: int, grid_h: int, grid_w: int,
            use_shift: bool, n_blocks: int, mlp_chunks: int):
    j = pl.program_id(1)
    TB, H, W, C = acts.shape
    N = window * window
    h = num_heads
    hd = C // h
    shift = window // 2
    dt = out_ref.dtype

    @pl.when(j == 0)
    def _():
        acts[...] = x_ref[...]

    shifted = jnp.logical_and((j % 2) == 1, use_shift)
    if use_shift:
        @pl.when(shifted)
        def _():
            # pltpu.roll takes non-negative shifts: -s == size - s
            rolled = pltpu.roll(acts[...], H - shift, 1)
            acts[...] = pltpu.roll(rolled, W - shift, 2)

    # ---- attention, one window at a time (static offsets) -------------
    for w in range(grid_h * grid_w):
        wh, ww = (w // grid_w) * window, (w % grid_w) * window
        x_tok = acts[:, wh:wh + window, ww:ww + window, :].reshape(
            TB * N, C)
        h1 = _layernorm(x_tok, ln1s[0], ln1b[0]).astype(dt)
        qkv = jax.lax.dot_general(
            h1, qkvw[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + qkvb[0].astype(
            jnp.float32)
        qkv = qkv.astype(dt).reshape(TB, N, 3 * h, hd)
        # merge (TB, h) into one batch dim: tpu.matmul supports max 1
        q = qkv[:, :, 0 * h:1 * h].transpose(0, 2, 1, 3).reshape(
            TB * h, N, hd)
        k = qkv[:, :, 1 * h:2 * h].transpose(0, 2, 1, 3).reshape(
            TB * h, N, hd)
        v = qkv[:, :, 2 * h:3 * h].transpose(0, 2, 1, 3).reshape(
            TB * h, N, hd)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (TB*h, N, N)
        scores = scores.reshape(TB, h, N, N) * (hd ** -0.5)
        scores = scores + rpb[0].astype(jnp.float32)[None]
        if use_shift:
            scores = scores + jnp.where(shifted, 1.0, 0.0) \
                * mask[w].astype(jnp.float32)[None, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jax.lax.dot_general(
            probs.reshape(TB * h, N, N), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (TB*h, N, hd)
        ctx = ctx.astype(dt).reshape(TB, h, N, hd).transpose(
            0, 2, 1, 3).reshape(TB * N, C)
        attn_out = jax.lax.dot_general(
            ctx, projw[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + projb[0].astype(
            jnp.float32)
        attn_acc[:, wh:wh + window, ww:ww + window, :] = \
            attn_out.astype(dt).reshape(TB, window, window, C)

    acts[...] = (acts[...].astype(jnp.float32)
                 + attn_acc[...].astype(jnp.float32)).astype(dt)

    # ---- MLP over static H-slices ---------------------------------------
    hc = H // mlp_chunks
    for c in range(mlp_chunks):
        xs = acts[:, c * hc:(c + 1) * hc].reshape(TB * hc * W, C)
        h2 = _layernorm(xs, ln2s[0], ln2b[0]).astype(dt)
        hmid = jax.lax.dot_general(
            h2, fc1w[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + fc1b[0].astype(
            jnp.float32)
        hmid = (0.5 * hmid * (1.0 + _erf(hmid * (2.0 ** -0.5)))).astype(dt)
        mlp_out = jax.lax.dot_general(
            hmid, fc2w[0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + fc2b[0].astype(
            jnp.float32)
        y = (xs.astype(jnp.float32) + mlp_out).astype(dt)
        attn_acc[:, c * hc:(c + 1) * hc] = y.reshape(TB, hc, W, C)

    acts[...] = attn_acc[...]

    if use_shift:
        @pl.when(shifted)
        def _():
            rolled = pltpu.roll(acts[...], shift, 1)
            acts[...] = pltpu.roll(rolled, shift, 2)

    @pl.when(j == n_blocks - 1)
    def _():
        out_ref[...] = acts[...]


@functools.partial(jax.jit, static_argnames=("window", "num_heads",
                                             "use_shift", "batch_tile",
                                             "mlp_chunks", "interpret"))
def fused_swin_blocks(x: jax.Array, sp: Dict[str, jax.Array],
                      mask: jax.Array, window: int, num_heads: int,
                      use_shift: bool = True, batch_tile: int = 0,
                      mlp_chunks: int = 0,
                      interpret: bool = False) -> jax.Array:
    """Run n stacked Swin blocks over x in one kernel launch.

    x: (B, H, W, C) with H, W multiples of `window`.
    sp: stacked per-block params —
        ln1_s/ln1_b/ln2_s/ln2_b/proj_b/fc2_b (n, C), qkv_w (n, C, 3C),
        qkv_b (n, 3C), proj_w (n, C, C), fc1_w (n, C, M), fc1_b (n, M),
        fc2_w (n, M, C), rpb (n, h, N, N) fp32 (bias tables pre-gathered,
        see stack_block_params).
    mask: (nW, N, N) fp32 shift mask (pass zeros when use_shift=False).
    Blocks alternate shift like the stage builder (even -> no shift).
    """
    B, H, W, C = x.shape
    n = sp["qkv_w"].shape[0]
    grid_h, grid_w = H // window, W // window
    TB = batch_tile or max(1, min(B, 4 * 1024 * 1024
                                  // max(H * W * C * 2, 1)))
    while B % TB:
        TB -= 1
    mc = mlp_chunks or max(1, (TB * H * W * C * 4 * 2)
                           // (8 * 1024 * 1024))
    mc = min(mc, H)
    while H % mc:
        mc -= 1

    # Mosaic requires the last two block dims tileable or equal to the
    # array dims: promote (n, D) vectors to (n, 1, D)
    sp = {k: (v.reshape(v.shape[0], 1, v.shape[1]) if v.ndim == 2 else v)
          for k, v in sp.items()}

    def vec(key):
        return pl.BlockSpec((1,) + sp[key].shape[1:],
                            lambda i, j: (j,) + (0,) * (sp[key].ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((TB, H, W, C), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [vec(k) for k in STACK_KEYS]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]  # mask, resident

    out = pl.pallas_call(
        functools.partial(_kernel, window=window, num_heads=num_heads,
                          grid_h=grid_h, grid_w=grid_w,
                          use_shift=use_shift, n_blocks=n, mlp_chunks=mc),
        grid=(B // TB, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, H, W, C), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((TB, H, W, C), x.dtype),
                        pltpu.VMEM((TB, H, W, C), x.dtype)],
        interpret=interpret,
    )(x, *[sp[k] for k in STACK_KEYS], mask)
    return out


def stack_block_params(block_params: Tuple[Dict, ...], window: int,
                       num_heads: int) -> Dict[str, jnp.ndarray]:
    """Stack per-block flax param subtrees (SwinBlock layout) into the
    kernel's stacked arrays; gathers each block's RPB table into a dense
    (h, N, N) bias (done once, outside the hot loop)."""
    import numpy as np

    from fiber_tpu.models.swin import relative_position_index
    idx = relative_position_index(window).reshape(-1)
    out = {k: [] for k in STACK_KEYS}
    for p in block_params:
        attn = p["attn"]
        out["ln1_s"].append(p["norm1"]["scale"])
        out["ln1_b"].append(p["norm1"]["bias"])
        out["qkv_w"].append(attn["qkv"]["kernel"])
        out["qkv_b"].append(attn["qkv"]["bias"])
        out["proj_w"].append(attn["proj"]["kernel"])
        out["proj_b"].append(attn["proj"]["bias"])
        out["ln2_s"].append(p["norm2"]["scale"])
        out["ln2_b"].append(p["norm2"]["bias"])
        out["fc1_w"].append(p["mlp"]["fc1"]["kernel"])
        out["fc1_b"].append(p["mlp"]["fc1"]["bias"])
        out["fc2_w"].append(p["mlp"]["fc2"]["kernel"])
        out["fc2_b"].append(p["mlp"]["fc2"]["bias"])
        table = np.asarray(attn["relative_position_bias_table"])
        bias = table[idx].reshape(window * window, window * window, -1)
        out["rpb"].append(bias.transpose(2, 0, 1).astype(np.float32))
    return {k: jnp.stack([jnp.asarray(v) for v in vals])
            for k, vals in out.items()}
