"""Fused window attention as a Pallas TPU kernel.

The hot op of the Swin backbone (SURVEY.md §7 step 2).  The XLA lowering
materializes the (B, nW, h, N, N) attention matrix in HBM twice per
block — at stage 1 of FIBER-Base/384 that is ~680 MB each way per block.
This kernel keeps QK^T + relative-position bias + shift mask + softmax +
PV entirely in VMEM, processing `windows_per_program` windows per grid
cell so the (N, hd) matmuls batch onto the MXU.

Head split/merge happens in XLA (Mosaic cannot reshape the lane
dimension); the kernel sees per-head (..., N, hd) operands and only
merges leading dims.

Semantics identical to the jnp reference path (tests/test_pallas_ops.py):
fp32 logits/softmax, bf16 in/out.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    """q/k/v_ref (1, WB, h, N, hd); bias_ref (WB, h, N, N);
    out_ref (1, WB, h, N, hd)."""
    _, WB, h, N, hd = q_ref.shape
    q = q_ref[0].reshape(WB * h, N, hd) * scale
    k = k_ref[0].reshape(WB * h, N, hd)
    v = v_ref[0].reshape(WB * h, N, hd)

    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (WB*h, N, N)
    attn = attn + bias_ref[...].astype(jnp.float32).reshape(WB * h, N, N)
    attn = jax.nn.softmax(attn, axis=-1)

    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (WB*h, N, hd)
    out_ref[...] = out.reshape(1, WB, h, N, hd).astype(out_ref.dtype)


# Probe note (v5e, round 2): in *isolation* the XLA lowering looked
# faster than the kernel at many-window stages (stage-1 3.05 vs 3.69 ms)
# and slower at few-window stages (stage-3 1.79 vs 0.51) — but gating
# the kernel off for stages 1-2 in the full model REGRESSED the rerank
# bench 760 -> 692 pairs/s: inside the real program the XLA path's
# (B, nW, h, N, N) fp32 logits break surrounding fusions and round-trip
# HBM.  Keep the kernel everywhere.


def _pick_wb(nW: int, N: int, C: int, num_heads: int) -> int:
    # ~4MB working-set budget: Mosaic double-buffers every in/out block,
    # and the fp32 attention intermediate lives on the VMEM stack too
    budget = 4 * 1024 * 1024
    per_window = (3 * N * C * 2 + num_heads * N * N * 8 + N * C * 2)
    wb = max(1, min(nW, budget // max(per_window, 1)))
    while nW % wb:
        wb -= 1
    return wb


def _kernel_call(qkv: jax.Array, bias: jax.Array, num_heads: int,
                 windows_per_program: int, interpret: bool) -> jax.Array:
    """Raw pallas_call (forward only)."""
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    scale = hd ** -0.5
    WB = windows_per_program or _pick_wb(nW, N, C, h)

    x = qkv.reshape(B, nW, N, 3, h, hd)
    x = x.transpose(3, 0, 1, 4, 2, 5)                # (3, B, nW, h, N, hd)
    q, k, v = x[0], x[1], x[2]

    # grid order (window-group, batch): the bias block's index map is
    # constant along the inner batch axis, so Mosaic skips re-fetching the
    # (often multi-MB) bias between consecutive iterations
    spec_qkv = pl.BlockSpec((1, WB, h, N, hd),
                            lambda j, b: (b, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(nW // WB, B),
        in_specs=[spec_qkv, spec_qkv, spec_qkv,
                  pl.BlockSpec((WB, h, N, N), lambda j, b: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, WB, h, N, hd),
                               lambda j, b: (b, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nW, h, N, hd), qkv.dtype),
        interpret=interpret,
    )(q, k, v, bias)
    return out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)


# Training support: the kernel defines no transpose rule, so give it a
# custom VJP — forward runs the packed kernel; backward runs a packed
# Pallas backward kernel (flash-attention-style: recompute the softmax
# from (qkv, bias) in VMEM, no (B, nW, h, N, N) probs in the residuals).
# Round 5: the backward previously differentiated the packed XLA
# formulation, whose G-fold FLOP overhead runs through HBM-resident
# (G*N, N) fp32 logits — the measured pretrain-step drag (VERDICT r4
# item 2).  d(bias) flows so the relative-position-bias table trains.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _window_attention(qkv, bias, num_heads, windows_per_program,
                      interpret):
    return window_attention_packed_pallas(qkv, bias, num_heads,
                                          interpret=interpret)


def _wa_fwd(qkv, bias, num_heads, windows_per_program, interpret):
    out = window_attention_packed_pallas(qkv, bias, num_heads,
                                         interpret=interpret)
    return out, (qkv, bias)


def _wa_bwd(num_heads, windows_per_program, interpret, res, g):
    qkv, bias = res
    return window_attention_packed_pallas_bwd(qkv, bias, g, num_heads,
                                              interpret=interpret)


_window_attention.defvjp(_wa_fwd, _wa_bwd)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "windows_per_program",
                                    "batch_per_program", "interpret"))
def fused_window_attention_windows(qkv: jax.Array, bias: jax.Array,
                                   num_heads: int,
                                   windows_per_program: int = 0,
                                   batch_per_program: int = 0,
                                   interpret: bool = False) -> jax.Array:
    """qkv (B, nW, N, 3C) pre-partitioned + pre-projected;
    bias (nW, h, N, N) additive per-window logit bias (RPB + shift mask).
    Returns (B, nW, N, C).  Differentiable (custom VJP: kernel forward,
    XLA-recompute backward).

    Round 3: the forward runs the PACKED head-group kernel
    (window_attention_packed_pallas), 3-4x faster than the batched
    per-head kernel at every FIBER stage shape (tools/probe_packed.py:
    s3 0.0281 vs 0.1188, s1 0.33 vs 1.05 ms/item at B=64) — the
    hd=32 batched dots were the whole-model bottleneck.  The legacy
    kernel remains as _kernel_call; windows_per_program is kept for API
    compatibility (the packed grid is (nW, B) and ignores it).
    """
    del batch_per_program  # probed: multi-batch blocks force Mosaic
    # relayouts that cost far more than the shared-bias DMA they save
    return _window_attention(qkv, bias, num_heads, windows_per_program,
                             interpret)


def window_attention_packed_xla(qkv: jax.Array, bias: jax.Array,
                                num_heads: int) -> jax.Array:
    """Block-diagonal head-packed window attention, pure XLA.

    At FIBER's head dim 32 the per-head QK^T/PV matmuls contract over
    K=32 — an MXU pad-to-128 that runs at 1-2 TF/s through Mosaic/XLA
    batched dots (tools/probe_blk3.py round 3).  Packing G = 128/hd
    heads into one contraction makes the matmuls dense 2D:

      qm (G*N, Cg)  = heads g*G..g*G+G-1 stacked along M, each masked to
                      its own hd-wide channel block (block-diagonal)
      logits        = qm @ k_g^T        -> (G*N, N): row (j, n) only
                      sees head j's channels of k, so cross-head terms
                      vanish without any zero-padding of k
      z             = attn @ v_g        -> (G*N, Cg)
      out_g (N, Cg) = sum_j z[j] * head-mask  (the head merge, free of
                      the (h, N, hd) -> (N, C) lane transpose)

    G^2/G = G-fold FLOP overhead (G=4 at hd=32) but every matmul is
    (576, 128) x (128, 144)-class, which the MXU pipelines at full rate.
    Numerics identical to the reference path: fp32 logits + softmax,
    bf16 PV.
    """
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    G = min(h, max(1, 128 // hd))
    ng = h // G
    Cg = G * hd
    scale = hd ** -0.5

    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    # (B, nW, ng, N, Cg): head-group channel slices are contiguous
    qg = q.reshape(B, nW, N, ng, Cg).transpose(0, 1, 3, 2, 4)
    kg = k.reshape(B, nW, N, ng, Cg).transpose(0, 1, 3, 2, 4)
    vg = v.reshape(B, nW, N, ng, Cg).transpose(0, 1, 3, 2, 4)

    lane = jnp.arange(Cg)
    mask = (lane[None, :] // hd == jnp.arange(G)[:, None]).astype(
        qkv.dtype)                                    # (G, Cg)
    qm = qg[:, :, :, None] * mask[None, None, None, :, None]
    qm = qm.reshape(B, nW, ng, G * N, Cg)

    logits = jnp.einsum("bwgmc,bwgnc->bwgmn", qm * scale, kg,
                        preferred_element_type=jnp.float32)
    # bias (nW, h, N, N) -> (nW, ng, G*N, N): a pure leading reshape
    logits = logits + bias.astype(jnp.float32).reshape(
        1, nW, ng, G * N, N)
    attn = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)

    z = jnp.einsum("bwgmn,bwgnc->bwgmc", attn, vg)    # (B,nW,ng,G*N,Cg)
    z = z.reshape(B, nW, ng, G, N, Cg) * mask[None, None, None, :, None]
    out = z.sum(axis=3)                               # (B, nW, ng, N, Cg)
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)
    return out.astype(qkv.dtype)


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                   scale: float, G: int, hd: int):
    """Pallas version of the packed formulation: one grid cell per
    (head-group, window, batch) element; the group's dense 2D matmuls
    run entirely in VMEM.

    q/k/v_ref (1, 1, N, Cg); bias_ref (1, 1, G*N, N) fp32 (leading-folded
    outside); out_ref (1, 1, N, Cg).  Gridding over head groups (round 4)
    bounds the per-program VMEM to one group's logits — the previous
    all-groups-unrolled body OOMed the 16M scoped VMEM at stage-4 shapes
    (h=32, ng=8) once the batch grew past 64 (docs/ROUND3_NOTES.md)."""
    _, _, N, Cg = q_ref.shape

    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 1, Cg), 2)
    grp = jax.lax.broadcasted_iota(jnp.int32, (G, 1, Cg), 0)
    mask = (lane // hd == grp).astype(q_ref.dtype)    # (G, 1, Cg)

    qg = q_ref[0, 0]                                  # (N, Cg)
    kg = k_ref[0, 0]
    vg = v_ref[0, 0]
    qm = (qg[None] * mask).reshape(G * N, Cg)         # block-diagonal
    logits = jax.lax.dot_general(
        qm, kg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (G*N, N)
    logits = logits * scale + bias_ref[0, 0]
    attn = jax.nn.softmax(logits, axis=-1).astype(vg.dtype)
    z = jax.lax.dot_general(
        attn, vg, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (G*N, Cg)
    zg = z.reshape(G, N, Cg) * mask
    out_ref[0, 0] = zg.sum(axis=0).astype(out_ref.dtype)


def window_attention_packed_pallas(qkv: jax.Array, bias: jax.Array,
                                   num_heads: int,
                                   interpret: bool = False) -> jax.Array:
    """Packed head-group window attention as a Pallas kernel (see
    window_attention_packed_xla for the math).  Keeps the fp32 logits
    and the block-diagonal staging entirely in VMEM."""
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    scale = hd ** -0.5
    G = min(h, max(1, 128 // hd))
    ng = h // G
    Cg = G * hd
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    bias2 = bias.astype(jnp.float32).reshape(nW, ng, G * N, N)

    # grid (ng, nW, B): B innermost so the (possibly multi-MB) bias block
    # stays resident across the batch sweep
    spec = pl.BlockSpec((1, 1, N, Cg), lambda g, w, b: (b, w, 0, g),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, G=G, hd=hd),
        grid=(ng, nW, B),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, G * N, N),
                               lambda g, w, b: (w, g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, nW, N, C), qkv.dtype),
        interpret=interpret,
    )(q, k, v, bias2)
    return out


def _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dbias_ref, *,
                       scale: float, G: int, hd: int):
    """Backward of _packed_kernel, one (head-group, window, batch) grid
    cell: recompute logits + softmax in VMEM, then the four gradient
    contractions as dense 2D MXU matmuls at the same
    (G*N, max(N, Cg))-class shapes as the forward.

    dbias accumulates across the batch axis: the grid is (ng, nW, B)
    with B innermost and dbias's index map ignores b, so Mosaic keeps
    the block resident and revisits it — initialized at b == 0.
    Gradient matmuls run with bf16 operands (fp32 accumulate), the
    standard flash-backward precision; dbias/dlogits stay fp32."""
    _, _, N, Cg = q_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 1, Cg), 2)
    grp = jax.lax.broadcasted_iota(jnp.int32, (G, 1, Cg), 0)
    mask = (lane // hd == grp).astype(q_ref.dtype)    # (G, 1, Cg)

    qg = q_ref[0, 0]                                  # (N, Cg)
    kg = k_ref[0, 0]
    vg = v_ref[0, 0]
    do = do_ref[0, 0]
    qm = (qg[None] * mask).reshape(G * N, Cg)         # block-diagonal
    logits = jax.lax.dot_general(
        qm, kg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (G*N, N)
    logits = logits * scale + bias_ref[0, 0]
    p = jax.nn.softmax(logits, axis=-1)               # fp32 (G*N, N)

    dz = (do[None] * mask).reshape(G * N, Cg)         # (G*N, Cg)
    pb = p.astype(vg.dtype)
    # dv = P^T @ dz  (contract over the G*N rows)
    dv = jax.lax.dot_general(
        pb, dz, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (N, Cg)
    # dP = dz @ v^T
    dp = jax.lax.dot_general(
        dz, vg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (G*N, N)
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    @pl.when(pl.program_id(2) == 0)
    def _():
        dbias_ref[0, 0] = dlogits

    @pl.when(pl.program_id(2) != 0)
    def _():
        dbias_ref[0, 0] += dlogits

    dlb = dlogits.astype(qg.dtype)
    # dqm = scale * dlogits @ k; then fold the G row-blocks back to (N, Cg)
    dqm = jax.lax.dot_general(
        dlb, kg, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (G*N, Cg)
    dqg = (dqm.reshape(G, N, Cg) * mask).sum(axis=0) * scale
    # dk = scale * dlogits^T @ qm
    dk = jax.lax.dot_general(
        dlb, qm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (N, Cg)
    dq_ref[0, 0] = dqg.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def window_attention_packed_pallas_bwd(qkv: jax.Array, bias: jax.Array,
                                       dout: jax.Array, num_heads: int,
                                       interpret: bool = False):
    """VJP of window_attention_packed_pallas: (dqkv, dbias)."""
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    scale = hd ** -0.5
    G = min(h, max(1, 128 // hd))
    ng = h // G
    Cg = G * hd
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    bias2 = bias.astype(jnp.float32).reshape(nW, ng, G * N, N)

    spec = pl.BlockSpec((1, 1, N, Cg), lambda g, w, b: (b, w, 0, g),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, G * N, N), lambda g, w, b: (w, g, 0, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv, dbias2 = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, G=G, hd=hd),
        grid=(ng, nW, B),
        in_specs=[spec, spec, spec, bias_spec, spec],
        out_specs=[spec, spec, spec, bias_spec],
        out_shape=[jax.ShapeDtypeStruct((B, nW, N, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, nW, N, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, nW, N, C), qkv.dtype),
                   jax.ShapeDtypeStruct((nW, ng, G * N, N), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias2, dout)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    dbias = dbias2.reshape(nW, h, N, N).astype(bias.dtype)
    return dqkv, dbias


def window_attention_windows_reference(qkv: jax.Array, bias: jax.Array,
                                       num_heads: int) -> jax.Array:
    """Pure-jnp semantics twin (the XLA path; CPU fallback)."""
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    scale = hd ** -0.5

    x = qkv.reshape(B, nW, N, 3, h, hd)
    q = x[:, :, :, 0].transpose(0, 1, 3, 2, 4) * scale  # (B, nW, h, N, hd)
    k = x[:, :, :, 1].transpose(0, 1, 3, 2, 4)
    v = x[:, :, :, 2].transpose(0, 1, 3, 2, 4)

    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)
    out = out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)
    return out
