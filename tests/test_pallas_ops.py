"""Pallas kernel vs jnp reference parity (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from fiber_tpu.ops import window_attention as wa


def _bias(nW, h, N, rng, with_mask=False):
    b = rng.standard_normal((h, N, N)).astype(np.float32) * 0.1
    bias = np.broadcast_to(b, (nW, h, N, N)).copy()
    if with_mask:
        mask = np.where(rng.random((nW, 1, N, N)) < 0.3, -100.0, 0.0)
        bias = bias + mask
    return jnp.asarray(bias)


def _run_kernel_interpret(qkv, bias, num_heads, WB):
    return wa.fused_window_attention_windows(
        qkv, bias, num_heads, windows_per_program=WB, interpret=True)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("WB", [1, 2])
def test_window_attention_kernel_matches_reference(with_mask, WB):
    rng = np.random.default_rng(0)
    B, nW, N, C, h = 2, 4, 16, 16, 4
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C)), jnp.float32)
    bias = _bias(nW, h, N, rng, with_mask)
    ref = wa.window_attention_windows_reference(qkv, bias, h)
    out = _run_kernel_interpret(qkv, bias, h, WB)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_kernel_multi_group_matches_reference():
    """ng > 1 (several head groups per window) exercises the head-group
    grid dimension added in round 4: hd=64 -> G=2, h=4 -> ng=2."""
    rng = np.random.default_rng(7)
    B, nW, N, h, hd = 2, 3, 8, 4, 64
    C = h * hd
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C)), jnp.float32)
    bias = _bias(nW, h, N, rng, with_mask=True)
    ref = wa.window_attention_windows_reference(qkv, bias, h)
    out = wa.window_attention_packed_pallas(qkv, bias, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    xla = wa.window_attention_packed_xla(qkv, bias, h)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), atol=1e-5)


def test_packed_bwd_kernel_multi_group_gradients():
    """Pallas backward kernel (round 5) at ng > 1: dbias accumulates
    across the innermost batch grid axis per (window, group) block;
    grads wrt qkv AND bias must match differentiating the reference."""
    rng = np.random.default_rng(11)
    B, nW, N, h, hd = 3, 2, 8, 4, 64
    C = h * hd
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C)), jnp.float32)
    bias = _bias(nW, h, N, rng, with_mask=True)
    g = jnp.asarray(rng.standard_normal((B, nW, N, C)), jnp.float32)

    def loss_kernel(q, b):
        out = wa.fused_window_attention_windows(q, b, h, interpret=True)
        return jnp.sum(out * g)

    def loss_ref(q, b):
        return jnp.sum(wa.window_attention_windows_reference(q, b, h) * g)

    dq_k, db_k = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_r),
                               atol=1e-4, rtol=1e-4)


def test_reference_matches_naive_per_window():
    rng = np.random.default_rng(1)
    B, nW, N, C, h = 1, 2, 4, 8, 2
    hd = C // h
    qkv = rng.standard_normal((B, nW, N, 3 * C)).astype(np.float32)
    bias = np.asarray(_bias(nW, h, N, rng, True))

    out = wa.window_attention_windows_reference(jnp.asarray(qkv),
                                                jnp.asarray(bias), h)
    res = np.zeros((B, nW, N, C), np.float32)
    for b in range(B):
        for w in range(nW):
            flat = qkv[b, w].reshape(N, 3, h, hd)
            q, k, v = flat[:, 0], flat[:, 1], flat[:, 2]
            for hh in range(h):
                qq = q[:, hh] * hd ** -0.5
                att = qq @ k[:, hh].T + bias[w, hh]
                att = np.exp(att - att.max(-1, keepdims=True))
                att /= att.sum(-1, keepdims=True)
                res[b, w, :, hh * hd:(hh + 1) * hd] = att @ v[:, hh]
    np.testing.assert_allclose(np.asarray(out), res, atol=1e-5)


def test_window_attention_kernel_gradients_match_reference():
    """custom VJP (kernel fwd, XLA-recompute bwd): grads wrt qkv AND bias
    match differentiating the reference path — training on TPU needs
    this (the raw pallas_call has no transpose rule)."""
    rng = np.random.default_rng(3)
    B, nW, N, C, h = 2, 2, 4, 8, 2
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C)), jnp.float32)
    bias = _bias(nW, h, N, rng, with_mask=True)
    g = jnp.asarray(rng.standard_normal((B, nW, N, C)), jnp.float32)

    def loss_kernel(q, b):
        out = wa.fused_window_attention_windows(q, b, h,
                                                windows_per_program=1,
                                                interpret=True)
        return jnp.sum(out * g)

    def loss_ref(q, b):
        return jnp.sum(wa.window_attention_windows_reference(q, b, h) * g)

    dq_k, db_k = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_r),
                               atol=1e-5, rtol=1e-5)
