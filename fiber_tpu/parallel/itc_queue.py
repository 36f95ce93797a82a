"""ALBEF-style ITC feature + raw-input queue as a functional pytree.

The reference keeps five ring buffers as registered torch buffers updated
with NCCL all-gathers (ref: fiber_module.py:61-70, 181-222).  Here the queue
is explicit state threaded through the jit-compiled train step: under pjit's
global view, "enqueue the all-gathered batch" is simply "enqueue the global
batch" — XLA lays the writes out across the data mesh.

Raw image inputs are stored in the compute dtype (bf16 on TPU) to halve the
HBM footprint of the 4096-slot image queue; features stay fp32.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class ItcQueue:
    image_feats: jax.Array    # (Q, hs) fp32 — normalized image cls feats
    text_feats: jax.Array     # (Q, hs) fp32
    image_inputs: jax.Array   # (Q, S, S, 3) compute dtype
    text_inputs: jax.Array    # (Q, L) int32
    text_masks: jax.Array     # (Q, L) int32
    ptr: jax.Array            # () int32 ring pointer
    total: jax.Array          # () int32 lifetime count (saturates reads)

    @property
    def size(self) -> int:
        return self.image_feats.shape[0]

    @classmethod
    def create(cls, rng: jax.Array, queue_size: int, hidden_size: int,
               image_size: int, max_text_len: int,
               input_dtype=jnp.bfloat16) -> "ItcQueue":
        # feature queues init randn, matching the reference buffers
        # (fiber_module.py:64-65) whose random content participates in the
        # contrastive denominator until overwritten.
        k1, k2 = jax.random.split(rng)
        return cls(
            image_feats=jax.random.normal(k1, (queue_size, hidden_size),
                                          jnp.float32),
            text_feats=jax.random.normal(k2, (queue_size, hidden_size),
                                         jnp.float32),
            image_inputs=jnp.zeros((queue_size, image_size, image_size, 3),
                                   input_dtype),
            text_inputs=jnp.zeros((queue_size, max_text_len), jnp.int32),
            text_masks=jnp.zeros((queue_size, max_text_len), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            total=jnp.zeros((), jnp.int32),
        )

    def enqueue(self, image_feat: jax.Array, text_feat: jax.Array,
                image_input: jax.Array, text_input: jax.Array,
                text_mask: jax.Array) -> "ItcQueue":
        """Ring-buffer write of the (global) batch; no gradients flow."""
        bs = image_feat.shape[0]
        idx = (self.ptr + jnp.arange(bs, dtype=jnp.int32)) % self.size
        sg = jax.lax.stop_gradient
        return self.replace(
            image_feats=self.image_feats.at[idx].set(
                sg(image_feat).astype(jnp.float32)),
            text_feats=self.text_feats.at[idx].set(
                sg(text_feat).astype(jnp.float32)),
            image_inputs=self.image_inputs.at[idx].set(
                sg(image_input).astype(self.image_inputs.dtype)),
            text_inputs=self.text_inputs.at[idx].set(text_input),
            text_masks=self.text_masks.at[idx].set(text_mask),
            ptr=(self.ptr + bs) % self.size,
            total=self.total + bs,
        )

    def valid_count(self) -> jax.Array:
        """Number of filled slots (reference reads queue_total uncapped for
        slicing, but slices are bounded by queue_size; we cap explicitly)."""
        return jnp.minimum(self.total, jnp.int32(self.size))
