"""Modulated deformable convolution (DCNv2) as an XLA gather program.

TPU-native replacement for csrc/cuda/deform_conv_kernel_cuda.cu (~874
lines of CUDA): each of the K=9 kernel taps becomes one vectorized
bilinear gather over the feature map followed by a (HW, Cin) x (Cin, Cout)
matmul on the MXU; autodiff supplies the backward pass the reference
hand-writes.

Offset layout matches DCNv2: offsets (H, W, 2K) as (dy, dx) pairs per tap
in row-major tap order; mask (H, W, K) in [0, 1].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jax.Array, y: jax.Array, xx: jax.Array) -> jax.Array:
    """x (H, W, C); y/xx (Ho, Wo) float sample positions -> (Ho, Wo, C).
    Out-of-bounds samples contribute zero (DCNv2 boundary behavior)."""
    H, W, C = x.shape
    valid = (y > -1.0) & (y < H) & (xx > -1.0) & (xx < W)
    y = jnp.clip(y, 0.0, H - 1)
    xx = jnp.clip(xx, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (xx - x0)[..., None]
    out = (x[y0, x0] * (1 - ly) * (1 - lx) + x[y0, x1] * (1 - ly) * lx
           + x[y1, x0] * ly * (1 - lx) + x[y1, x1] * ly * lx)
    return out * valid[..., None]


def modulated_deform_conv2d(x: jax.Array, offsets: jax.Array,
                            mask: jax.Array, weight: jax.Array,
                            bias: Optional[jax.Array] = None,
                            stride: int = 1) -> jax.Array:
    """Single image: x (H, W, Cin); offsets (Ho, Wo, 2K); mask (Ho, Wo, K);
    weight (kh, kw, Cin, Cout) with kh=kw=3, pad=1.  Returns
    (Ho, Wo, Cout) where Ho = ceil(H / stride).

    vmap over the batch axis for batched use.
    """
    H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    Ho, Wo = offsets.shape[0], offsets.shape[1]
    iy = jnp.arange(Ho, dtype=x.dtype) * stride
    ix = jnp.arange(Wo, dtype=x.dtype) * stride
    base_y = jnp.broadcast_to(iy[:, None], (Ho, Wo))
    base_x = jnp.broadcast_to(ix[None, :], (Ho, Wo))

    out = jnp.zeros((Ho, Wo, Cout), jnp.promote_types(x.dtype, jnp.float32))
    k = 0
    for ky in range(kh):
        for kx in range(kw):
            dy = offsets[..., 2 * k]
            dx = offsets[..., 2 * k + 1]
            sy = base_y + (ky - (kh - 1) / 2) + dy
            sx = base_x + (kx - (kw - 1) / 2) + dx
            sampled = _bilinear_gather(x, sy, sx)          # (Ho, Wo, Cin)
            sampled = sampled * mask[..., k][..., None]
            out = out + jnp.einsum(
                "hwc,cd->hwd", sampled, weight[ky, kx],
                preferred_element_type=jnp.float32)
            k += 1
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
