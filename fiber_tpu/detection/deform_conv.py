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

    Exact dmcn_im2col_bilinear semantics (deform_conv_kernel_cuda.cu:93-
    122): each of the four corners contributes zero when it falls outside
    the map (zero padding -> PARTIAL contributions when the sample point
    straddles the border), and the whole sample is zero outside
    (-1, H) x (-1, W) (the caller's h > -1 && h < height guard).

    Corners are fetched with a flattened row index + jnp.take: a
    single-axis gather with lane-contiguous rows, which the TPU lowers
    ~4x faster than the equivalent 2D advanced-index gather
    (tools/profile_deform.py, round 3)."""
    H, W, C = x.shape
    xf = x.reshape(H * W, C)
    valid = (y > -1.0) & (y < H) & (xx > -1.0) & (xx < W)
    y0f = jnp.floor(y)
    x0f = jnp.floor(xx)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    y1 = y0 + 1
    x1 = x0 + 1
    ly = (y - y0f)[..., None]
    lx = (xx - x0f)[..., None]

    def g(yi, xi):
        ok = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return jnp.take(xf, idx, axis=0) * ok[..., None]

    out = (g(y0, x0) * (1 - ly) * (1 - lx) + g(y0, x1) * (1 - ly) * lx
           + g(y1, x0) * ly * (1 - lx) + g(y1, x1) * ly * lx)
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
    K = kh * kw
    Ho, Wo = offsets.shape[0], offsets.shape[1]
    iy = jnp.arange(Ho, dtype=x.dtype) * stride
    ix = jnp.arange(Wo, dtype=x.dtype) * stride
    base_y = jnp.broadcast_to(iy[:, None], (Ho, Wo))
    base_x = jnp.broadcast_to(ix[None, :], (Ho, Wo))

    # TPU gathers are HBM-byte-bound (~145 GB/s, tools/probe_take round
    # 3), so the hot path minimizes materialized intermediates, not
    # gather count: the 2x2 bilinear footprint is pre-packed into
    # channels of ONE map over a zero border — xp4[h, w] = [x[h, w] |
    # x[h, w+1] | x[h+1, w] | x[h+1, w+1]] — so each tap is a single
    # 4*Cin-wide row gather whose bilinear weighting fuses into one
    # bf16 write, instead of 4 separately materialized corner gathers
    # plus an fp32 accumulator round-trip per tap.  The zero border
    # reproduces dmcn_im2col_bilinear's out-of-map corner semantics
    # exactly (deform_conv_kernel_cuda.cu:93-122): corner index -1 or
    # H/W lands on the pad, fully-outside samples die on `valid`.
    # All K taps then feed one im2col MXU matmul in the input dtype.
    f32 = jnp.float32
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    xp4 = jnp.concatenate([xp[:-1, :-1], xp[:-1, 1:],
                           xp[1:, :-1], xp[1:, 1:]], axis=-1)
    Hp, Wp = H + 1, W + 1
    xpf = xp4.reshape(Hp * Wp, 4 * Cin)

    taps = []
    k = 0
    for ky in range(kh):
        for kx in range(kw):
            dy = offsets[..., 2 * k].astype(f32)
            dx = offsets[..., 2 * k + 1].astype(f32)
            sy = base_y.astype(f32) + (ky - (kh - 1) / 2) + dy
            sx = base_x.astype(f32) + (kx - (kw - 1) / 2) + dx
            valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
            y0f = jnp.floor(sy)
            x0f = jnp.floor(sx)
            ly = (sy - y0f)[..., None]
            lx = (sx - x0f)[..., None]
            # +1 maps corner -1 onto the zero border; clip keeps already-
            # masked fully-outside samples in range
            yi = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Hp - 1)
            xi = jnp.clip(x0f.astype(jnp.int32) + 1, 0, Wp - 1)
            g = jnp.take(xpf, yi * Wp + xi, axis=0)    # (Ho, Wo, 4Cin)
            C = Cin
            sampled = (g[..., :C] * ((1 - ly) * (1 - lx))
                       + g[..., C:2 * C] * ((1 - ly) * lx)
                       + g[..., 2 * C:3 * C] * (ly * (1 - lx))
                       + g[..., 3 * C:] * (ly * lx))
            w_pt = valid[..., None] * mask[..., k][..., None].astype(f32)
            taps.append((sampled * w_pt).astype(x.dtype))
            k += 1
    cols = jnp.stack(taps, axis=2)                     # (Ho, Wo, K, Cin)
    out = jnp.einsum("hwkc,kcd->hwd", cols,
                     weight.reshape(K, Cin, Cout).astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_psroi_pool(x: jax.Array, rois: jax.Array,
                      trans: Optional[jax.Array], *,
                      spatial_scale: float, output_dim: int,
                      group_size: int, pooled_size: int,
                      part_size: Optional[int] = None,
                      sample_per_part: int = 4,
                      trans_std: float = 0.0) -> jax.Array:
    """Deformable position-sensitive ROI pooling
    (csrc/cuda/deform_pool_kernel_cuda.cu DeformablePSROIPoolForwardKernel,
    the one reference csrc kernel without another XLA counterpart; unused
    by FIBER's RPN_ONLY configs but part of the capability surface).

    x     (H, W, C) with C = output_dim * group_size**2 (NHWC single
          image; the roi batch index selects among vmapped images by the
          caller — here all rois read this one feature map)
    rois  (R, 4) [x1, y1, x2, y2] in input-image coordinates
    trans (R, num_classes, 2, part_size, part_size) normalized bin
          offsets (None = no_trans)
    Returns (R, pooled_size, pooled_size, output_dim); autodiff supplies
    the backward pass the reference hand-writes.
    """
    H, W, C = x.shape
    P = pooled_size
    S = sample_per_part
    if part_size is None:
        part_size = pooled_size
    R = rois.shape[0]
    f32 = jnp.float32

    # [start, end) interval (kernel lines 83-93)
    start_w = jnp.round(rois[:, 0]) * spatial_scale - 0.5
    start_h = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    end_w = (jnp.round(rois[:, 2]) + 1.0) * spatial_scale - 0.5
    end_h = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / P
    bin_h = roi_h / P
    sub_w = bin_w / S
    sub_h = bin_h / S

    ph = jnp.arange(P)
    pw = jnp.arange(P)
    part_h = jnp.floor(ph.astype(f32) / P * part_size).astype(jnp.int32)
    part_w = jnp.floor(pw.astype(f32) / P * part_size).astype(jnp.int32)

    if trans is not None:
        num_classes = trans.shape[1]
        channels_each_class = output_dim // num_classes
        # (R, num_classes, P, P) offsets per bin
        t = trans[:, :, :, part_h][:, :, :, :, part_w]  # (R,NC,2,P,P)
        trans_x = t[:, :, 0] * trans_std
        trans_y = t[:, :, 1] * trans_std
    else:
        num_classes = 1
        channels_each_class = output_dim
        trans_x = jnp.zeros((R, 1, P, P), f32)
        trans_y = jnp.zeros((R, 1, P, P), f32)

    # sample grid: (R, NC, P, P, S, S)
    wstart = (pw[None, None, None, :].astype(f32)
              * bin_w[:, None, None, None]
              + start_w[:, None, None, None]
              + trans_x * roi_w[:, None, None, None])
    hstart = (ph[None, None, :, None].astype(f32)
              * bin_h[:, None, None, None]
              + start_h[:, None, None, None]
              + trans_y * roi_h[:, None, None, None])
    iw = jnp.arange(S, dtype=f32)
    ih = jnp.arange(S, dtype=f32)
    sw = (wstart[..., None, None]
          + iw[None, None, None, None, None, :]
          * sub_w[:, None, None, None, None, None])
    sh = (hstart[..., None, None]
          + ih[None, None, None, None, :, None]
          * sub_h[:, None, None, None, None, None])

    # skip-sample predicate (kernel lines 126-130), then clamp
    keep = ((sw >= -0.5) & (sw <= W - 0.5)
            & (sh >= -0.5) & (sh <= H - 0.5))
    swc = jnp.clip(sw, 0.0, W - 1.0)
    shc = jnp.clip(sh, 0.0, H - 1.0)

    # bilinear_interp (kernel lines 32-52): floor/ceil corners
    x0 = jnp.floor(swc).astype(jnp.int32)
    x1 = jnp.minimum(jnp.ceil(swc).astype(jnp.int32), W - 1)
    y0 = jnp.floor(shc).astype(jnp.int32)
    y1 = jnp.minimum(jnp.ceil(shc).astype(jnp.int32), H - 1)
    lx = swc - x0
    ly = shc - y0

    xf = x.astype(f32)

    def corner(yi, xi):
        return xf[yi, xi]                      # (..., C) gather

    val = (corner(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
           + corner(y1, x0) * (ly * (1 - lx))[..., None]
           + corner(y0, x1) * ((1 - ly) * lx)[..., None]
           + corner(y1, x1) * (ly * lx)[..., None])
    val = val * keep[..., None]                # (R,NC,P,P,S,S,C)
    counts = keep.sum(axis=(-1, -2)).astype(f32)          # (R,NC,P,P)
    summed = val.sum(axis=(-2, -3))                        # (R,NC,P,P,C)

    # position-sensitive channel select: for output channel ctop at bin
    # (ph, pw): c = (ctop*G + gh)*G + gw (kernel lines 136-141)
    G = group_size
    gh = jnp.clip((ph * G) // P, 0, G - 1)                 # (P,)
    gw = jnp.clip((pw * G) // P, 0, G - 1)
    ctop = jnp.arange(output_dim)
    cidx = ((ctop[:, None, None] * G + gh[None, :, None]) * G
            + gw[None, None, :])                           # (OD,P,P)
    onehot = jax.nn.one_hot(cidx, C, dtype=f32)            # (OD,P,P,C)
    # class of each output channel selects which trans grid was used
    cls_of = ctop // channels_each_class                   # (OD,)
    summed_per_ctop = summed[:, cls_of]                    # (R,OD,P,P,C)
    counts_per_ctop = counts[:, cls_of]                    # (R,OD,P,P)
    pooled = jnp.einsum("ryhwc,yhwc->ryhw", summed_per_ctop, onehot)
    out = jnp.where(counts_per_ctop > 0,
                    pooled / jnp.maximum(counts_per_ctop, 1.0), 0.0)
    return out.transpose(0, 2, 3, 1).astype(x.dtype)       # (R,P,P,OD)
