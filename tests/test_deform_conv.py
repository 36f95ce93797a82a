"""modulated_deform_conv2d vs a scalar transliteration of the reference
DCNv2 CUDA kernel (csrc/cuda/deform_conv_kernel_cuda.cu:
dmcn_im2col_bilinear :93-122 + modulated_deformable_im2col_gpu_kernel —
the reference ships no CPU binding, so the loop below mirrors the kernel
line-for-line as ground truth), including the partial-corner boundary
behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from fiber_tpu.detection.deform_conv import modulated_deform_conv2d


def _dmcn_bilinear(plane, H, W, h, w):
    h_low, w_low = int(np.floor(h)), int(np.floor(w))
    h_high, w_high = h_low + 1, w_low + 1
    lh, lw = h - h_low, w - w_low
    hh, hw = 1 - lh, 1 - lw
    v1 = plane[h_low, w_low] if (h_low >= 0 and w_low >= 0) else 0.0
    v2 = plane[h_low, w_high] if (h_low >= 0 and w_high <= W - 1) else 0.0
    v3 = plane[h_high, w_low] if (h_high <= H - 1 and w_low >= 0) else 0.0
    v4 = (plane[h_high, w_high]
          if (h_high <= H - 1 and w_high <= W - 1) else 0.0)
    return hh * hw * v1 + hh * lw * v2 + lh * hw * v3 + lh * lw * v4


def _kernel_reference(x, offsets, mask, weight, bias, stride):
    H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    Ho, Wo = offsets.shape[0], offsets.shape[1]
    out = np.zeros((Ho, Wo, Cout), np.float32)
    for ho in range(Ho):
        for wo in range(Wo):
            acc = np.zeros(Cout, np.float32)
            for ky in range(kh):
                for kx in range(kw):
                    k = ky * kw + kx
                    sy = (ho * stride + (ky - (kh - 1) / 2)
                          + offsets[ho, wo, 2 * k])
                    sx = (wo * stride + (kx - (kw - 1) / 2)
                          + offsets[ho, wo, 2 * k + 1])
                    if not (-1.0 < sy < H and -1.0 < sx < W):
                        continue
                    m = mask[ho, wo, k]
                    for ci in range(Cin):
                        v = _dmcn_bilinear(x[:, :, ci], H, W, sy, sx)
                        acc += v * m * weight[ky, kx, ci]
            out[ho, wo] = acc + (bias if bias is not None else 0.0)
    return out


def _setup(seed, stride=1, off_scale=2.5):
    rng = np.random.default_rng(seed)
    H, W, Cin, Cout = 9, 11, 3, 4
    Ho, Wo = -(-H // stride), -(-W // stride)
    x = rng.standard_normal((H, W, Cin)).astype(np.float32)
    # large offsets exercise out-of-bounds + partial border samples
    off = (rng.standard_normal((Ho, Wo, 18)) * off_scale).astype(np.float32)
    mask = rng.random((Ho, Wo, 9)).astype(np.float32)
    w = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)
    return x, off, mask, w, b


def test_dcnv2_matches_kernel_semantics():
    x, off, mask, w, b = _setup(0)
    expect = _kernel_reference(x, off, mask, w, b, 1)
    got = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                  jnp.asarray(mask), jnp.asarray(w),
                                  jnp.asarray(b), stride=1)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4,
                               atol=1e-4)


def test_dcnv2_stride2():
    x, off, mask, w, b = _setup(1, stride=2)
    expect = _kernel_reference(x, off, mask, w, b, 2)
    got = modulated_deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                  jnp.asarray(mask), jnp.asarray(w),
                                  jnp.asarray(b), stride=2)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4,
                               atol=1e-4)


def test_dcnv2_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCNv2 reduces to a plain 3x3
    SAME conv."""
    rng = np.random.default_rng(2)
    H, W, Cin, Cout = 8, 10, 3, 5
    x = rng.standard_normal((H, W, Cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32)
    got = modulated_deform_conv2d(
        jnp.asarray(x), jnp.zeros((H, W, 18), jnp.float32),
        jnp.ones((H, W, 9), jnp.float32), jnp.asarray(w))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dcnv2_differentiable():
    x, off, mask, w, b = _setup(3)

    def f(xx, oo, mm, ww):
        return modulated_deform_conv2d(xx, oo, mm, ww,
                                       jnp.asarray(b)).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
        jnp.asarray(w))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(grads[1]).sum()) > 0   # offsets get gradient
