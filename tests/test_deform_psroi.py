"""deform_psroi_pool vs a direct numpy transliteration of the reference
CUDA kernel (csrc/cuda/deform_pool_kernel_cuda.cu
DeformablePSROIPoolForwardKernel — the reference ships no CPU binding,
so the scalar loop below mirrors the kernel line-for-line as ground
truth)."""

import numpy as np
import jax
import jax.numpy as jnp

from fiber_tpu.detection.deform_conv import deform_psroi_pool


def _kernel_reference(x_hwc, rois, trans, spatial_scale, output_dim,
                      group_size, pooled_size, part_size,
                      sample_per_part, trans_std):
    """Scalar transliteration of the CUDA forward (kernel lines 55-143)."""
    H, W, C = x_hwc.shape
    data = x_hwc.transpose(2, 0, 1)    # kernel is CHW
    P = pooled_size
    R = rois.shape[0]
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[1]
    channels_each_class = output_dim // num_classes
    out = np.zeros((R, P, P, output_dim), np.float32)

    def bilinear(plane, xx, y):
        x1, x2 = int(np.floor(xx)), int(np.ceil(xx))
        y1, y2 = int(np.floor(y)), int(np.ceil(y))
        dx, dy = xx - x1, y - y1
        v11 = plane[y1, x1]
        v12 = plane[y2, x1]
        v21 = plane[y1, x2]
        v22 = plane[y2, x2]
        return ((1 - dx) * (1 - dy) * v11 + (1 - dx) * dy * v12
                + dx * (1 - dy) * v21 + dx * dy * v22)

    for n in range(R):
        rsw = round(rois[n, 0]) * spatial_scale - 0.5
        rsh = round(rois[n, 1]) * spatial_scale - 0.5
        rew = (round(rois[n, 2]) + 1.0) * spatial_scale - 0.5
        reh = (round(rois[n, 3]) + 1.0) * spatial_scale - 0.5
        roi_w = max(rew - rsw, 0.1)
        roi_h = max(reh - rsh, 0.1)
        bin_h, bin_w = roi_h / P, roi_w / P
        sub_h = bin_h / sample_per_part
        sub_w = bin_w / sample_per_part
        for ctop in range(output_dim):
            class_id = ctop // channels_each_class
            for ph in range(P):
                for pw in range(P):
                    part_h = int(np.floor(ph / P * part_size))
                    part_w = int(np.floor(pw / P * part_size))
                    tx = 0.0 if no_trans else \
                        trans[n, class_id, 0, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else \
                        trans[n, class_id, 1, part_h, part_w] * trans_std
                    wstart = pw * bin_w + rsw + tx * roi_w
                    hstart = ph * bin_h + rsh + ty * roi_h
                    gw = min(max(int(np.floor(pw * group_size / P)), 0),
                             group_size - 1)
                    gh = min(max(int(np.floor(ph * group_size / P)), 0),
                             group_size - 1)
                    c = (ctop * group_size + gh) * group_size + gw
                    s, cnt = 0.0, 0
                    for ih in range(sample_per_part):
                        for iw in range(sample_per_part):
                            w = wstart + iw * sub_w
                            h = hstart + ih * sub_h
                            if (w < -0.5 or w > W - 0.5 or h < -0.5
                                    or h > H - 0.5):
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            s += bilinear(data[c], w, h)
                            cnt += 1
                    out[n, ph, pw, ctop] = 0.0 if cnt == 0 else s / cnt
    return out


def _setup(seed=0, no_trans=False, num_classes=2):
    rng = np.random.default_rng(seed)
    OD, G, P = 4 * num_classes, 2, 4
    C = OD * G * G
    H, W = 12, 16
    x = rng.standard_normal((H, W, C)).astype(np.float32)
    rois = np.array([[2, 3, 40, 30], [0, 0, 63, 47], [10, 8, 20, 44],
                     [30, 20, 33, 22]], np.float32)
    trans = None if no_trans else rng.standard_normal(
        (len(rois), num_classes, 2, P, P)).astype(np.float32)
    kw = dict(spatial_scale=0.25, output_dim=OD, group_size=G,
              pooled_size=P, part_size=P, sample_per_part=3,
              trans_std=0.1)
    return x, rois, trans, kw


def test_deform_psroi_matches_kernel_semantics():
    x, rois, trans, kw = _setup()
    expect = _kernel_reference(x, rois, trans, **kw)
    got = deform_psroi_pool(jnp.asarray(x), jnp.asarray(rois),
                            jnp.asarray(trans), **kw)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5,
                               atol=1e-5)


def test_deform_psroi_no_trans():
    x, rois, _, kw = _setup(seed=1, no_trans=True)
    expect = _kernel_reference(x, rois, None, **kw)
    got = deform_psroi_pool(jnp.asarray(x), jnp.asarray(rois), None, **kw)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5,
                               atol=1e-5)


def test_deform_psroi_differentiable():
    x, rois, trans, kw = _setup(seed=2)

    def f(xx, tt):
        return deform_psroi_pool(xx, jnp.asarray(rois), tt, **kw).sum()

    g_x, g_t = jax.grad(f, argnums=(0, 1))(jnp.asarray(x),
                                           jnp.asarray(trans))
    assert np.isfinite(np.asarray(g_x)).all()
    assert np.isfinite(np.asarray(g_t)).all()
    assert float(jnp.abs(g_t).sum()) > 0
