"""Backbone zoo: BiFPN and EfficientNet trunks (NHWC flax).

Behavioral spec: modeling/backbone/bifpn.py (EfficientDet BiFPN with
fast-normalized attention fusion, depthwise-separable convs, swish) and
modeling/backbone/efficientnet.py (MBConv stages with SE; width/depth
scaled per variant).  Redesigned for TPU: NHWC, GroupNorm instead of the
reference's (Sync)BatchNorm so pjit training needs no cross-replica
batch statistics, static nearest-neighbor resizes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _resize_nearest(x: jax.Array, h: int, w: int) -> jax.Array:
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), "nearest")


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + norm (ref bifpn.py ConvBlock)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        x = nn.Conv(C, (3, 3), padding=1, feature_group_count=C,
                    use_bias=False, dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="pointwise")(x)
        return nn.GroupNorm(num_groups=math.gcd(32, self.channels),
                            dtype=self.dtype, name="norm")(x)


class BiFPNLayer(nn.Module):
    """One BiFPN unit over 5 levels with fast-normalized fusion
    (ref bifpn.py:118-260 _forward_fast_attention)."""
    channels: int
    first_time: bool = False
    in_channels: Sequence[int] = (512, 1024, 2048)
    eps: float = 1e-4
    dtype: Dtype = jnp.float32

    def _fuse(self, name: str, feats: List[jax.Array]) -> jax.Array:
        w = self.param(name, nn.initializers.ones,
                       (len(feats),), jnp.float32)
        w = nn.relu(w)
        w = w / (w.sum() + self.eps)
        out = sum(w[i] * f for i, f in enumerate(feats))
        return nn.swish(out)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> List[jax.Array]:
        if self.first_time:
            c3, c4, c5 = inputs[-3:]
            p6 = nn.Conv(self.channels, (3, 3), strides=2, padding=1,
                         dtype=self.dtype, name="p5_to_p6")(c5)
            p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding=((1, 1),
                                                                  (1, 1)))
            p3 = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                         name="p3_down_channel")(c3)
            p4 = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                         name="p4_down_channel")(c4)
            p5 = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                         name="p5_down_channel")(c5)
            levels = [p3, p4, p5, p6, p7]
        else:
            levels = list(inputs)
        p3, p4, p5, p6, p7 = levels

        # top-down pass
        up = lambda hi, ref: _resize_nearest(hi, ref.shape[1],
                                             ref.shape[2])
        p6_td = SeparableConv(self.channels, self.dtype, name="conv6_up")(
            self._fuse("p6_w1", [p6, up(p7, p6)]))
        p5_td = SeparableConv(self.channels, self.dtype, name="conv5_up")(
            self._fuse("p5_w1", [p5, up(p6_td, p5)]))
        p4_td = SeparableConv(self.channels, self.dtype, name="conv4_up")(
            self._fuse("p4_w1", [p4, up(p5_td, p4)]))
        p3_out = SeparableConv(self.channels, self.dtype, name="conv3_up")(
            self._fuse("p3_w1", [p3, up(p4_td, p3)]))

        # bottom-up pass
        down = lambda lo, ref: nn.max_pool(
            lo, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        p4_out = SeparableConv(self.channels, self.dtype,
                               name="conv4_down")(
            self._fuse("p4_w2", [p4, p4_td, down(p3_out, p4)]))
        p5_out = SeparableConv(self.channels, self.dtype,
                               name="conv5_down")(
            self._fuse("p5_w2", [p5, p5_td, down(p4_out, p5)]))
        p6_out = SeparableConv(self.channels, self.dtype,
                               name="conv6_down")(
            self._fuse("p6_w2", [p6, p6_td, down(p5_out, p6)]))
        p7_out = SeparableConv(self.channels, self.dtype,
                               name="conv7_down")(
            self._fuse("p7_w2", [p7, down(p6_out, p7)]))
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """Stacked BiFPN (ref bifpn.py BiFPN; EfficientDet repeats 3-8x)."""
    channels: int = 256
    repeats: int = 3
    in_channels: Sequence[int] = (512, 1024, 2048)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        x = list(feats)
        for r in range(self.repeats):
            x = BiFPNLayer(channels=self.channels, first_time=(r == 0),
                           in_channels=self.in_channels, dtype=self.dtype,
                           name=f"layer{r}")(x)
        return x


# ---------------------------------------------------------------------
# EfficientNet
# ---------------------------------------------------------------------
class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE (ref efficientnet.py
    EffiInvResUnit)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    expansion: int = 6
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        mid = C * self.expansion
        residual = x
        y = x
        if self.expansion != 1:
            y = nn.swish(nn.GroupNorm(num_groups=math.gcd(32, mid),
                                      dtype=self.dtype, name="gn_expand")(
                nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)))
        k = self.kernel_size
        y = nn.Conv(mid, (k, k), strides=self.stride, padding=k // 2,
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="depthwise")(y)
        y = nn.swish(nn.GroupNorm(num_groups=math.gcd(32, mid),
                                  dtype=self.dtype, name="gn_dw")(y))
        # squeeze-excite on the expanded features
        se_ch = max(1, int(C * self.se_ratio))
        s = y.mean(axis=(1, 2))
        s = nn.swish(nn.Dense(se_ch, dtype=self.dtype, name="se_reduce")(s))
        s = jax.nn.sigmoid(nn.Dense(mid, dtype=self.dtype,
                                    name="se_expand")(s))
        y = y * s[:, None, None, :]
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project")(y)
        y = nn.GroupNorm(num_groups=math.gcd(32, self.out_channels),
                         dtype=self.dtype, name="gn_project")(y)
        if self.stride == 1 and C == self.out_channels:
            y = y + residual
        return y


# (width_mult, depth_mult) per variant (ref efficientnet.py get_efficientnet)
EFFICIENTNET_PARAMS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
    "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
    "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}
_BASE_STAGES = (
    # (out_channels, kernel, stride, expansion, repeats)
    (16, 3, 1, 1, 1), (24, 3, 2, 6, 2), (40, 5, 2, 6, 2),
    (80, 3, 2, 6, 3), (112, 5, 1, 6, 3), (192, 5, 2, 6, 4),
    (320, 3, 1, 6, 1),
)


def _scale_width(c: int, mult: float, divisor: int = 8) -> int:
    c = c * mult
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


class EfficientNetBackbone(nn.Module):
    """EfficientNet trunk emitting the stride 8/16/32 stages
    (ref efficientnet.py EfficientNet with out_features)."""
    variant: str = "b0"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> List[jax.Array]:
        wm, dm = EFFICIENTNET_PARAMS[self.variant]
        x = nn.Conv(_scale_width(32, wm), (3, 3), strides=2, padding=1,
                    use_bias=False, dtype=self.dtype, name="stem")(img)
        x = nn.swish(nn.GroupNorm(num_groups=math.gcd(32, x.shape[-1]),
                                  dtype=self.dtype, name="gn_stem")(x))
        outs = []
        for si, (c, k, s, e, r) in enumerate(_BASE_STAGES):
            c = _scale_width(c, wm)
            reps = int(math.ceil(r * dm))
            for b in range(reps):
                x = MBConv(out_channels=c, kernel_size=k,
                           stride=s if b == 0 else 1, expansion=e,
                           dtype=self.dtype, name=f"s{si}_b{b}")(x)
            if si in (2, 4, 6):  # ends of the stride-8/16/32 stages
                outs.append(x)
        return outs
