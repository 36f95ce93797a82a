"""FBNet mobile backbone (inverted-residual search space), in flax.

Behavioral spec: fine_grained/maskrcnn_benchmark/modeling/backbone/
fbnet.py — IRFBlock (pw-expand -> optional mid channel-shuffle ->
depthwise (or cascaded dw, ``cdw``) -> pw-linear -> residual -> SE,
fbnet.py:265-378), the block-op table (fbnet.py:381-434) and the
arch-def driven trunk builder.  Redesigned for TPU: NHWC layout,
GroupNorm instead of BatchNorm (no cross-replica batch stats under
pjit), static shapes.

Arch defs are (block_op, out_channels, stride, n_repeat) stage tables;
a stage's first block takes the stride, the rest are stride 1 (the
standard FBNet/MobileNet expansion rule).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _norm(C: int, dtype, name: str):
    return nn.GroupNorm(num_groups=math.gcd(32, C), dtype=dtype, name=name)


def _get_divisible_by(num: float, divisor: int) -> int:
    """fbnet.py:27-31 (py2 rounding)."""
    ret = int(num)
    if divisor > 0 and ret % divisor != 0:
        ret = int((math.floor(num / divisor + 0.5) or divisor) * divisor)
    return ret


class ConvNormRelu(nn.Module):
    """Conv -> norm -> ReLU (fbnet.py ConvBNRelu)."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.kernel // 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        if self.use_norm:
            x = _norm(self.out_ch, self.dtype, "norm")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-excite with /4 reduction (fbnet.py SEModule)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = max(self.channels // 4, 8)
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(mid, dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                    name="fc2")(s))
        return x * s[:, None, None, :]


def _channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """fbnet.py ChannelShuffle (NHWC): interleave group channels."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, groups, C // groups)
    return x.transpose(0, 1, 2, 4, 3).reshape(B, H, W, C)


class IRFBlock(nn.Module):
    """Inverted residual: pw -> (shuffle) -> dw -> pw-linear -> +res -> SE
    (fbnet.py:265-378).  Negative strides (upsample) are not supported —
    no FBNet arch def in the reference uses them."""
    in_ch: int
    out_ch: int
    expansion: float
    stride: int
    kernel: int = 3
    se: bool = False
    cdw: bool = False
    shuffle_mid: bool = False
    pw_group: int = 1
    width_divisor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = _get_divisible_by(self.in_ch * self.expansion,
                                self.width_divisor)
        res = x
        y = ConvNormRelu(mid, kernel=1, groups=self.pw_group,
                         dtype=self.dtype, name="pw")(x)
        if self.shuffle_mid:
            y = _channel_shuffle(y, self.pw_group)
        if self.kernel > 1:
            y = ConvNormRelu(mid, kernel=self.kernel, stride=self.stride,
                             groups=mid, dtype=self.dtype, name="dw")(y)
            if self.cdw:  # cascaded second depthwise, stride 1
                y = ConvNormRelu(mid, kernel=self.kernel, stride=1,
                                 groups=mid, dtype=self.dtype,
                                 name="dw2")(y)
        y = ConvNormRelu(self.out_ch, kernel=1, groups=self.pw_group,
                         relu=False, dtype=self.dtype, name="pwl")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + res
        if self.se:
            y = SEModule(self.out_ch, dtype=self.dtype, name="se")(y)
        return y


class Skip(nn.Module):
    """fbnet.py Identity: pass-through, or 1x1 conv on shape change."""
    in_ch: int
    out_ch: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.in_ch == self.out_ch and self.stride == 1:
            return x
        return ConvNormRelu(self.out_ch, kernel=1, stride=self.stride,
                            dtype=self.dtype, name="conv")(x)


# block-op table (fbnet.py:381-434); (expansion, kernel, se, cdw,
# shuffle_mid, pw_group); "skip" handled specially
_PRIMITIVES = {
    "ir_k3_e1": (1, 3, False, False, False, 1),
    "ir_k3_e3": (3, 3, False, False, False, 1),
    "ir_k3_e6": (6, 3, False, False, False, 1),
    "ir_k3_s2": (1, 3, False, False, True, 2),
    "ir_k3_s4": (4, 3, False, False, True, 4),
    "ir_k5_e1": (1, 5, False, False, False, 1),
    "ir_k5_e3": (3, 5, False, False, False, 1),
    "ir_k5_e6": (6, 5, False, False, False, 1),
    "ir_k5_s2": (1, 5, False, False, True, 2),
    "ir_k5_s4": (4, 5, False, False, True, 4),
    "ir_k7_e1": (1, 7, False, False, False, 1),
    "ir_k7_e3": (3, 7, False, False, False, 1),
    "ir_k7_e6": (6, 7, False, False, False, 1),
    "ir_k33_e1": (1, 3, False, True, False, 1),
    "ir_k33_e3": (3, 3, False, True, False, 1),
    "ir_k33_e6": (6, 3, False, True, False, 1),
    "ir_k7_sep_e1": (1, 7, False, True, False, 1),
    "ir_k7_sep_e3": (3, 7, False, True, False, 1),
    "ir_k7_sep_e6": (6, 7, False, True, False, 1),
}
# se variants
_PRIMITIVES.update({
    f"{k}_se": (e, ker, True, cdw, sh, g)
    for k, (e, ker, se, cdw, sh, g) in list(_PRIMITIVES.items())
})

# arch defs: stage tables of (op, out_channels, stride, n_repeat).
# Stage boundaries align with strides so stride-8/16/32 taps exist for
# the FPN.  "default" mirrors the MobileNetV2-like fbnet default trunk;
# "fbnet_c" the FBNet-C search result layout.
ARCH_DEFS = {
    "default": [
        [("ir_k3_e1", 16, 1, 1)],
        [("ir_k3_e6", 24, 2, 2)],
        [("ir_k3_e6", 32, 2, 3)],
        [("ir_k3_e6", 64, 2, 4), ("ir_k3_e6", 96, 1, 3)],
        [("ir_k3_e6", 160, 2, 3), ("ir_k3_e6", 320, 1, 1)],
    ],
    "fbnet_c": [
        [("ir_k3_e1", 16, 1, 1)],
        [("ir_k3_e6", 24, 2, 1), ("ir_k3_e1", 24, 1, 3)],
        [("ir_k5_e6", 32, 2, 1), ("ir_k5_e3", 32, 1, 1),
         ("ir_k5_e6", 32, 1, 1), ("ir_k3_e6", 32, 1, 1)],
        [("ir_k5_e6", 64, 2, 1), ("ir_k5_e3", 64, 1, 1),
         ("ir_k5_e6", 64, 1, 2), ("ir_k5_e6", 112, 1, 1),
         ("ir_k5_e3", 112, 1, 1), ("ir_k5_e6", 112, 1, 2)],
        [("ir_k5_e6", 184, 2, 1), ("ir_k5_e6", 184, 1, 3),
         ("ir_k3_e6", 352, 1, 1)],
    ],
}


class FBNetTrunk(nn.Module):
    """Stem + arch-def stages; returns stride-8/16/32 taps (the last
    three stages) for FPN consumption, NHWC."""
    arch: str = "default"
    stem_channels: int = 16
    width_divisor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        assert self.arch in ARCH_DEFS, f"unknown FBNet arch {self.arch!r}"
        x = ConvNormRelu(self.stem_channels, kernel=3, stride=2,
                         dtype=self.dtype, name="stem")(x)
        in_ch = self.stem_channels
        outs = []
        for si, stage in enumerate(ARCH_DEFS[self.arch]):
            bi = 0
            for (op, C, stride, n) in stage:
                for r in range(n):
                    s = stride if r == 0 else 1
                    if op == "skip":
                        x = Skip(in_ch, C, s, dtype=self.dtype,
                                 name=f"stage{si}_block{bi}")(x)
                    else:
                        e, ker, se, cdw, sh, g = _PRIMITIVES[op]
                        x = IRFBlock(in_ch, C, e, s, kernel=ker, se=se,
                                     cdw=cdw, shuffle_mid=sh, pw_group=g,
                                     width_divisor=self.width_divisor,
                                     dtype=self.dtype,
                                     name=f"stage{si}_block{bi}")(x)
                    in_ch = C
                    bi += 1
            outs.append(x)
        return outs[-3:]
