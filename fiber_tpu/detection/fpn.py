"""FPN + RetinaNet-style P6/P7 extra levels, NHWC flax.

Behavioral spec: modeling/backbone/fpn.py:7-165 (lateral 1x1 + top-down
upsample + 3x3 output convs) and LastLevelP6P7 (two stride-2 convs off the
last backbone level).  FIBER's detection config: SWINT-FPN-RETINANET with
OUT_CHANNELS=256, USE_GN optional (configs use plain convs for FPN).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class FPN(nn.Module):
    out_channels: int = 256
    use_p6p7: bool = True
    p6p7_from_p5: bool = True  # RETINANET variant: P6/P7 off the FPN P5
    use_relu_before_p7: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        """feats: backbone stage outputs low->high stride (NHWC).
        Returns 5 levels [P3..P7] (strides 8..128 for Swin stages 2-4)."""
        C = self.out_channels
        laterals = [
            nn.Conv(C, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            laterals[i] = laterals[i] + upsample_nearest_2x(laterals[i + 1])
        outs = [
            nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"output_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        if self.use_p6p7:
            # torch Conv2d(3, stride 2, padding 1) pads (1, 1); flax
            # "SAME" at stride 2 pads (0, 1) — different window
            # alignment, so spell the torch padding out
            src = outs[-1] if self.p6p7_from_p5 else feats[-1]
            p6 = nn.Conv(C, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="p6")(src)
            p7_in = nn.relu(p6) if self.use_relu_before_p7 else p6
            p7 = nn.Conv(C, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)),
                         dtype=self.dtype, name="p7")(p7_in)
            outs = outs + [p6, p7]
        return outs
