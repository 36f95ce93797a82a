"""String-keyed detection backbone registry.

Mirrors the reference's ``registry.BACKBONES`` name set
(modeling/backbone/__init__.py:22-247): each CONV_BODY name builds a
trunk + neck module.  Two calling conventions exist:

* vision-only backbones — ``module(images) -> [P3..P7]`` (language
  features come from a separate language backbone, as in the
  reference's non-fusion GeneralizedVLRCNN path);
* language-aware backbones (swint_vl / swint_v2_vl / the FIBER fusion
  backbone) — ``module(images, ...) -> (feats, lang_dict)``.

``build_backbone`` returns ``(module, language_aware: bool)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.detection.fpn import FPN
from fiber_tpu.models.alt_backbones import ResNetBackbone
from fiber_tpu.models.backbone_zoo import BiFPN, EfficientNetBackbone
from fiber_tpu.models.fbnet import FBNetTrunk
from fiber_tpu.models.swin_v2 import SwinV2Backbone
from fiber_tpu.models.swin_vl import SwinVLBackbone

Dtype = Any


class VisionFPN(nn.Module):
    """Trunk (multi-scale taps) + FPN neck -> 5 levels P3..P7."""
    trunk: nn.Module
    out_channels: int = 256
    take_last: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, *,
                 deterministic: bool = True) -> List[jax.Array]:
        taps = self.trunk(images)
        if isinstance(taps, tuple):  # (outs, lang) from a VL-capable trunk
            taps = taps[0]
        return FPN(out_channels=self.out_channels, dtype=self.dtype,
                   name="fpn")(taps[-self.take_last:])


class VisionBiFPN(nn.Module):
    """EfficientNet/ResNet trunk + stacked BiFPN (ref EFFICIENTNET-BIFPN,
    backbone/__init__.py:426-451)."""
    trunk: nn.Module
    in_channels: Sequence[int]
    out_channels: int = 256
    repeats: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, *,
                 deterministic: bool = True) -> List[jax.Array]:
        taps = self.trunk(images)
        return BiFPN(channels=self.out_channels, repeats=self.repeats,
                     in_channels=tuple(self.in_channels), dtype=self.dtype,
                     name="bifpn")(taps[-3:])


class SwinVLFPN(nn.Module):
    """Language-aware Swin trunk + FPN (ref SWINT-FPN-RETINANET with
    SWINT.VERSION vl / v2_vl, backbone/__init__.py:158-247)."""
    image_size: Tuple[int, int]
    version: str = "v1"          # v1 (swint_vl) | v2 (swint_v2_vl)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    max_query_len: int = 256
    lang_dim: int = 768
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, lang_hidden: jax.Array,
                 lang_masks: Optional[jax.Array] = None, *,
                 deterministic: bool = True):
        outs, lang = SwinVLBackbone(
            image_size=self.image_size, embed_dim=self.embed_dim,
            depths=tuple(self.depths), num_heads=tuple(self.num_heads),
            window_size=self.window_size, max_query_len=self.max_query_len,
            lang_dim=self.lang_dim, version=self.version,
            out_indices=(1, 2, 3), dtype=self.dtype, name="body")(
                images, lang_hidden, lang_masks,
                deterministic=deterministic)
        feats = FPN(out_channels=self.out_channels, dtype=self.dtype,
                    name="fpn")(outs)
        return feats, lang


def _resnet(layers):
    def f(image_size, out_channels, dtype):
        return VisionFPN(trunk=ResNetBackbone(layers=layers, dtype=dtype),
                         out_channels=out_channels, dtype=dtype), False
    return f


def _swint(version, vl):
    def f(image_size, out_channels, dtype):
        if vl:
            return SwinVLFPN(image_size=image_size, version=version,
                             out_channels=out_channels, dtype=dtype), True
        trunk = SwinVLBackbone(image_size=image_size, version=version,
                               vl=False, out_indices=(1, 2, 3), dtype=dtype)
        return VisionFPN(trunk=trunk, out_channels=out_channels,
                         dtype=dtype), False
    return f


def _swint_v2_standalone(image_size, out_channels, dtype):
    trunk = SwinV2Backbone(image_size=image_size, out_indices=(1, 2, 3),
                           dtype=dtype)
    return VisionFPN(trunk=trunk, out_channels=out_channels,
                     dtype=dtype), False


def _effnet_bifpn(variant):
    def f(image_size, out_channels, dtype):
        trunk = EfficientNetBackbone(variant=variant, dtype=dtype)
        # stride 8/16/32 channels for b0: 40/112/320 (scaled per variant)
        from fiber_tpu.models.backbone_zoo import (_BASE_STAGES,
                                                   _scale_width,
                                                   EFFICIENTNET_PARAMS)
        wm = EFFICIENTNET_PARAMS[variant][0]
        chans = [_scale_width(_BASE_STAGES[i][0], wm) for i in (2, 4, 6)]
        return VisionBiFPN(trunk=trunk, in_channels=chans,
                           out_channels=out_channels, dtype=dtype), False
    return f


def _fbnet(arch):
    def f(image_size, out_channels, dtype):
        return VisionFPN(trunk=FBNetTrunk(arch=arch, dtype=dtype),
                         out_channels=out_channels, dtype=dtype), False
    return f


def _fusion(image_size, out_channels, dtype):
    from fiber_tpu.detection.fusion_backbone import FusionSwinFPN
    return FusionSwinFPN(image_size=image_size, out_channels=out_channels,
                         dtype=dtype), True


# reference CONV_BODY names -> builder (backbone/__init__.py registry)
BACKBONES: Dict[str, Callable] = {
    "R-50-FPN": _resnet((3, 4, 6, 3)),
    "R-101-FPN": _resnet((3, 4, 23, 3)),
    "R-50-FPN-RETINANET": _resnet((3, 4, 6, 3)),
    "R-101-FPN-RETINANET": _resnet((3, 4, 23, 3)),
    "SWINT-FPN": _swint("v1", vl=False),
    "SWINT-FPN-RETINANET": _swint("v1", vl=False),
    "SWINT-VL-FPN-RETINANET": _swint("v1", vl=True),
    "SWINT-V2-FPN-RETINANET": _swint_v2_standalone,
    "SWINT-V2-VL-FPN-RETINANET": _swint("v2", vl=True),
    "EFFICIENTNET-BIFPN": _effnet_bifpn("b0"),
    "EFFICIENTNET-B7-BIFPN": _effnet_bifpn("b7"),
    "FBNET-FPN-RETINANET": _fbnet("default"),
    "FBNET-C-FPN-RETINANET": _fbnet("fbnet_c"),
    # the FIBER detection default (fusion-in-the-backbone)
    "FUSION-SWINT-FPN-RETINANET": _fusion,
}


def build_backbone(name: str, image_size: Tuple[int, int],
                   out_channels: int = 256,
                   dtype: Dtype = jnp.float32) -> Tuple[nn.Module, bool]:
    """Build a registered backbone.  Returns (module, language_aware)."""
    if name not in BACKBONES:
        raise KeyError(
            f"unknown backbone {name!r}; known: {sorted(BACKBONES)}")
    return BACKBONES[name](image_size, out_channels, dtype)
