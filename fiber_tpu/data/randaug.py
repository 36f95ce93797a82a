"""RandAugment for training transforms (ref fiber/transforms/randaug.py,
used by albef_transform_randaug with N=2, M=7).

PIL-based host-side implementation of the standard op set minus the
color-destructive ops the reference also excludes for VL training
(Invert/Cutout kept mild).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

MAX_LEVEL = 10


def _enhance(factor_range):
    def apply(img, level, _rng):
        lo, hi = factor_range
        f = lo + (hi - lo) * level / MAX_LEVEL
        return f

    return apply


def _op_identity(img, level, rng):
    return img


def _op_auto_contrast(img, level, rng):
    return ImageOps.autocontrast(img)


def _op_equalize(img, level, rng):
    return ImageOps.equalize(img)


def _op_rotate(img, level, rng):
    deg = 30 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1)
    return img.rotate(deg, fillcolor=(128, 128, 128))


def _op_posterize(img, level, rng):
    bits = 8 - int(4 * level / MAX_LEVEL)
    return ImageOps.posterize(img, max(bits, 4))


def _op_solarize(img, level, rng):
    thr = 256 - int(110 * level / MAX_LEVEL)
    return ImageOps.solarize(img, thr)


def _op_color(img, level, rng):
    return ImageEnhance.Color(img).enhance(
        1 + 0.9 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1))


def _op_contrast(img, level, rng):
    return ImageEnhance.Contrast(img).enhance(
        1 + 0.9 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1))


def _op_brightness(img, level, rng):
    return ImageEnhance.Brightness(img).enhance(
        1 + 0.9 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1))


def _op_sharpness(img, level, rng):
    return ImageEnhance.Sharpness(img).enhance(
        1 + 0.9 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1))


def _op_shear_x(img, level, rng):
    v = 0.3 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1)
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=(128, 128, 128))


def _op_shear_y(img, level, rng):
    v = 0.3 * level / MAX_LEVEL * (1 if rng.random() < 0.5 else -1)
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=(128, 128, 128))


def _op_translate_x(img, level, rng):
    v = 0.3 * level / MAX_LEVEL * img.size[0] * (
        1 if rng.random() < 0.5 else -1)
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0),
                         fillcolor=(128, 128, 128))


def _op_translate_y(img, level, rng):
    v = 0.3 * level / MAX_LEVEL * img.size[1] * (
        1 if rng.random() < 0.5 else -1)
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v),
                         fillcolor=(128, 128, 128))


OPS = [_op_identity, _op_auto_contrast, _op_equalize, _op_rotate,
       _op_posterize, _op_solarize, _op_color, _op_contrast,
       _op_brightness, _op_sharpness, _op_shear_x, _op_shear_y,
       _op_translate_x, _op_translate_y]


def rand_augment(img: Image.Image, n: int = 2, m: int = 7,
                 rng: Optional[np.random.Generator] = None) -> Image.Image:
    rng = rng or np.random.default_rng()
    for _ in range(n):
        op = OPS[rng.integers(len(OPS))]
        img = op(img, m, rng)
    return img
