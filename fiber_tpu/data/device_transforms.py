"""On-device image preprocessing: the geometric pipeline as XLA ops.

The reference runs PIL transforms on CPU dataloader workers
(ref fiber/transforms/transform.py:10-45: eval = Resize((S,S), bicubic);
train = RandomResizedCrop(0.5-1.0) + HFlip + RandAugment(2, 7)).  On a
TPU host — this one has a single visible core — PIL bicubic at 384^2
cannot keep the chip fed, so here the host only *decodes* to uint8 and
pads into a fixed staging buffer, and everything geometric runs inside
the jit program, vectorized over the batch:

  host:   decode -> uint8 (h, w, 3), pad into (S0, S0, 3) staging
          (nearest-downscale only if the native image exceeds S0)
  device: per-image bicubic resize / random-resized-crop via
          jax.image.scale_and_translate (traced scale+translation, so
          one compiled program serves every native size), horizontal
          flip, the geometric RandAugment subset (Shear/Translate/
          Rotate as affine bilinear warps), then normalize.

uint8 staging also cuts PCIe traffic 4x vs transferring fp32.

Numerics: jax "cubic" is the Keys kernel with a=-0.5 — the same family
as PIL BICUBIC — and scale_and_translate antialiases on downscale like
PIL's resampler, but tap windows differ slightly, so device-vs-PIL
pixels agree to ~1-2/255 (tested with tolerance in
tests/test_device_transforms.py, documented there), not bitwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# host side: decode + stage
# ---------------------------------------------------------------------------
def stage_host(pil_img, staging_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """PIL image -> (uint8 (S0, S0, 3) padded staging buffer, (h, w)).

    No filtering work on the host beyond a nearest-neighbor shrink when
    the native image exceeds the staging buffer (cheap: pure indexing).
    """
    img = pil_img.convert("RGB") if hasattr(pil_img, "convert") else pil_img
    arr = np.asarray(img, np.uint8)
    h, w = arr.shape[:2]
    if max(h, w) > staging_size:
        s = staging_size / max(h, w)
        nh, nw = max(1, int(h * s)), max(1, int(w * s))
        yi = np.linspace(0, h - 1, nh).round().astype(np.int64)
        xi = np.linspace(0, w - 1, nw).round().astype(np.int64)
        arr = arr[yi][:, xi]
        h, w = nh, nw
    out = np.zeros((staging_size, staging_size, 3), np.uint8)
    out[:h, :w] = arr
    # edge-replicate into the padding: resampling taps near the native
    # image edge (cubic + antialias support) read past (h, w); black
    # padding would bleed a dark fringe into edge pixels, replication
    # reproduces PIL's edge-clamp behavior
    out[h:, :w] = arr[h - 1][None, :]
    out[:, w:] = out[:, w - 1][:, None]
    return out, np.array([h, w], np.int32)


def stage_host_batch(pil_imgs, staging_size: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    staged, sizes = zip(*(stage_host(p, staging_size) for p in pil_imgs))
    return np.stack(staged), np.stack(sizes)


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------
def _resize_one(img: jax.Array, hw: jax.Array, crop: jax.Array,
                out_size: int) -> jax.Array:
    """Bicubic-resample the (traced) crop box [y0, x0, ch, cw] of one
    staged image to (out_size, out_size).  scale/translation are traced,
    so any native size / crop runs through one compiled program."""
    y0, x0, ch, cw = crop[0], crop[1], crop[2], crop[3]
    scale = jnp.stack([out_size / ch, out_size / cw])
    translation = jnp.stack([-y0 * out_size / ch, -x0 * out_size / cw])
    return jax.image.scale_and_translate(
        img.astype(jnp.float32), (out_size, out_size, 3), (0, 1),
        scale, translation, method="cubic", antialias=True)


def _affine_warp(img: jax.Array, mat: jax.Array, out_hw: int,
                 fill: float = 0.0) -> jax.Array:
    """Inverse-affine bilinear warp of (S, S, C): output(y, x) =
    img(a y + b x + c, d y + e x + f), mat = [[a,b,c],[d,e,f]]."""
    S = out_hw
    ys, xs = jnp.mgrid[0:S, 0:S].astype(jnp.float32)
    sy = mat[0, 0] * ys + mat[0, 1] * xs + mat[0, 2]
    sx = mat[1, 0] * ys + mat[1, 1] * xs + mat[1, 2]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    H = img.shape[0]
    W = img.shape[1]

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        v = img[yy, xx]
        return jnp.where(ok[..., None], v, fill)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def _randaug_geometric(img: jax.Array, op_idx: jax.Array,
                       magnitude: jax.Array, out_size: int) -> jax.Array:
    """One geometric RandAugment op (ref randaug.py ShearX/ShearY/
    TranslateX/TranslateY/Rotate at level-scaled magnitudes; Identity
    included).  img: (S, S, 3) float.  op_idx in [0, 5]."""
    S = out_size
    c = (S - 1) / 2.0

    def identity(_):
        return img

    def shear_x(m):
        # PIL AFFINE (1, shear, 0, 0, 1, 0): src_x = x + m * y
        mat = jnp.array([[1.0, 0.0, 0.0], [m, 1.0, 0.0]])
        return _affine_warp(img, mat, S)

    def shear_y(m):
        mat = jnp.array([[1.0, m, 0.0], [0.0, 1.0, 0.0]])
        return _affine_warp(img, mat, S)

    def translate_x(m):
        mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, m * S]])
        return _affine_warp(img, mat, S)

    def translate_y(m):
        mat = jnp.array([[1.0, 0.0, m * S], [0.0, 1.0, 0.0]])
        return _affine_warp(img, mat, S)

    def rotate(m):
        th = m * jnp.pi / 180.0
        cs, sn = jnp.cos(th), jnp.sin(th)
        # rotate about the center: src = R^T (dst - c) + c
        mat = jnp.array([[cs, sn, c - cs * c - sn * c],
                         [-sn, cs, c + sn * c - cs * c]])
        return _affine_warp(img, mat, S)

    return jax.lax.switch(op_idx, [identity, shear_x, shear_y,
                                   translate_x, translate_y, rotate],
                          magnitude)


@functools.partial(jax.jit, static_argnames=("out_size", "dtype_name"))
def device_eval_preprocess(staged: jax.Array, sizes: jax.Array,
                           out_size: int,
                           mean=IMAGENET_DEFAULT_MEAN,
                           std=IMAGENET_DEFAULT_STD,
                           dtype_name: str = "bfloat16") -> jax.Array:
    """(B, S0, S0, 3) uint8 staging + (B, 2) native sizes ->
    (B, out, out, 3) normalized: the albef eval transform
    (Resize((S,S), bicubic) + normalize) as one XLA program."""
    crops = jnp.concatenate(
        [jnp.zeros_like(sizes), sizes], axis=1).astype(jnp.float32)
    imgs = jax.vmap(lambda im, cr: _resize_one(im, None, cr, out_size)
                    )(staged, crops)
    imgs = imgs / 255.0
    imgs = (imgs - jnp.asarray(mean)) / jnp.asarray(std)
    return imgs.astype(jnp.dtype(dtype_name))


@functools.partial(jax.jit,
                   static_argnames=("out_size", "dtype_name", "n_randaug"))
def device_train_preprocess(staged: jax.Array, sizes: jax.Array,
                            rng: jax.Array, out_size: int,
                            mean=IMAGENET_DEFAULT_MEAN,
                            std=IMAGENET_DEFAULT_STD,
                            dtype_name: str = "bfloat16",
                            n_randaug: int = 2,
                            randaug_level: int = 7) -> jax.Array:
    """RandomResizedCrop(scale 0.5-1.0, ratio 3/4-4/3) + HFlip + the
    geometric RandAugment subset + normalize, vectorized on device.

    Crop sampling: one draw of (area, log-ratio), clamped to fit the
    native image — same distribution family as torchvision's rejection
    loop (which falls back to center crop after 10 failures); clamping
    replaces rejection so the program is branch-free.
    """
    B = staged.shape[0]
    kc, ka, kxy, kf, kops, kmag, ksgn = jax.random.split(rng, 7)
    hw = sizes.astype(jnp.float32)
    area = hw[:, 0] * hw[:, 1]
    target = jax.random.uniform(kc, (B,), minval=0.5, maxval=1.0) * area
    log_r = jax.random.uniform(ka, (B,), minval=jnp.log(3 / 4),
                               maxval=jnp.log(4 / 3))
    ar = jnp.exp(log_r)
    cw = jnp.sqrt(target * ar)
    ch = jnp.sqrt(target / ar)
    cw = jnp.minimum(cw, hw[:, 1])
    ch = jnp.minimum(ch, hw[:, 0])
    u = jax.random.uniform(kxy, (B, 2))
    y0 = u[:, 0] * (hw[:, 0] - ch)
    x0 = u[:, 1] * (hw[:, 1] - cw)
    crops = jnp.stack([y0, x0, ch, cw], axis=1)

    imgs = jax.vmap(lambda im, cr: _resize_one(im, None, cr, out_size)
                    )(staged, crops)

    flip = jax.random.bernoulli(kf, 0.5, (B,))
    imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)

    # geometric RandAugment: n ops drawn per image from
    # {Identity, ShearX, ShearY, TranslateX, TranslateY, Rotate} at
    # level-scaled magnitude with random sign (ref randaug.py arg ranges:
    # shear 0.3, translate 0.45, rotate 30 at level 10)
    lvl = randaug_level / 10.0
    for i in range(n_randaug):
        ops = jax.random.randint(jax.random.fold_in(kops, i), (B,), 0, 6)
        sgn = jnp.where(
            jax.random.bernoulli(jax.random.fold_in(ksgn, i), 0.5, (B,)),
            1.0, -1.0)
        mag01 = jax.random.uniform(jax.random.fold_in(kmag, i), (B,))
        mags = jnp.stack([
            jnp.zeros((B,)),
            0.3 * lvl * mag01 * sgn,      # shear x
            0.3 * lvl * mag01 * sgn,      # shear y
            0.45 * lvl * mag01 * sgn,     # translate x (fraction of S)
            0.45 * lvl * mag01 * sgn,     # translate y
            30.0 * lvl * mag01 * sgn,     # rotate degrees
        ], axis=1)
        mag = jnp.take_along_axis(mags, ops[:, None], axis=1)[:, 0]
        imgs = jax.vmap(
            lambda im, o, m: _randaug_geometric(im, o, m, out_size)
        )(imgs, ops, mag)

    imgs = imgs / 255.0
    imgs = (imgs - jnp.asarray(mean)) / jnp.asarray(std)
    return imgs.astype(jnp.dtype(dtype_name))
