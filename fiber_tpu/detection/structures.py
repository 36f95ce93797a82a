"""Dense segmentation-mask and keypoint structures, static-shape.

Behavioral spec: structures/segmentation_mask.py (SegmentationMask with
polygon + binary-mask modes, crop/resize/transpose ops) and
structures/keypoint.py (PersonKeypoints with flip maps and heatmap
targets).  TPU redesign: masks are padded (N, H, W) bool arrays with a
validity mask (polygons rasterize on host at data-load time), keypoints
are padded (N, K, 3) arrays; every transform is a batched array op.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------
# host-side polygon rasterization (data pipeline; ref Polygons.convert)
# ---------------------------------------------------------------------
def rasterize_polygons(polygons: Sequence[np.ndarray], height: int,
                       width: int) -> np.ndarray:
    """COCO polygon list -> (H, W) bool mask, even-odd fill per polygon
    union (host numpy; runs in the data loader like the reference's
    pycocotools frPyObjects path)."""
    mask = np.zeros((height, width), bool)
    ys, xs = np.mgrid[0:height, 0:width]
    pts_y = ys + 0.5
    pts_x = xs + 0.5
    for poly in polygons:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        n = len(p)
        inside = np.zeros((height, width), bool)
        j = n - 1
        for i in range(n):
            xi, yi = p[i]
            xj, yj = p[j]
            cond = ((yi > pts_y) != (yj > pts_y)) & (
                pts_x < (xj - xi) * (pts_y - yi) / (yj - yi + 1e-12) + xi)
            inside ^= cond
            j = i
        mask |= inside
    return mask


class SegmentationMasks:
    """Padded (N, H, W) bool masks + (N,) validity.

    Ops mirror structures/segmentation_mask.py: crop, resize, flip — all
    expressed as batched array transforms usable inside jit."""

    def __init__(self, masks: jax.Array, valid: jax.Array):
        self.masks = masks
        self.valid = valid

    @classmethod
    def from_polygons(cls, polys_per_instance, height: int, width: int,
                      pad_to: int) -> "SegmentationMasks":
        n = len(polys_per_instance)
        arr = np.zeros((pad_to, height, width), bool)
        for i, polys in enumerate(polys_per_instance[:pad_to]):
            arr[i] = rasterize_polygons(polys, height, width)
        valid = np.zeros((pad_to,), bool)
        valid[:min(n, pad_to)] = True
        return cls(jnp.asarray(arr), jnp.asarray(valid))

    def resize(self, height: int, width: int) -> "SegmentationMasks":
        out = jax.image.resize(
            self.masks.astype(jnp.float32),
            (self.masks.shape[0], height, width), method="bilinear")
        return SegmentationMasks(out > 0.5, self.valid)

    def hflip(self) -> "SegmentationMasks":
        return SegmentationMasks(self.masks[:, :, ::-1], self.valid)

    def crop_and_resize(self, boxes: jax.Array, size: int) -> jax.Array:
        """Project each instance's mask into its box -> (N, size, size)
        float targets for the mask head (Mask R-CNN target projection)."""
        from fiber_tpu.detection.roi_align import roi_align

        def one(mask, box):
            m = roi_align(mask[:, :, None].astype(jnp.float32),
                          box[None], size, spatial_scale=1.0)
            return m[0, :, :, 0]

        return jax.vmap(one)(self.masks, boxes)

    def areas(self) -> jax.Array:
        return self.masks.sum(axis=(1, 2)) * self.valid


# ---------------------------------------------------------------------
# Keypoints (ref structures/keypoint.py)
# ---------------------------------------------------------------------
COCO_PERSON_KEYPOINT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
    "right_knee", "left_ankle", "right_ankle")

_FLIP_MAP = {name: name.replace("left_", "right_")
             for name in COCO_PERSON_KEYPOINT_NAMES
             if name.startswith("left_")}


def _flip_indices() -> np.ndarray:
    idx = np.arange(len(COCO_PERSON_KEYPOINT_NAMES))
    names = list(COCO_PERSON_KEYPOINT_NAMES)
    for left, right in _FLIP_MAP.items():
        li, ri = names.index(left), names.index(right)
        idx[li], idx[ri] = ri, li
    return idx


class Keypoints:
    """Padded (N, K, 3) keypoints (x, y, visibility) + (N,) validity."""

    def __init__(self, kps: jax.Array, valid: jax.Array):
        self.kps = kps
        self.valid = valid

    def resize(self, scale_y: float, scale_x: float) -> "Keypoints":
        scaled = self.kps * jnp.asarray([scale_x, scale_y, 1.0])
        return Keypoints(scaled, self.valid)

    def hflip(self, width: int) -> "Keypoints":
        """Mirror x and swap left/right joints (ref
        keypoint.py FLIP_MAP)."""
        idx = jnp.asarray(_flip_indices())
        kps = self.kps[:, idx]
        x = width - kps[..., 0] - 1
        kps = jnp.stack([x, kps[..., 1], kps[..., 2]], axis=-1)
        return Keypoints(kps, self.valid)

    def to_heatmap_targets(self, boxes: jax.Array, heatmap_size: int
                           ) -> Tuple[jax.Array, jax.Array]:
        """Per-instance joint bin indices within the box grid + a
        visibility/in-box mask (ref keypoint.py keypoints_to_heat_map)."""
        x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
        w = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
        h = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
        x = (self.kps[..., 0] - x1) / w * heatmap_size
        y = (self.kps[..., 1] - y1) / h * heatmap_size
        xi = jnp.clip(jnp.floor(x), 0, heatmap_size - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y), 0, heatmap_size - 1).astype(jnp.int32)
        inside = ((x >= 0) & (x < heatmap_size)
                  & (y >= 0) & (y < heatmap_size))
        vis = (self.kps[..., 2] > 0) & inside & self.valid[:, None]
        return yi * heatmap_size + xi, vis


# ---------------------------------------------------------------------
# mask pasting (eval-time, host numpy; ref mask_head/inference.py Masker)
# ---------------------------------------------------------------------
def _bilinear_resize(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    """F.interpolate(mode="bilinear", align_corners=False) on one (H, W)
    float array."""
    H, W = mask.shape
    ys = (np.arange(h, dtype=np.float64) + 0.5) * H / h - 0.5
    xs = (np.arange(w, dtype=np.float64) + 0.5) * W / w - 0.5
    y0 = np.floor(ys)
    x0 = np.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    y0 = np.clip(y0, 0, H - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(x0, 0, W - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, W - 1)
    # clamp the interpolation weights where the source coord fell
    # outside [0, H-1] (align_corners=False edge behavior)
    wy = np.clip(ys, 0, H - 1)[:, None] - y0[:, None]
    wx = np.clip(xs, 0, W - 1)[None, :] - x0[None, :]
    v00 = mask[y0][:, x0]
    v01 = mask[y0][:, x1]
    v10 = mask[y1][:, x0]
    v11 = mask[y1][:, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def paste_mask_in_image(mask: np.ndarray, box: np.ndarray, im_h: int,
                        im_w: int, thresh: float = 0.5,
                        padding: int = 1) -> np.ndarray:
    """One (M, M) mask prob -> (im_h, im_w) bool, the reference Masker
    semantics exactly (mask_head/inference.py:134-168): pad by
    `padding`, expand the box by (M+2p)/M about its center, round to
    int32, bilinear-resize to the +1-inclusive box size, threshold,
    paste clipped."""
    M = mask.shape[-1]
    pad2 = 2 * padding
    scale = float(M + pad2) / M
    padded = np.zeros((M + pad2, M + pad2), np.float64)
    padded[padding:-padding, padding:-padding] = mask

    w_half = (box[2] - box[0]) * 0.5 * scale
    h_half = (box[3] - box[1]) * 0.5 * scale
    x_c = (box[2] + box[0]) * 0.5
    y_c = (box[3] + box[1]) * 0.5
    ebox = np.array([x_c - w_half, y_c - h_half, x_c + w_half,
                     y_c + h_half]).astype(np.int32)

    w = max(int(ebox[2] - ebox[0] + 1), 1)
    h = max(int(ebox[3] - ebox[1] + 1), 1)
    resized = _bilinear_resize(padded, h, w)
    binm = resized > thresh if thresh >= 0 else resized > 0

    im_mask = np.zeros((im_h, im_w), bool)
    x_0 = max(int(ebox[0]), 0)
    x_1 = min(int(ebox[2]) + 1, im_w)
    y_0 = max(int(ebox[1]), 0)
    y_1 = min(int(ebox[3]) + 1, im_h)
    if x_1 > x_0 and y_1 > y_0:
        im_mask[y_0:y_1, x_0:x_1] = binm[
            y_0 - ebox[1]:y_1 - ebox[1], x_0 - ebox[0]:x_1 - ebox[0]]
    return im_mask


def paste_masks_in_image(mask_probs: np.ndarray, boxes: np.ndarray,
                         im_h: int, im_w: int, thresh: float = 0.5,
                         padding: int = 1) -> np.ndarray:
    """(N, M, M) mask probs + (N, 4) xyxy -> (N, im_h, im_w) bool masks
    ready for segm-AP scoring (evaluation.coco_map iou_type="segm")."""
    if len(mask_probs) == 0:
        return np.zeros((0, im_h, im_w), bool)
    return np.stack([
        paste_mask_in_image(m, b, im_h, im_w, thresh, padding)
        for m, b in zip(np.asarray(mask_probs, np.float64),
                        np.asarray(boxes, np.float64))])
