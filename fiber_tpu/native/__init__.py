"""ctypes bindings to the native host library (native/fiber_host.cpp).

Builds `libfiber_host.so` on first use (g++, a few seconds) and caches it
next to the source.  Provides:

* CiderD — n-gram TF-IDF caption scorer (the SCST reward; replaces the
  reference's vendored Python scorer, fiber/modules/cider/ciderD/)
* nms_host — greedy CPU NMS (csrc/cpu/nms_cpu.cpp equivalent)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfiber_host.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "fiber_host.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cider_new.restype = ctypes.c_void_p
    lib.cider_new.argtypes = [ctypes.c_int, ctypes.c_double]
    lib.cider_free.argtypes = [ctypes.c_void_p]
    lib.cider_set_refs.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int]
    lib.cider_score.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.nms_host.restype = ctypes.c_int
    lib.nms_host.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def _flatten(seqs: Sequence[Sequence[int]]):
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    tokens = np.asarray([t for s in seqs for t in s], np.int32)
    if tokens.size == 0:
        tokens = np.zeros(1, np.int32)
    return tokens, offsets


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


class CiderD:
    """CIDEr-D over integer token sequences.

    refs: {image_idx: [token_list, ...]} for the eval corpus (document
    frequencies computed over images, matching the vendored scorer).
    """

    def __init__(self, refs: Dict[int, List[List[int]]], max_n: int = 4,
                 sigma: float = 6.0):
        lib = _load()
        self._lib = lib
        self._h = lib.cider_new(max_n, sigma)
        self._image_index = {img: i for i, img in enumerate(sorted(refs))}
        flat_refs, ref_image = [], []
        for img in sorted(refs):
            for r in refs[img]:
                flat_refs.append(list(r))
                ref_image.append(self._image_index[img])
        tokens, offsets = _flatten(flat_refs)
        ref_image = np.asarray(ref_image, np.int32)
        lib.cider_set_refs(self._h, _ptr(tokens, ctypes.c_int32),
                           _ptr(offsets, ctypes.c_int64),
                           _ptr(ref_image, ctypes.c_int32),
                           len(flat_refs), len(self._image_index))
        self._keepalive = (tokens, offsets, ref_image)

    def score(self, candidates: Dict[int, List[int]]) -> Dict[int, float]:
        """{image_idx: candidate_tokens} -> {image_idx: cider_d}."""
        imgs = sorted(candidates)
        cands = [list(candidates[i]) for i in imgs]
        tokens, offsets = _flatten(cands)
        cand_image = np.asarray([self._image_index[i] for i in imgs],
                                np.int32)
        out = np.zeros(len(imgs), np.float64)
        self._lib.cider_score(self._h, _ptr(tokens, ctypes.c_int32),
                              _ptr(offsets, ctypes.c_int64),
                              _ptr(cand_image, ctypes.c_int32),
                              len(imgs), _ptr(out, ctypes.c_double))
        return {img: float(s) for img, s in zip(imgs, out)}

    def __del__(self):
        try:
            self._lib.cider_free(self._h)
        except Exception:
            pass


def nms_host(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
             max_outputs: int = 100) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(min(max_outputs, len(boxes)), np.int32)
    n = lib.nms_host(_ptr(boxes, ctypes.c_float),
                     _ptr(scores, ctypes.c_float), len(boxes),
                     iou_threshold, len(keep),
                     _ptr(keep, ctypes.c_int32))
    return keep[:n]
