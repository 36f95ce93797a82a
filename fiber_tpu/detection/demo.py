"""Single-image grounding demo (GLIPDemo equivalent).

Behavioral spec: engine/predictor_FIBER.py:27-426 — ad-hoc inference on
one image + free-text caption: tokenize, map each noun phrase (or the
whole caption) to token spans, run the detector, convert grounding logits
to per-phrase scores, threshold + NMS, return labeled boxes.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.detector import (DetectorConfig, GroundingDetector,
                                          detection_inference)
from fiber_tpu.detection.postprocess import label_to_token_matrix
from fiber_tpu.data.od_to_grounding import char_spans_to_token_ids


def find_noun_phrases(caption: str) -> List[Tuple[int, int]]:
    """Cheap phrase spans: '.'-separated segments (the reference uses an
    NLTK NER pass, predictor_FIBER.py run_ner:106; period-separated
    prompts are the detection convention)."""
    spans = []
    pos = 0
    for seg in caption.split("."):
        seg_strip = seg.strip()
        if seg_strip:
            start = caption.index(seg_strip, pos)
            spans.append((start, start + len(seg_strip)))
        pos += len(seg) + 1
    return spans


class GroundingDemo:
    def __init__(self, model: GroundingDetector, variables, tokenizer,
                 score_threshold: float = 0.5):
        self.model = model
        self.cfg = model.cfg
        self.variables = variables
        self.tokenizer = tokenizer
        self.score_threshold = score_threshold

    def preprocess(self, image_u8: np.ndarray) -> Tuple[jax.Array, Tuple]:
        """uint8 HWC -> padded model input + original size."""
        from PIL import Image
        H, W = self.cfg.image_size
        h0, w0 = image_u8.shape[:2]
        scale = min(H / h0, W / w0)
        nh, nw = int(h0 * scale), int(w0 * scale)
        img = Image.fromarray(image_u8).resize((nw, nh))
        canvas = np.zeros((H, W, 3), np.float32)
        arr = np.asarray(img, np.float32)
        # reference detection normalization: BGR255 - pixel_mean; we use
        # RGB [0,1] mean/std (documented difference; converter-trained
        # checkpoints supply their own normalization constants)
        arr = arr / 255.0
        canvas[:nh, :nw] = arr
        return jnp.asarray(canvas)[None], (h0, w0, scale)

    def __call__(self, image_u8: np.ndarray, caption: str,
                 phrases: Optional[List[str]] = None) -> Dict:
        cfg = self.cfg
        if phrases:
            spans = []
            for p in phrases:
                i = caption.lower().find(p.lower())
                if i >= 0:
                    spans.append((i, i + len(p)))
        else:
            spans = find_noun_phrases(caption)
        labels = {i + 1: caption[s:e] for i, (s, e) in enumerate(spans)}

        enc = (self.tokenizer.batch([caption],
                                    max_length=cfg.max_query_len)
               if hasattr(self.tokenizer, "batch") else
               self.tokenizer([caption], max_length=cfg.max_query_len,
                              padding="max_length", truncation=True,
                              return_tensors="np"))
        l2t = {i + 1: char_spans_to_token_ids(self.tokenizer, caption,
                                              span, cfg.max_query_len)
               for i, span in enumerate(spans)}
        agg = jnp.asarray(label_to_token_matrix(l2t, len(spans),
                                                cfg.max_query_len))

        img, (h0, w0, scale) = self.preprocess(image_u8)
        batch = {
            "images": img,
            "input_ids": jnp.asarray(enc["input_ids"], jnp.int32),
            "attention_mask": jnp.asarray(enc["attention_mask"], jnp.int32),
            "image_sizes": jnp.asarray(
                [[h0 * scale, w0 * scale]], jnp.float32),
        }
        dets = detection_inference(self.model, self.variables, batch, agg)
        boxes = np.asarray(dets.boxes[0]) / scale
        scores = np.asarray(dets.scores[0])
        cls = np.asarray(dets.labels[0])
        valid = np.asarray(dets.valid[0]) & (scores >= self.score_threshold)
        return {
            "boxes": boxes[valid],
            "scores": scores[valid],
            "labels": [labels.get(int(c), str(int(c)))
                       for c in cls[valid]],
        }
