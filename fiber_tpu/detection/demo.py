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


# closed-class words that terminate a noun phrase (heuristic chunker for
# the zero-egress environment where the reference's NLTK models are
# unavailable; nltk's grammar chunker is used when its data exists)
_NP_BREAKERS = frozenset(
    "a an the is are was were be been being and or but of on in at to "
    "with for from by over under near behind chasing eating running "
    "wearing holding riding next beside above below across through "
    "that this these those there it its his her their".split())


def find_noun_phrases(caption: str) -> List[Tuple[int, int]]:
    """Noun-phrase char spans (ref predictor_FIBER.py:106 run_ner uses an
    NLTK POS pass + grammar 'NP: {<DT>?<JJ.*>*<NN.*>+}').  When the NLTK
    models are available they are used; otherwise a closed-class-word
    chunker approximates the same spans: maximal runs of non-breaker
    words ending in a noun candidate."""
    try:
        import nltk
        tokens = nltk.word_tokenize(caption.lower())
        pos_tags = nltk.pos_tag(tokens)
        grammar = "NP: {<DT>?<JJ.*>*<NN.*>+}"
        cp = nltk.RegexpParser(grammar)
        tree = cp.parse(pos_tags)
        spans = []
        cursor = 0
        for sub in tree.subtrees(lambda t: t.label() == "NP"):
            phrase = " ".join(w for w, _ in sub.leaves())
            m = re.search(re.escape(phrase), caption.lower()[cursor:])
            if m:
                spans.append((cursor + m.start(), cursor + m.end()))
                cursor += m.end()
        if spans:
            return spans
    except LookupError:
        pass
    except ImportError:
        pass

    spans = []
    for seg_m in re.finditer(r"[^.,;!?]+", caption):
        words = list(re.finditer(r"\w+", seg_m.group(0)))
        chunk: List[re.Match] = []
        for w in words + [None]:
            if w is None or w.group(0).lower() in _NP_BREAKERS:
                if chunk:
                    s = seg_m.start() + chunk[0].start()
                    e = seg_m.start() + chunk[-1].end()
                    spans.append((s, e))
                chunk = []
            else:
                chunk.append(w)
    return spans


def run_ner(caption: str,
            refexp_mode: bool = False) -> List[List[Tuple[int, int]]]:
    """tokens_positive lists per entity, marking EVERY occurrence of each
    noun phrase (ref predictor_FIBER.py:106-131 run_ner)."""
    if refexp_mode:
        return [[(0, len(caption))]]
    phrases = [caption[s:e] for s, e in find_noun_phrases(caption)]
    tokens_positive = []
    for phrase in dict.fromkeys(p for p in phrases if p):
        occ = [(m.start(), m.end())
               for m in re.finditer(re.escape(phrase.lower()),
                                    caption.lower())]
        if occ:
            tokens_positive.append(occ)
    return tokens_positive


_PALETTE = [(230, 60, 60), (60, 160, 230), (60, 200, 120), (240, 180, 40),
            (170, 90, 230), (240, 120, 200), (120, 220, 220), (250, 140, 70)]


def render_detections(image_u8: np.ndarray, boxes: np.ndarray,
                      labels: Sequence[str],
                      scores: Optional[np.ndarray] = None,
                      masks: Optional[np.ndarray] = None,
                      width: int = 2) -> np.ndarray:
    """Draw boxes (+ optional masks) with labels onto a copy of the image
    (ref predictor_FIBER overlay_boxes/overlay_class_names/overlay_mask)."""
    from PIL import Image, ImageDraw
    img = Image.fromarray(image_u8).convert("RGB")
    if masks is not None:
        overlay = np.asarray(img, np.float32)
        for i, m in enumerate(masks):
            color = np.asarray(_PALETTE[i % len(_PALETTE)], np.float32)
            mm = m.astype(bool)
            overlay[mm] = 0.5 * overlay[mm] + 0.5 * color
        img = Image.fromarray(overlay.astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for i, (box, label) in enumerate(zip(boxes, labels)):
        color = _PALETTE[i % len(_PALETTE)]
        x1, y1, x2, y2 = [float(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=width)
        text = label if scores is None else f"{label} {scores[i]:.2f}"
        draw.text((x1 + 2, max(y1 - 12, 0)), text, fill=color)
    return np.asarray(img)


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
