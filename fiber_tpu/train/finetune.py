"""Few-shot fine-tuning utilities (reference: tools/finetune.py).

* tuning modes (tuning_highlevel_override, finetune.py:246-294):
  - "full": everything trains
  - "linear_prob": only the prediction heads (cls/bbox/centerness +
    dot-product text projection)
  - "prompt_tuning": only the language path (prompt/text projection)
  Implemented as optax masks (zero updates for frozen params) — the
  functional equivalent of requires_grad=False.
* X-shot subsetting: pick images until each class has >= shots instances
  (finetune.py custom samplers).
* patience-based auto-termination on a validation metric
  (engine/trainer.py:349-360).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np
import optax

TUNING_MODES = ("full", "linear_prob", "language_prompt_v1",
                "language_prompt_v2", "language_prompt_v3",
                "language_prompt_v4")

# exact flag table of tuning_highlevel_override (ref finetune.py:246-294)
TUNING_FLAGS = {
    #                   backbone fpn   rpn   linear_prob add_linear lang
    "full":              (False, False, False, False, False, False),
    "linear_prob":       (True,  True,  False, True,  False, True),
    "language_prompt_v1": (True, True,  True,  False, False, False),
    "language_prompt_v2": (True, True,  True,  False, True,  True),
    "language_prompt_v3": (True, True,  True,  True,  False, False),
    "language_prompt_v4": (True, True,  True,  True,  True,  True),
}

_LINEAR_PROB_HEADS = ("cls_logits", "bbox_pred", "centerness",
                      "dot_product_projection_text", "bias_lang",
                      "bias0", "log_scale", "scales")


def tuning_highlevel_override(mode: str) -> Dict[str, bool]:
    """{flag: frozen/enabled} for a tuning mode (ref finetune.py:246-294)."""
    b, f, r, lp, al, lang = TUNING_FLAGS[mode]
    return {"backbone_freeze": b, "fpn_freeze": f, "rpn_freeze": r,
            "linear_prob": lp, "add_linear_layer": al,
            "language_backbone_freeze": lang}


def trainable_mask(params, mode: str):
    """True = trainable, derived from the reference's freeze flags.

    Param-tree regions: the fused vision trunk (backbone/patch_embed +
    layers_*), the FPN, the language backbone, the head (everything under
    the dyhead/rpn), and the prompt tunable_linear."""
    flags = tuning_highlevel_override(mode)

    def decide(path, _leaf) -> bool:
        if mode == "full":
            return True  # everything that exists trains
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "tunable_linear" in name:
            return flags["add_linear_layer"]
        if "language_backbone" in name:
            return not flags["language_backbone_freeze"]
        if "fpn" in name:
            return not flags["fpn_freeze"]
        if any(s in name for s in ("patch_embed", "layers_", "out_norm")):
            return not flags["backbone_freeze"]
        # remaining params belong to the head/rpn
        if flags["linear_prob"]:
            return any(h in name for h in _LINEAR_PROB_HEADS)
        return not flags["rpn_freeze"]

    return jax.tree_util.tree_map_with_path(decide, params)


def apply_tuning_mode(tx: optax.GradientTransformation, params,
                      mode: str) -> optax.GradientTransformation:
    if mode == "full":
        return tx
    mask = trainable_mask(params, mode)
    return optax.chain(
        optax.masked(optax.set_to_zero(),
                     jax.tree_util.tree_map(lambda t: not t, mask)),
        tx)


def x_shot_subset(image_labels: Sequence[Sequence[int]], shots: int,
                  rng: Optional[np.random.Generator] = None) -> List[int]:
    """Pick image indices until every class present has >= `shots`
    instances (ref finetune.py X-shot dataset subsetting)."""
    rng = rng or np.random.default_rng(0)
    order = rng.permutation(len(image_labels))
    counts: Dict[int, int] = {}
    all_classes = {c for labels in image_labels for c in labels}
    chosen: List[int] = []
    for i in order:
        labels = image_labels[i]
        if not labels:
            continue
        if any(counts.get(c, 0) < shots for c in labels):
            chosen.append(int(i))
            for c in labels:
                counts[c] = counts.get(c, 0) + 1
        if all(counts.get(c, 0) >= shots for c in all_classes):
            break
    return sorted(chosen)


class EarlyStopper:
    """Patience-based auto-termination (ref trainer.py:349-360)."""

    def __init__(self, patience: int = 8, minimize: bool = False):
        self.patience = patience
        self.minimize = minimize
        self.best: Optional[float] = None
        self.bad = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        better = (self.best is None
                  or (value < self.best if self.minimize
                      else value > self.best))
        if better:
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
        return self.bad >= self.patience
