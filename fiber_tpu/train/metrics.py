"""Epoch metric accumulation + `the_metric` composition.

Behavioral spec: fiber/modules/fiber_utils.py:14-141 (set_metrics /
epoch_wrapup) and gadgets/my_metrics.py: per-task weighted-mean
accumulators; the checkpoint-selection scalar `the_metric` sums each
active task's epoch accuracy/score (VQA score, ITM/NLVR2/MLM/caption
accuracy) plus IR@1+TR@1 when retrieval recall is enabled.

Under pjit the per-batch values are already global means, so the
distributed sum-reduce of the reference's PL metrics is implicit.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class MeanAccumulator:
    """Weighted running mean (the reference's Scalar/Accuracy metrics
    reduce sums of (value, count) across ranks)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0.0

    def update(self, value: float, weight: float = 1.0):
        if np.isfinite(value):
            self.total += float(value) * weight
            self.count += weight

    def compute(self) -> float:
        return self.total / self.count if self.count else float("nan")

    def reset(self):
        self.total = 0.0
        self.count = 0.0


class EpochMetrics:
    """Accumulates per-step metric dicts and composes `the_metric`."""

    # which per-task statistic contributes to the_metric
    _KEY_FOR_TASK = {
        "vqa": "vqa_score",
        "nlvr2": "nlvr2_accuracy",
        "itm": "itm_accuracy",
        "mlm": "mlm_accuracy",
        "caption_mle": "caption_mle_accuracy",
        "caption_gold": "caption_gold_accuracy",
        "caption_cider": "caption_cider_accuracy",
    }

    def __init__(self, loss_names):
        self.loss_names = tuple(loss_names)
        self.acc: Dict[str, MeanAccumulator] = {}

    def update(self, step_metrics: Dict[str, float], weight: float = 1.0):
        for k, v in step_metrics.items():
            self.acc.setdefault(k, MeanAccumulator()).update(
                float(v), weight)

    def compute(self, recall_metrics: Optional[Dict[str, float]] = None
                ) -> Dict[str, float]:
        out = {k: a.compute() for k, a in self.acc.items()}
        the_metric = 0.0
        for task in self.loss_names:
            key = self._KEY_FOR_TASK.get(task)
            if key and key in out and np.isfinite(out[key]):
                the_metric += out[key]
        if recall_metrics:
            out.update(recall_metrics)
            the_metric += recall_metrics.get("itc_ir_r1", 0.0)
            the_metric += recall_metrics.get("itc_tr_r1", 0.0)
        out["the_metric"] = the_metric
        return out

    def reset(self):
        for a in self.acc.values():
            a.reset()
