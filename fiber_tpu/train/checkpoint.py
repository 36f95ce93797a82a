"""Checkpoint save/restore with auto-resume.

Replaces the reference's PL ModelCheckpoint (run.py:29-35) and
Checkpointer/`last_checkpoint` tag (fine_grained utils/checkpoint.py:34-92)
with orbax: saves the full TrainState (params, optimizer, step, ITC queue,
EMA) plus a best-metric tracker; `latest_step` enables auto-resume.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2,
                 best_metric_name: Optional[str] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))
        self.best_metric_name = best_metric_name
        self._best_path = os.path.join(self.directory, "best.json")

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metrics and self.best_metric_name in (metrics or {}):
            current = metrics[self.best_metric_name]
            best = self.best_value()
            if best is None or current > best:
                with open(self._best_path, "w") as f:
                    json.dump({"step": step, "value": float(current)}, f)

    def best_value(self) -> Optional[float]:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)["value"]
        return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any,
                step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state))
