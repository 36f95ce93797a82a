"""Multihost (pod-scale) bring-up and host-side gathers.

TPU-native replacement for the reference's launch + comm story:

* process-group rendezvous from env variables
  (ref coarse_grained/azure_distributed_run.py:22-61 builds
  MASTER_ADDR/RANK/WORLD_SIZE and torch.distributed init) becomes
  `jax.distributed.initialize`, after which `jax.devices()` spans all
  hosts and every pjit program is automatically global;
* object/tensor gathers for eval merging
  (ref fine_grained/maskrcnn_benchmark/utils/comm.py all_gather,
  engine/inference.py:280 _accumulate_predictions_from_multiple_gpus,
  coarse_grained dist_utils.py:84-170) become
  `multihost_utils.process_allgather` plus a pickle-over-uint8 object
  gather with length padding.

Single-process runs are the no-op fast path: every helper degrades to
identity when `jax.process_count() == 1`, so the same scripts run on one
chip and on a pod unchanged.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import numpy as np

_initialized = False


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize the JAX process group if configured; returns True when
    a multi-process group is (or was already) up.

    Configuration sources, in priority order:
    1. explicit arguments,
    2. FIBER_COORDINATOR / FIBER_NUM_PROCESSES / FIBER_PROCESS_ID env vars
       (the env contract the launcher scripts export — equivalent of the
       reference's MASTER_ADDR/WORLD_SIZE/RANK, azure_distributed_run.py),
    3. nothing -> single-process, return False.

    On Cloud TPU pods `jax.distributed.initialize()` can also auto-detect
    from the TPU metadata server; set FIBER_COORDINATOR=auto to use it.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("FIBER_COORDINATOR")
    if coordinator is None:
        return False
    if coordinator == "auto":
        jax.distributed.initialize()
    else:
        num_processes = num_processes or int(
            os.environ["FIBER_NUM_PROCESSES"])
        process_id = process_id if process_id is not None else int(
            os.environ["FIBER_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def process_allgather(x) -> np.ndarray:
    """Gather a per-host array along a new leading axis -> (P, ...).
    No-op wrap for P == 1."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def gather_objects(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object from every host (ref
    comm.py:52-82 all_gather / dist_utils.py:84-136 gather pickled byte
    tensors with length padding).  Returns [obj_0, ..., obj_{P-1}] on
    every host; [obj] when single-process."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[p, :int(sizes[p])].tobytes())
            for p in range(gathered.shape[0])]


def merge_eval_predictions(local: dict) -> dict:
    """Merge {image_id: prediction} dicts from all hosts (ref
    engine/inference.py:280-301: gather then flatten, warning on holes is
    the caller's business since our samplers pad rather than skip)."""
    merged: dict = {}
    for part in gather_objects(local):
        merged.update(part)
    return merged


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a global batch (node-aware data
    sharding; ref data/build.py per-node DistributedSampler chunks)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
