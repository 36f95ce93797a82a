"""Profiling / FLOPs utilities.

Replacements for the reference's stats hooks (utils/stats.py:19
get_model_complexity_info, utils/flops.py, Swin.flops()): on TPU, XLA
itself reports the cost analysis of a compiled program, so FLOPs come
from the compiler rather than per-module hooks; traces come from
jax.profiler (xprof) rather than torch autograd profilers.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis of jit(fn)(*args): flops, bytes accessed, etc."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    analysis = analyses[0] if isinstance(analyses, (list, tuple)) \
        else analyses
    return {k: float(v) for k, v in dict(analysis).items()
            if np.isscalar(v)}


def count_params(params) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def param_bytes(params) -> int:
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(params))


@contextlib.contextmanager
def trace(logdir: str):
    """xprof trace context (view with tensorboard --logdir)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_model(fn: Callable, params, *example_args) -> Dict[str, Any]:
    """Params + compiled FLOPs summary (the reference prints this at
    startup via get_model_complexity_info)."""
    out = {"params": count_params(params),
           "param_bytes": param_bytes(params)}
    try:
        cost = compiled_cost(fn, params, *example_args)
        out["flops"] = cost.get("flops", float("nan"))
        out["bytes_accessed"] = cost.get("bytes accessed", float("nan"))
    except Exception as e:  # cost analysis unsupported on some backends
        out["cost_analysis_error"] = str(e)
    return out
