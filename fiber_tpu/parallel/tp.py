"""Tensor-parallel parameter sharding over the mesh `model` axis.

The reference is DP-only (SURVEY.md §2.3); FIBER-Base fits one chip, so
TP is an optional scaling axis here rather than a port: large kernels are
sharded column-wise (last dim) over `model`, embeddings row-wise, and XLA
inserts the all-gathers/reduce-scatters implied by the shardings (the
scaling-book recipe: annotate, let the compiler place collectives).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fiber_tpu.parallel.mesh import MODEL_AXIS

# parameters worth sharding: big matmul kernels and embeddings
_MIN_SHARD_SIZE = 1 << 16  # don't bother below 64K elements


def tp_sharding(params, mesh: Mesh):
    """PartitionSpec tree: kernels column-sharded over `model` when the
    last dim divides, embeddings row-sharded, everything else replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = np.shape(leaf)
        if n_model == 1 or np.prod(shape) < _MIN_SHARD_SIZE:
            return P()
        leaf_name = name.rsplit("/", 1)[-1]
        if leaf_name == "kernel" and len(shape) >= 2 \
                and shape[-1] % n_model == 0:
            return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
        if leaf_name == "embedding" and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh):
    """device_put the param tree with TP shardings."""
    specs = tp_sharding(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
