"""FIBER-TPU: a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework.

Re-implements the capabilities of microsoft/FIBER (NeurIPS 2022) with a
TPU-first design: flax model definitions, pjit/shard_map data parallelism
with in-graph ICI collectives, Pallas kernels for hot window-attention ops,
and XLA-native detection heads.

Reference (behavioral spec only, no code copied): /root/reference
"""

__version__ = "0.1.0"

from fiber_tpu.config import FiberConfig  # noqa: F401
