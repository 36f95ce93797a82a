"""Benchmark harness: FIBER-Base fused ITM forward throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is image-text pairs/sec/chip through the fused
ITM forward (the hot path of both pretraining and ITM reranking,
ref call stack SURVEY.md §3.1/§3.2).  vs_baseline compares against an
A100 PyTorch estimate for the same model (see BASELINE.md: the reference
publishes no throughput numbers; we use a conservative 48 pairs/s/A100
fp16 estimate for FIBER-Base 384^2 ITM forward).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_PAIRS_PER_SEC = 48.0  # conservative fp16 A100 estimate


def main():
    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse

    platform = jax.devices()[0].platform
    B = 32 if platform == "tpu" else 2
    import os as _os
    steps = int(_os.environ.get("FIBER_BENCH_STEPS", 20 if platform == "tpu" else 2))

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0)
    model = FiberCoarse(cfg)

    img = jnp.zeros((B, cfg.image_size, cfg.image_size, 3), cfg.compute_dtype)
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32)
    msk = jnp.ones((B, cfg.max_text_len), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, img, ids, msk,
                             method=FiberCoarse.init_full)
    )(jax.random.PRNGKey(0))

    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def itm_forward_n(variables, img, ids, msk, seed, n):
        """n chained fused ITM forwards in one dispatch (lax.scan), so
        tunnel marshalling/latency is amortized and the measurement is
        pure device compute.  The carry perturbs each step's input so no
        step can be folded away or served from a warm result."""
        def body(carry, _):
            x = img + carry.astype(img.dtype) * 1e-6
            out = model.apply(variables, x, ids, msk,
                              method=FiberCoarse.infer, deterministic=True)
            score = model.apply(variables, out["cls_feats"],
                                method=FiberCoarse.rank_scores)
            return score.mean().astype(jnp.float32), None
        carry, _ = jax.lax.scan(body, seed, None, length=n)
        return carry

    # compile + warm
    float(itm_forward_n(variables, img, ids, msk,
                        jnp.float32(0.0), steps))
    # timed run with a different seed (defeats warm-result reuse);
    # host fetch is the only reliable completion barrier over the relay
    t0 = time.perf_counter()
    float(itm_forward_n(variables, img, ids, msk,
                        jnp.float32(1.0), steps))
    dt = (time.perf_counter() - t0) / steps

    pairs_per_sec = B / dt
    print(json.dumps({
        "metric": "itm_fused_forward_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / A100_REFERENCE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
