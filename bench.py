"""Benchmark harness: FIBER-Base ITM-rerank throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is image-text pairs/sec/chip through the ITM
*rerank pipeline* — the production retrieval path (encode candidates,
then score (image, text) pairs with the fused encoder + rank head;
ref objectives.py:388-499, our objectives/retrieval.py): candidate
gathers ride along inside one jit dispatch (_rank_pairs_scan), so the
number includes the data staging the reference pays per pair batch.

vs_baseline derivation (see BASELINE.md for the arithmetic):
  FLOPs/pair  F = 109.1 GFLOP (XLA cost analysis of the fused ITM
               forward at 384^2, max_text_len 50, FIBER-Base dims)
  A100 fp16 dense peak = 312 TFLOP/s
  assumed reference MFU = 10% (eager PyTorch, NCHW, shifted-window
               attention, rerank at per-pair batch 10 — public eager
               Swin-B inference measurements land at 8-15% of peak)
  baseline = 312e12 * 0.10 / 109.1e9 = 286 pairs/s/A100
The MFU actually achieved here is printed to stderr alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

FLOPS_PER_PAIR = 109.09e9     # XLA cost analysis, see module docstring
A100_PEAK = 312e12
A100_ASSUMED_MFU = 0.10
A100_BASELINE_PAIRS = A100_PEAK * A100_ASSUMED_MFU / FLOPS_PER_PAIR
V5E_PEAK = 197e12


def main():
    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse
    from fiber_tpu.objectives.retrieval import _rank_pairs_scan

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # pair_batch=8 is the measured sweet spot on the tunneled v5e
    # (throughput *decreases* with batch: 317/306/287 pairs/s at 8/16/24)
    pair_batch = 8 if on_tpu else 2
    n_images = 16 if on_tpu else 2
    topk = 8 if on_tpu else 2

    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0) if on_tpu else \
        FiberConfig.tiny_test(loss_names=("itm",))
    model = FiberCoarse(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((n_images, cfg.image_size, cfg.image_size, 3))
        * 0.5, cfg.compute_dtype)
    n_texts = n_images * 5
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                   (n_texts, cfg.max_text_len)), jnp.int32)
    msk = jnp.ones((n_texts, cfg.max_text_len), jnp.int32)

    variables = jax.jit(
        lambda r: model.init(r, images[:1], ids[:1], msk[:1],
                             method=FiberCoarse.init_full)
    )(jax.random.PRNGKey(0))

    # candidate pairs: top-k texts per image (synthetic ordering —
    # identical compute to an ITC-ranked candidate set)
    pair_img = np.repeat(np.arange(n_images), topk)
    pair_txt = np.asarray([(i * 7 + j * 3) % n_texts
                           for i in range(n_images) for j in range(topk)])
    n_pairs = len(pair_img)

    def run(seed):
        s = _rank_pairs_scan(model, variables,
                             images * (1.0 + seed * 1e-6),
                             ids, msk, jnp.asarray(pair_img),
                             jnp.asarray(pair_txt), pair_batch)
        return float(s.sum())  # host fetch = the only reliable barrier

    run(jnp.float32(0.0))  # compile + warm
    reps = int(os.environ.get("FIBER_BENCH_REPS", 3 if on_tpu else 1))
    t0 = time.perf_counter()
    for r in range(reps):
        run(jnp.float32(1.0 + r))
    dt = (time.perf_counter() - t0) / reps

    pairs_per_sec = n_pairs / dt
    mfu = pairs_per_sec * FLOPS_PER_PAIR / V5E_PEAK
    print(json.dumps({
        "pairs": n_pairs, "sec_per_rerank": round(dt, 4),
        "mfu_v5e": round(mfu, 4),
        "a100_baseline_pairs_per_s": round(A100_BASELINE_PAIRS, 1),
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "itm_rerank_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS, 3),
    }))


if __name__ == "__main__":
    main()
