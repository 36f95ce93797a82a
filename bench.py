"""Benchmark harness: FIBER-Base ITM-rerank throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is image-text pairs/sec/chip through the ITM
*rerank pipeline* — the production retrieval path (encode candidates,
then score (image, text) pairs with the fused encoder + rank head; ref
objectives.py:388-499, our objectives/retrieval.py).  The TPU pipeline
caches the text-independent image trunk per image and the text prefix
per text, then runs only the fused tail per pair
(rank_pairs_pipeline) — numerically identical to the reference's
full-forward-per-pair rerank (tests/test_retrieval_caption.py asserts
bitwise match).  The timed region covers EVERYTHING: trunk encoding,
text prefix encoding, and all pair scoring.

vs_baseline derivation (see BASELINE.md for the arithmetic):
  FLOPs/pair  F = 109.1 GFLOP (XLA cost analysis of the fused ITM
               forward at 384^2, max_text_len 50, FIBER-Base dims) —
               the work the REFERENCE executes per reranked pair
  A100 fp16 dense peak = 312 TFLOP/s
  assumed reference MFU = 10% (eager PyTorch, NCHW, shifted-window
               attention, rerank at per-pair batch 10 — public eager
               Swin-B inference measurements land at 8-15% of peak)
  baseline = 312e12 * 0.10 / 109.1e9 = 286 pairs/s/A100
Stderr also reports the *executed* FLOP rate (TF/s) over the FLOPs this
pipeline actually runs (trunk once per image + prefix once per text +
tail per pair), so hardware efficiency is not conflated with the
algorithmic reuse win.
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
    from fiber_tpu.objectives.retrieval import rank_pairs_pipeline

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # The reference rerank scores EVERY text against EVERY image
    # (objectives.py:442-466: per-image loop over all text batches), so
    # the benchmark workload is the full n_images x n_texts matrix.
    # pair_batch 64 measured best (tools/profile_rerank.py round 3:
    # tail 0.816 ms/pair at B=64 vs 0.845 at B=32).
    pair_batch = 64 if on_tpu else 2
    n_images = 16 if on_tpu else 2
    topk = None  # full matrix, like the reference

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

    # candidate pairs: the full cross product (the reference's exact
    # workload) or top-k per image when topk is set
    if topk is None:
        pair_img = np.repeat(np.arange(n_images), n_texts)
        pair_txt = np.tile(np.arange(n_texts), n_images)
    else:
        pair_img = np.repeat(np.arange(n_images), topk)
        pair_txt = np.asarray([(i * 7 + j * 3) % n_texts
                               for i in range(n_images)
                               for j in range(topk)])
    n_pairs = len(pair_img)

    def run(seed):
        s = rank_pairs_pipeline(model, variables,
                                images * (1.0 + seed * 1e-6),
                                ids, msk, pair_img, pair_txt, pair_batch,
                                trunk_batch=min(8, n_images))
        return float(s.sum())  # host fetch = the only reliable barrier

    run(jnp.float32(0.0))  # compile + warm
    reps = int(os.environ.get("FIBER_BENCH_REPS", 3 if on_tpu else 1))
    t0 = time.perf_counter()
    for r in range(reps):
        run(jnp.float32(1.0 + r))
    dt = (time.perf_counter() - t0) / reps

    pairs_per_sec = n_pairs / dt
    # executed FLOPs: trunk per image + prefix per text + tail per pair
    # (XLA cost analysis at these exact shapes: trunk 69.11 GF/img,
    #  prefix 3.57 GF/txt, tail (incl. rank head) 36.52 GF/pair —
    #  sums to 109.2 GF for one full forward, matching FLOPS_PER_PAIR)
    TRUNK_GF, PRE_GF, TAIL_GF = 69.11e9, 3.57e9, 36.52e9
    executed = n_images * TRUNK_GF + n_texts * PRE_GF + n_pairs * TAIL_GF
    diag = {
        "pairs": n_pairs, "sec_per_rerank": round(dt, 4),
        "executed_tf_per_s": round(executed / dt / 1e12, 2),
        "executed_mfu_v5e": round(executed / dt / V5E_PEAK, 4),
        "reference_work_mfu_v5e": round(
            pairs_per_sec * FLOPS_PER_PAIR / V5E_PEAK, 4),
        "a100_baseline_pairs_per_s": round(A100_BASELINE_PAIRS, 1),
    }
    # Secondary metric: zero-shot detection throughput vs its own derived
    # baseline (BASELINE.md "detection baseline": the reference eval is
    # batch-1-constrained, generalized_vl_rcnn.py:363).  Off by default
    # off-TPU; FIBER_BENCH_DET=0 skips it on TPU too.
    if on_tpu and os.environ.get("FIBER_BENCH_DET", "1") != "0":
        try:
            diag.update(_detection_bench())
        except Exception as e:  # never fail the headline metric
            diag["det_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(diag), file=sys.stderr)
    print(json.dumps({
        "metric": "itm_rerank_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS, 3),
    }))


def _detection_bench(batch: int = 2, reps: int = 3):
    """Fusion Swin-B + VLDyHead forward at the reference test resolution
    (800x1344, 256-token prompt); see tools/bench_det.py for the
    standalone version and BASELINE.md for the baseline derivation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector)

    cfg = DetectorConfig(image_size=(800, 1344),
                         compute_dtype=jnp.bfloat16)
    model = GroundingDetector(cfg)
    H, W = cfg.image_size
    rng = np.random.default_rng(0)
    B = batch
    images = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5,
                         cfg.compute_dtype)
    L = cfg.max_query_len
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, ids,
                                    msk)

    @jax.jit
    def fwd(v, im, i, m):
        out = model.apply(v, im, i, m)
        ho = out["head_out"]
        return sum(jnp.sum(x.astype(jnp.float32))
                   for lvl in ho.values() for x in
                   (lvl if isinstance(lvl, (list, tuple)) else [lvl]))

    float(fwd(variables, images, ids, msk))  # compile + warm
    t0 = time.perf_counter()
    s = None
    for r in range(reps):
        s = fwd(variables, images * (1.0 + r * 1e-6), ids, msk)
    float(s)
    det_dt = (time.perf_counter() - t0) / reps
    DET_FLOPS = 1213.3e9
    det_baseline = 312e12 * 0.04 / DET_FLOPS
    return {
        "det_img_per_s_per_chip": round(B / det_dt, 3),
        "det_batch": B,
        "det_executed_tf_per_s": round(B * DET_FLOPS / det_dt / 1e12, 2),
        "det_a100_baseline_img_per_s": round(det_baseline, 2),
        "det_vs_baseline": round(B / det_dt / det_baseline, 3),
    }


if __name__ == "__main__":
    main()
