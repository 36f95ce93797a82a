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

Process structure (round 5): each bench section runs in its OWN
subprocess, launched sequentially (the tunneled TPU admits one process
at a time).  Round 4's monolithic run showed why: the detection section
crashed the TPU worker and the pretrain section then saw a dead chip,
so one failure poisoned every later metric.  The parent process never
touches the TPU; it merges the per-section JSON and prints the headline
line.  Run a single section directly with `python bench.py --section
rerank|det|train|det_train`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

FLOPS_PER_PAIR = 109.09e9     # XLA cost analysis, see module docstring
A100_PEAK = 312e12
A100_ASSUMED_MFU = 0.10
A100_BASELINE_PAIRS = A100_PEAK * A100_ASSUMED_MFU / FLOPS_PER_PAIR
V5E_PEAK = 197e12

SECTION_TIMEOUT_S = int(os.environ.get("FIBER_BENCH_SECTION_TIMEOUT", 1500))
# fwd+bwd detection at 800x1344 has the longest server-side
# first-execution compile of the four programs (~15-20 min at B=2)
DET_TRAIN_TIMEOUT_S = int(os.environ.get(
    "FIBER_BENCH_DET_TRAIN_TIMEOUT", 2400))


def _run_section(name: str):
    """Run one bench section in a fresh subprocess; return its dict.

    The subprocess prints exactly one JSON object on its LAST stdout
    line.  Any crash (TPU worker fault, OOM, timeout) is contained here
    and reported as {name}_error without touching later sections."""
    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    limit = DET_TRAIN_TIMEOUT_S if name == "det_train" else SECTION_TIMEOUT_S
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=limit,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {f"{name}_error": f"timeout after {limit}s"}
    tail_out = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not tail_out:
        err = (proc.stderr or "").strip().splitlines()
        msg = err[-1] if err else f"rc={proc.returncode}, no output"
        return {f"{name}_error": msg[:200]}
    try:
        return json.loads(tail_out[-1])
    except json.JSONDecodeError:
        return {f"{name}_error": f"bad JSON: {tail_out[-1][:160]}"}


def main():
    if "--section" in sys.argv:
        name = sys.argv[sys.argv.index("--section") + 1]
        out = SECTIONS[name]()
        print(json.dumps(out))
        return

    diag = {}
    rerank = _run_section("rerank")
    diag.update(rerank)
    on_tpu = bool(rerank.get("on_tpu", False))
    diag.pop("on_tpu", None)
    if on_tpu and os.environ.get("FIBER_BENCH_TRAIN", "1") != "0":
        diag.update(_run_section("train"))
    if on_tpu and os.environ.get("FIBER_BENCH_DET", "1") != "0":
        diag.update(_run_section("det"))
    if on_tpu and os.environ.get("FIBER_BENCH_DET_TRAIN", "1") != "0":
        diag.update(_run_section("det_train"))

    pairs_per_sec = diag.pop("pairs_per_sec", 0.0)
    print(json.dumps(diag), file=sys.stderr)
    print(json.dumps({
        "metric": "itm_rerank_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS, 3),
    }))


def _rerank_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse
    from fiber_tpu.objectives.retrieval import rank_pairs_pipeline

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # The reference rerank scores EVERY text against EVERY image
    # (objectives.py:442-466: per-image loop over all text batches), so
    # the benchmark workload is the full n_images x n_texts matrix.
    # pair_batch / trunk_batch from the round-5 on-chip sweep
    # (tools/profile_rerank.py) after the head-group grid fix landed.
    pair_batch = int(os.environ.get("FIBER_BENCH_PAIR_BATCH",
                                    128 if on_tpu else 2))
    n_images = 16 if on_tpu else 2
    trunk_batch = int(os.environ.get("FIBER_BENCH_TRUNK_BATCH",
                                     min(8, n_images)))
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
                                trunk_batch=trunk_batch)
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
    return {
        "on_tpu": on_tpu,
        "pairs_per_sec": round(pairs_per_sec, 2),
        "pairs": n_pairs, "sec_per_rerank": round(dt, 4),
        "pair_batch": pair_batch, "trunk_batch": trunk_batch,
        "executed_tf_per_s": round(executed / dt / 1e12, 2),
        "executed_mfu_v5e": round(executed / dt / V5E_PEAK, 4),
        "reference_work_mfu_v5e": round(
            pairs_per_sec * FLOPS_PER_PAIR / V5E_PEAK, 4),
        "a100_baseline_pairs_per_s": round(A100_BASELINE_PAIRS, 1),
    }


def _detection_bench(batch: int | None = None, reps: int = 12):
    """Fusion Swin-B + VLDyHead zero-shot eval step at the reference test
    resolution (800x1344, 256-token prompt, 80-class prompt map).

    The timed region is the FULL eval path the reference pays per image
    (rpn/inference.py:554-812): forward + grounding->OD conversion + ATSS
    postprocess + multi-label NMS to top-100 detections.  Timing runs the
    way a production TPU eval pipeline runs: `reps` distinct pre-staged
    batches are consumed by ONE jit program that lax.scans the eval step
    over them with a data dependency chained batch-to-batch (batch r+1's
    input is perturbed by batch r's detections, so steps cannot overlap
    or be elided), and one host fetch ends the chain.  Per-dispatch
    timing is wrong on this runtime, not just noisy: each python-level
    dispatch through the tunnel relay re-marshals the ~2000 param-leaf
    arg handles (~390 ms/call at these arg counts, round-5 measurement —
    12x the 31 ms fixed cost), which a real eval loop amortizes with
    exactly this kind of on-device input pipeline (data/loader.py stages
    batches ahead).  See tools/probe_fullstep.py for the decomposition
    and BASELINE.md for the 4%-MFU baseline derivation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector,
                                              detection_inference)

    if batch is None:
        # B=8's first execution exceeds the relay worker's watchdog (the
        # round-4 "kernel fault"); B=4 compiles reliably and measures
        # within 3% of B=8's per-image steady state (round-5 notes)
        batch = int(os.environ.get("FIBER_BENCH_DET_BATCH", 4))
    cfg = DetectorConfig(image_size=(800, 1344),
                         compute_dtype=jnp.bfloat16)
    model = GroundingDetector(cfg)
    H, W = cfg.image_size
    rng = np.random.default_rng(0)
    B = batch
    images = jnp.asarray(
        rng.standard_normal((reps, B, H, W, 3)) * 0.5, cfg.compute_dtype)
    L = cfg.max_query_len
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    msk = jnp.ones((B, L), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[0], ids,
                                    msk)
    # 80-class COCO-style prompt map: class c <- tokens (2c+1, 2c+2)
    agg = np.zeros((80, L), np.float32)
    for c in range(80):
        agg[c, 2 * c + 1:2 * c + 3] = 0.5
    agg = jnp.asarray(agg)
    sizes = jnp.broadcast_to(jnp.asarray([float(H), float(W)]), (B, 2))

    @jax.jit
    def run_chain(v, ims, eps):
        def body(carry, im):
            im = im * (1.0 + eps * 1e-6 + carry * 1e-9).astype(im.dtype)
            dets = detection_inference(model, v, {
                "images": im, "input_ids": ids, "attention_mask": msk,
                "image_sizes": sizes}, agg)
            s = (dets.scores.astype(jnp.float32).sum()
                 + dets.boxes.astype(jnp.float32).sum())
            return s, s
        s, _ = jax.lax.scan(body, jnp.float32(0.0), ims)
        return s

    float(run_chain(variables, images, jnp.float32(0.0)))  # compile+warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        # fresh eps each call so the relay cannot serve a warm result
        float(run_chain(variables, images, jnp.float32(1.0 + r)))
        times.append(time.perf_counter() - t0)
    det_dt = min(times) / reps
    DET_FLOPS = 1213.3e9
    det_baseline = 312e12 * 0.04 / DET_FLOPS
    return {
        "det_img_per_s_per_chip": round(B / det_dt, 3),
        "det_batch": B,
        "det_timed_region": "forward+postprocess+nms_top100",
        "det_executed_tf_per_s": round(B * DET_FLOPS / det_dt / 1e12, 2),
        "det_a100_baseline_img_per_s": round(det_baseline, 2),
        "det_vs_baseline": round(B / det_dt / det_baseline, 3),
    }


def _pretrain_bench(batch: int = 8, scan: int = 4, reps: int = 3):
    """FIBER-Base pretrain step (mlm + itc + hard-neg itm, the reference's
    task_pretrain_mlm_itm_itc composition, ref config.py:101-107) at
    micro-batch 8 on one chip, timed as the production inner loop:
    `scan` monolithic steps chained in ONE program
    (trainer.train_steps_scan) over pre-staged per-step batches, one
    host fetch per call.

    Why not the split three-dispatch step (train_step_split): each
    dispatch re-marshals the ~3000-leaf param/grad/opt trees through the
    tunnel relay (~150-400 ms/call at these arg counts), which recorded
    803 ms/step (9.96 ex/s) where the on-device work is 355 ms — a relay
    artifact no real training loop pays.  Round-3's "the monolithic
    program crashes the relay compile helper at B=8" was the relay
    watchdog timing out on the first execution, not a compiler fault:
    the scan form defers compilation to first execution, which completes
    in ~450 s and then runs 355 ms/step (tools/probe_train_scan.py,
    docs/ROUND5_NOTES.md).  See BASELINE.md "pretrain baseline" for the
    12%-MFU A100 derivation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.config import FiberConfig
    from fiber_tpu.train.trainer import CoarseTrainer

    batch = int(os.environ.get("FIBER_BENCH_TRAIN_BATCH", batch))
    scan = int(os.environ.get("FIBER_BENCH_TRAIN_SCAN", scan))
    # remat off by default: B=8 at 384^2 fits v5e HBM without
    # checkpointing, and skipping the block recompute is worth 15%
    # (355.5 -> 301.3 ms/step, tools/probe_train_scan.py --remat 0)
    remat = os.environ.get("FIBER_BENCH_TRAIN_REMAT", "0") != "0"
    cfg = FiberConfig.base(image_size=384, drop_rate=0.0,
                           swin_drop_path_rate=0.0, remat=remat,
                           loss_names=("mlm", "itc", "itm"))
    trainer = CoarseTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    B, R = batch, scan
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(
        (R, B, cfg.image_size, cfg.image_size, 3)) * 0.5,
        cfg.compute_dtype)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size,
                                   (R, B, cfg.max_text_len)), jnp.int32)
    msk = jnp.ones((R, B, cfg.max_text_len), jnp.int32)
    labels = jnp.full_like(ids, -100).at[:, :, 2].set(7)
    batches = {"image": img, "text_ids": ids, "text_masks": msk,
               "text_ids_mlm": ids, "text_labels_mlm": labels}

    state, losses = trainer.train_steps_scan(state, batches,
                                             jax.random.PRNGKey(1))
    float(losses[-1])                   # compile + warm, host barrier
    ts = []
    loss = None
    for r in range(reps):
        t0 = time.perf_counter()
        state, losses = trainer.train_steps_scan(state, batches,
                                                 jax.random.PRNGKey(2 + r))
        loss = float(losses[-1])        # fetch ends this chain
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / R

    # reference per-example train FLOPs (fwd components x3 for fwd+bwd):
    # mlm 109.1 + itc (trunk 69.1 + text 3.6) + hard-neg itm 3x109.1
    TRAIN_FLOPS = 3.0 * (109.09e9 + 69.11e9 + 3.57e9 + 3 * 109.09e9)
    train_baseline = 312e12 * 0.12 / TRAIN_FLOPS
    ex_per_s = B / dt
    return {
        "pretrain_ex_per_s_per_chip": round(ex_per_s, 2),
        "pretrain_micro_batch": B,
        "pretrain_scan_steps": R,
        "pretrain_step_ms": round(dt * 1e3, 1),
        "pretrain_loss_finite": bool(np.isfinite(loss)),
        "pretrain_a100_baseline_ex_per_s": round(train_baseline, 2),
        "pretrain_vs_baseline": round(ex_per_s / train_baseline, 3),
    }


def _det_train_bench(batch: int = 2, scan: int = 4, reps: int = 3):
    """Fine-grained (detection) pretrain step throughput at a bucket
    shape, vs the reference's fine-pretrain scale
    (fine_grained/README.md:38-44: global batch 64 on 64 V100s =
    1 img/GPU/step).  See BASELINE.md "detection training baseline" for
    the derivation.

    Timed as the production inner loop, same methodology as the det and
    pretrain sections: `scan` per-step batches pre-staged on device and
    consumed by ONE jit program (DetectionTrainer.train_steps_scan) with
    params/opt in the scan carry, so the relay's per-dispatch marshaling
    of the ~2000-leaf param tree is paid once per chain instead of once
    per step.  Pinned against sequential train_step in
    tests/test_detection_trainer.py.

    Default micro-batch 2: the fwd+bwd detection program's server-side
    first-execution compile grows steeply with B through the relay —
    B=4 exceeded a 25-minute timeout in round 5 while B=2 completes;
    throughput is reported per image so the comparison is unchanged.
    Override with FIBER_BENCH_DET_TRAIN_BATCH / _SCAN / _REMAT."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.detection.detector import DetectorConfig
    from fiber_tpu.train.detection_trainer import DetectionTrainer

    batch = int(os.environ.get("FIBER_BENCH_DET_TRAIN_BATCH", batch))
    scan = int(os.environ.get("FIBER_BENCH_DET_TRAIN_SCAN", scan))
    remat = os.environ.get("FIBER_BENCH_DET_TRAIN_REMAT", "0") != "0"
    cfg = DetectorConfig(image_size=(800, 1344), remat=remat,
                         compute_dtype=jnp.bfloat16)
    trainer = DetectionTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    B = batch
    H, W = cfg.image_size
    L = cfg.max_query_len
    rng = np.random.default_rng(0)
    n_box = 16
    x0 = rng.uniform(0, W - 80, (B, n_box))
    y0 = rng.uniform(0, H - 80, (B, n_box))
    boxes = np.stack([x0, y0, x0 + rng.uniform(16, 64, (B, n_box)),
                      y0 + rng.uniform(16, 64, (B, n_box))], axis=-1)
    pos_map = np.zeros((B, n_box, L), np.float32)
    for b in range(B):
        for g in range(n_box):
            pos_map[b, g, (2 * g + 1) % L] = 1.0
    batch_d = {
        "images": jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5,
                              cfg.compute_dtype),
        "input_ids": jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "gt_boxes": jnp.asarray(boxes, jnp.float32),
        "gt_valid": jnp.ones((B, n_box), bool),
        "positive_map": jnp.asarray(pos_map),
    }

    # `scan` per-step batches, pre-staged (distinct noise per step; the
    # param carry already chains step r+1 on step r so nothing is elided)
    R = scan
    step_noise = jnp.asarray(
        rng.standard_normal((R, 1, 1, 1, 1)) * 0.01, cfg.compute_dtype)
    batches = {k: jnp.broadcast_to(v[None], (R,) + v.shape)
               for k, v in batch_d.items()}
    batches["images"] = batches["images"] + step_noise

    state, losses = trainer.train_steps_scan(state, batches,
                                             jax.random.PRNGKey(1))
    float(losses[-1])                   # compile + warm, host barrier
    t0 = time.perf_counter()
    for r in range(reps):
        state, losses = trainer.train_steps_scan(state, batches,
                                                 jax.random.PRNGKey(2 + r))
    loss = float(losses[-1])             # single fetch ends the chain
    dt = (time.perf_counter() - t0) / (reps * R)

    # BASELINE.md "detection-training baseline": 1 img/V100/step at
    # global batch 64 (fine_grained README.md:37-44), 6% assumed MFU ->
    # 125e12 * 0.06 / 3640e9 = 2.06 img/s per V100.
    det_train_baseline = 2.06
    ex_per_s = B / dt
    return {
        "det_train_ex_per_s_per_chip": round(ex_per_s, 2),
        "det_train_micro_batch": B,
        "det_train_scan_steps": R,
        "det_train_remat": remat,
        "det_train_step_ms": round(dt * 1e3, 1),
        "det_train_loss_finite": bool(np.isfinite(loss)),
        "det_train_v100_baseline_ex_per_s": det_train_baseline,
        "det_train_vs_baseline": round(ex_per_s / det_train_baseline, 3),
    }


SECTIONS = {
    "rerank": _rerank_bench,
    "det": _detection_bench,
    "train": _pretrain_bench,
    "det_train": _det_train_bench,
}


if __name__ == "__main__":
    main()
