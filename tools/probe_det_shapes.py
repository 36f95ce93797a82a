"""Probe the packed window-attention Pallas kernel at DETECTION stage
shapes (800x1344 input, window 12) on the real chip, one (stage, batch)
per process so a TPU-worker fault convicts exactly one configuration
(round-4 VERDICT item 7: separate "B=8 detection program OOMs HBM" from
"gridded kernel faults at detection stage shapes").

Single-config mode (run inside the probe's own subprocess):
    python tools/probe_det_shapes.py --stage s1 --batch 8
Driver mode (spawns one subprocess per config, prints a table):
    python tools/probe_det_shapes.py
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# detection stage shapes at 800x1344 (pad_to_window=True, window 12):
# grid 200x336 -> stages pad to multiples of 12
SHAPES = {
    "s1": (476, 144, 4, 128),    # 17x28 windows
    "s2": (126, 144, 8, 256),    # 9x14
    "s3": (35, 144, 16, 512),    # 5x7
    "s4": (12, 144, 32, 1024),   # 3x4
}


def run_one(stage: str, batch: int, reps: int = 3,
            check: bool = True) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fiber_tpu.ops import window_attention as wa

    nW, N, h, C = SHAPES[stage]
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((batch, nW, N, 3 * C)) * 0.1,
                      jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nW, h, N, N)) * 0.1,
                       jnp.float32)

    pal = jax.jit(lambda q, b: wa.window_attention_packed_pallas(
        q, b, h).astype(jnp.float32).sum())

    vp = float(pal(qkv, bias))
    print(f"RAN {stage} B={batch}", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(pal(qkv, bias))
        ts.append(time.perf_counter() - t0)
    rel = float("nan")
    if check:
        # the XLA twin materializes (B, nW, ng, G*N, N) fp32 logits in
        # HBM — at s1 B=8 that alone is > 1 GB x several live buffers,
        # so the value check is only run when requested (default: small
        # B) to keep a twin OOM from being misread as a kernel fault
        ref = jax.jit(lambda q, b: wa.window_attention_packed_xla(
            q, b, h).astype(jnp.float32).sum())
        vr = float(ref(qkv, bias))
        rel = abs(vp - vr) / max(abs(vr), 1e-6)
    print(f"OK {stage} B={batch} pallas={min(ts)*1e3:.2f}ms "
          f"rel_err={rel:.2e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--check", action="store_true",
                    help="also value-check against the XLA twin")
    args = ap.parse_args()
    if args.stage:
        b = args.batch or 8
        run_one(args.stage, b, check=args.check or b <= 4)
        return
    for stage in SHAPES:
        for batch in (2, 8):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--stage", stage, "--batch", str(batch)]
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=600)
                line = (p.stdout.strip().splitlines() or ["(no output)"])[-1]
                if p.returncode != 0:
                    err = (p.stderr or "").strip().splitlines()
                    line = f"FAULT rc={p.returncode}: " + \
                        (err[-1][:140] if err else "")
                print(f"{stage} B={batch}: {line}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"{stage} B={batch}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
