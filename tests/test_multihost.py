"""Multihost utilities: single-process fallbacks + a real 2-process CPU
process group (jax.distributed over localhost) exercising the object
gather used for eval merging (ref engine/inference.py:280,
dist_utils.py:84-170)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from fiber_tpu.parallel.multihost import (gather_objects, local_batch_slice,
                                          merge_eval_predictions,
                                          process_allgather)


def test_single_process_fallbacks():
    assert gather_objects({"a": 1}) == [{"a": 1}]
    out = process_allgather(np.arange(6).reshape(2, 3))
    assert out.shape == (1, 2, 3)
    assert local_batch_slice(8) == slice(0, 8)
    merged = merge_eval_predictions({3: "x", 5: "y"})
    assert merged == {3: "x", 5: "y"}


_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=n, process_id=i)
assert jax.process_count() == n, jax.process_count()
from fiber_tpu.parallel.multihost import (gather_objects,
                                          merge_eval_predictions)
objs = gather_objects({"rank": i, "payload": "x" * (10 + 40 * i)})
assert [o["rank"] for o in objs] == list(range(n)), objs
assert len(objs[1]["payload"]) == 50
merged = merge_eval_predictions({i: f"pred{i}"})
assert merged == {0: "pred0", 1: "pred1"}, merged
print(f"proc{i} ok")
"""


@pytest.mark.slow
def test_two_process_cpu_gather(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, "2", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process rendezvous timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} ok" in out
