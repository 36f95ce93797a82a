"""Tests for the native host library (C++ CIDEr-D + NMS via ctypes)."""

import numpy as np
import pytest

native = pytest.importorskip("fiber_tpu.native")


def test_nms_host_matches_jax_nms():
    rng = np.random.default_rng(0)
    centers = rng.uniform(10, 90, (40, 2))
    sizes = rng.uniform(5, 20, (40, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.random(40).astype(np.float32)
    keep = native.nms_host(boxes, scores, 0.5, max_outputs=40)
    # compare with the jax TPU-path NMS
    import jax.numpy as jnp
    from fiber_tpu.detection.boxes import nms
    jkeep, jok = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40)
    jkept = [int(k) for k, o in zip(jkeep, jok) if bool(o)]
    assert list(keep) == jkept


def test_cider_perfect_match_scores_10():
    refs = {0: [[1, 2, 3, 4, 5, 6]], 1: [[7, 8, 9, 10, 11]]}
    scorer = native.CiderD(refs)
    out = scorer.score({0: [1, 2, 3, 4, 5, 6]})
    # identical caption: per-n cosine = 1 -> score = 10
    assert out[0] == pytest.approx(10.0, abs=1e-6)


def test_cider_orders_quality():
    refs = {
        0: [[1, 2, 3, 4, 5], [1, 2, 3, 4, 6]],
        1: [[20, 21, 22, 23]],
        2: [[30, 31, 32, 33]],
    }
    scorer = native.CiderD(refs)
    good = scorer.score({0: [1, 2, 3, 4, 5]})[0]
    partial = scorer.score({0: [1, 2, 99, 98, 97]})[0]
    unrelated = scorer.score({0: [50, 51, 52, 53, 54]})[0]
    assert good > partial > unrelated
    assert unrelated == pytest.approx(0.0, abs=1e-6)


def test_cider_length_penalty():
    refs = {0: [[1, 2, 3, 4, 5]], 1: [[9, 9, 9]]}
    scorer = native.CiderD(refs)
    exact = scorer.score({0: [1, 2, 3, 4, 5]})[0]
    # same content but repeated (longer) -> penalized
    longer = scorer.score({0: [1, 2, 3, 4, 5] * 4})[0]
    assert longer < exact


def test_cider_batch_scoring():
    refs = {i: [[i, i + 1, i + 2, i + 3]] for i in range(5)}
    scorer = native.CiderD(refs)
    out = scorer.score({i: [i, i + 1, i + 2, i + 3] for i in range(5)})
    for i in range(5):
        assert out[i] == pytest.approx(10.0, abs=1e-6)
