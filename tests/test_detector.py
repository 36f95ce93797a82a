"""End-to-end tests of the grounding detector (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.detection.detector import (DetectorConfig, GroundingDetector,
                                          detection_inference,
                                          detection_loss, detector_anchors)
from fiber_tpu.detection.postprocess import label_to_token_matrix


@pytest.fixture(scope="module")
def det_setup():
    cfg = DetectorConfig.tiny_test()
    model = GroundingDetector(cfg)
    B, T = 2, cfg.max_query_len
    H, W = cfg.image_size
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    ids = jnp.full((B, T), 3, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    variables = model.init(rng, images, ids, mask)
    batch = {
        "images": images, "input_ids": ids, "attention_mask": mask,
        "gt_boxes": jnp.array([[[4., 4., 30., 30.], [0.] * 4],
                               [[10., 10., 50., 50.], [0.] * 4]]),
        "gt_valid": jnp.array([[True, False], [True, False]]),
        "positive_map": jnp.zeros((B, 2, T)).at[:, 0, 1:3].set(1.0),
        "image_sizes": jnp.array([[H, W], [H, W]], jnp.float32),
    }
    return cfg, model, variables, batch


def test_head_output_shapes(det_setup):
    cfg, model, variables, batch = det_setup
    out = model.apply(variables, batch["images"], batch["input_ids"],
                      batch["attention_mask"])
    head = out["head_out"]
    assert len(head["box_cls"]) == 5
    _, sizes, per_level = detector_anchors(cfg)
    for lvl, (h, w) in enumerate(cfg.feat_sizes()):
        assert head["box_cls"][lvl].shape == (2, h, w, 1)
        assert head["bbox_reg"][lvl].shape == (2, h, w, 4)
        assert head["dot_product_logits"][lvl].shape == (
            2, h * w, cfg.max_query_len)
        assert per_level[lvl].shape == (h * w, 4)
    assert out["lang"]["embedded"].shape == (2, cfg.max_query_len,
                                             cfg.lang_dim)


def test_detection_loss_finite_and_differentiable(det_setup):
    cfg, model, variables, batch = det_setup
    losses = detection_loss(model, variables, batch, train=False)
    for k, v in losses.items():
        assert jnp.isfinite(v), k
    assert float(losses["loss_dot_product_token"]) > 0

    def f(params):
        return detection_loss(model, {"params": params}, batch,
                              train=False)["total_loss"]

    g = jax.grad(f)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    nonzero = sum(bool(jnp.any(l != 0)) for l in leaves)
    assert nonzero > len(leaves) * 0.5


def test_detection_inference_shapes(det_setup):
    cfg, model, variables, batch = det_setup
    agg = jnp.asarray(label_to_token_matrix({1: [1, 2], 2: [4]},
                                            num_classes=2,
                                            num_tokens=cfg.max_query_len))
    dets = detection_inference(model, variables, batch, agg,
                               pre_nms_top_n=50, post_nms_top_n=10)
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.scores.shape == (2, 10)
    assert dets.labels.shape == (2, 10)
    # scores sorted descending among valid
    s = np.asarray(jnp.where(dets.valid, dets.scores, -1.0))
    for b in range(2):
        vs = s[b][s[b] >= 0]
        assert (np.diff(vs) <= 1e-6).all()
