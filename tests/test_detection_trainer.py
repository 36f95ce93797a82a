"""Detection trainer: schedule math + end-to-end train step."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.detector import DetectorConfig
from fiber_tpu.train.detection_trainer import (DetectionTrainer,
                                               warmup_multistep_schedule)


def test_warmup_multistep_schedule_values():
    s = warmup_multistep_schedule(1.0, 1000, milestones=(0.5, 0.9),
                                  warmup_iters=100, warmup_factor=0.01)
    np.testing.assert_allclose(float(s(0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(50)), 0.01 * 0.5 + 0.5, atol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(499)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(500)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(s(900)), 0.01, atol=1e-6)


def test_detection_train_step_descends():
    cfg = DetectorConfig.tiny_test()
    trainer = DetectionTrainer(cfg, base_lr=1e-3, lang_lr=1e-3,
                               max_iter=100, ema_decay=0.9,
                               warmup_iters=0, clip_norm=1.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    B, T = 2, cfg.max_query_len
    H, W = cfg.image_size
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)),
        "input_ids": jnp.full((B, T), 3, jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "gt_boxes": jnp.array([[[4., 4., 30., 30.], [0.] * 4]] * B),
        "gt_valid": jnp.array([[True, False]] * B),
        "positive_map": jnp.zeros((B, 2, T)).at[:, 0, 1:3].set(1.0),
    }
    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, sub)
        assert float(metrics["finite"]) == 1.0
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    # EMA drifted from init but lags params
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_detection_remat_matches_no_remat():
    """DetectorConfig.remat=True must not change the training math:
    same loss and same grads (up to fp tolerance) as remat=False —
    jax.checkpoint only changes WHEN activations are (re)computed."""
    def loss_of(remat):
        cfg = DetectorConfig.tiny_test(remat=remat, use_deform=True)
        trainer = DetectionTrainer(cfg, base_lr=1e-3, lang_lr=1e-3,
                                   max_iter=100, ema_decay=0.9,
                                   warmup_iters=0, clip_norm=1.0)
        state = trainer.init_state(jax.random.PRNGKey(0))
        B, T = 2, cfg.max_query_len
        H, W = cfg.image_size
        batch = {
            "images": jax.random.normal(jax.random.PRNGKey(1),
                                        (B, H, W, 3)),
            "input_ids": jnp.full((B, T), 3, jnp.int32),
            "attention_mask": jnp.ones((B, T), jnp.int32),
            "gt_boxes": jnp.array([[[4., 4., 30., 30.], [0.] * 4]] * B),
            "gt_valid": jnp.array([[True, False]] * B),
            "positive_map": jnp.zeros((B, 2, T)).at[:, 0, 1:3].set(1.0),
        }
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(2))
        return float(metrics["total_loss"]), state.params

    loss_a, params_a = loss_of(False)
    loss_b, params_b = loss_of(True)
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_detection_train_step_on_8_device_mesh():
    """Data-parallel detection training over the virtual mesh: batch
    sharded on `data`, params replicated, losses finite and identical
    semantics to the single-device step (global-batch mean)."""
    from fiber_tpu.parallel.mesh import create_mesh

    cfg = DetectorConfig.tiny_test()
    mesh = create_mesh()  # all 8 CPU devices on the data axis
    trainer = DetectionTrainer(cfg, base_lr=1e-3, lang_lr=1e-3,
                               max_iter=100, warmup_iters=0,
                               ema_decay=None, mesh=mesh)
    state = trainer.shard_state(trainer.init_state(jax.random.PRNGKey(0)))
    B, T = 8, cfg.max_query_len
    H, W = cfg.image_size
    batch = trainer.shard_batch({
        "images": jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3)),
        "input_ids": jnp.full((B, T), 3, jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "gt_boxes": jnp.array([[[4., 4., 30., 30.], [0.] * 4]] * B),
        "gt_valid": jnp.array([[True, False]] * B),
        "positive_map": jnp.zeros((B, 2, T)).at[:, 0, 1:3].set(1.0),
    })
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert float(metrics["finite"]) == 1.0
    assert np.isfinite(float(metrics["total_loss"]))

    # single-device reference on the same batch: same loss value
    t1 = DetectionTrainer(cfg, base_lr=1e-3, lang_lr=1e-3, max_iter=100,
                          warmup_iters=0, ema_decay=None)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    _, m1 = t1.train_step(s1, {k: np.asarray(v) for k, v in batch.items()},
                          jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-4)
