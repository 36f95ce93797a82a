"""End-to-end train-step tests, single-device and on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.config import FiberConfig
from fiber_tpu.parallel.mesh import create_mesh
from fiber_tpu.train.optim import param_group, summarize_groups
from fiber_tpu.train.trainer import CoarseTrainer


def _make_batch(cfg, B, seed=0):
    rng = jax.random.PRNGKey(seed)
    img = jax.random.normal(rng, (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((B, cfg.max_text_len), dtype=jnp.int32)
    return {
        "image": img, "text_ids": ids, "text_masks": mask,
        "text_ids_mlm": ids,
        "text_labels_mlm": jnp.full_like(ids, -100).at[:, 1].set(5),
    }


def test_param_groups():
    path = lambda s: tuple(type("K", (), {"key": p})() for p in s.split("/"))
    assert param_group(path("vit_model/layers_0/blocks_0/attn/qkv/kernel"),
                       None) == "base_decay"
    assert param_group(path("vit_model/layers_0/blocks_0/norm1/scale"),
                       None) == "base_nodecay"
    assert param_group(path("vit_model/layers_3/blocks_0/attn/qkv_i2t/"
                            "kernel"), None) == "cross_decay"
    assert param_group(path("text_transformer/layer_7/crossattention_t2i/"
                            "query/bias"), None) == "cross_nodecay"
    assert param_group(path("mlm_score/decoder/kernel"), None) == "head_decay"
    assert param_group(path("cross_modal_text_transform/kernel"),
                       None) == "cross_decay"
    assert param_group(path("temp"), None) == "base_decay"


def test_train_step_runs_and_descends():
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc"))
    trainer = CoarseTrainer(cfg, mesh=create_mesh())
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.shard_state(state)
    batch = trainer.shard_batch(_make_batch(cfg, 8))

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # same batch repeatedly -> loss must drop
    assert losses[-1] < losses[0], losses
    # queue advanced 3 global batches
    assert int(state.queue.total) == 24


def test_train_steps_scan_matches_sequential():
    """train_steps_scan (R monolithic steps in one program) must land on
    the same final params as R sequential train_step calls when fed the
    same per-step batches and rng sequence."""
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc"))
    trainer = CoarseTrainer(cfg)
    R, B = 3, 4
    batches = [_make_batch(cfg, B, seed=s) for s in range(R)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *batches)

    rng = jax.random.PRNGKey(7)
    state_a = trainer.init_state(jax.random.PRNGKey(0))
    r = rng
    for i in range(R):
        r, sub = jax.random.split(r)
        state_a, _ = trainer.train_step(state_a, batches[i], sub)

    state_b = trainer.init_state(jax.random.PRNGKey(0))
    state_b, losses = trainer.train_steps_scan(state_b, stacked, rng)

    assert int(state_b.step) == R
    assert losses.shape == (R,)
    assert bool(jnp.all(jnp.isfinite(losses)))
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(state_b.queue.total) == int(state_a.queue.total)


def test_train_step_accum_matches_sequential():
    """Carry-accumulated grads must equal the explicit per-microbatch
    mean (same rng/queue threading), at 1/n_micro the peak grad memory."""
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc"))
    trainer = CoarseTrainer(cfg, mesh=create_mesh())
    state = trainer.init_state(jax.random.PRNGKey(0))

    micros = [_make_batch(cfg, 4, seed=s) for s in (10, 11, 12)]
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *micros)
    rng = jax.random.PRNGKey(5)

    # expected: explicit sequential loop with identical rng/queue threading
    grad_fn = jax.value_and_grad(trainer.loss_fn, has_aux=True)
    queue, r = state.queue, rng
    gsum = None
    loss_sum = 0.0
    for m in micros:
        r, sub = jax.random.split(r)
        (loss, (_, queue)), g = grad_fn(state.params, m, queue, sub, True)
        loss_sum += float(loss)
        gsum = g if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, g)
    grads = jax.tree_util.tree_map(lambda g: g / len(micros), gsum)
    updates, _ = trainer._tx.update(grads, state.opt_state, state.params)
    import optax
    expected_params = optax.apply_updates(state.params, updates)

    new_state, metrics = trainer.train_step_accum(state, batches, rng)
    assert int(new_state.queue.total) == 12
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               loss_sum / len(micros), rtol=1e-5)
    flat_got = jax.tree_util.tree_leaves(new_state.params)
    flat_exp = jax.tree_util.tree_leaves(expected_params)
    for got, exp in zip(flat_got, flat_exp):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-6, rtol=1e-5)


def test_train_step_multidevice_matches_queue_semantics():
    """On an 8-device mesh, the queue must receive the *global* batch."""
    assert jax.device_count() >= 8, "conftest must set 8 CPU devices"
    cfg = FiberConfig.tiny_test(loss_names=("itc",))
    trainer = CoarseTrainer(cfg, mesh=create_mesh(jax.devices()[:8]))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = trainer.shard_state(state)
    batch = trainer.shard_batch(_make_batch(cfg, 8))
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert jnp.isfinite(metrics["itc_loss"])
    assert int(state.queue.total) == 8
    assert int(state.queue.ptr) == 8 % cfg.itc_queue_size


def test_split_step_matches_monolithic():
    """train_step_split (three separately-compiled programs, the
    workaround for the relay compile-helper limit at micro-batch >= 8)
    must reproduce the monolithic train_step exactly when the model is
    deterministic: same rng sequence -> same mined negatives -> same
    losses, params, and queue."""
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc"))
    t1 = CoarseTrainer(cfg)
    t2 = CoarseTrainer(cfg)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s2 = t2.init_state(jax.random.PRNGKey(0))
    batch = _make_batch(cfg, 4)
    rng = jax.random.PRNGKey(5)

    s1, m1 = t1.train_step(s1, batch, rng)
    s2, m2 = t2.train_step_split(s2, batch, rng)

    for k in ("itm_loss", "itc_loss", "mlm_loss", "total_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-5,
                                   err_msg=k)
    # queue state identical (enqueue order + contents)
    np.testing.assert_allclose(np.asarray(s1.queue.image_feats),
                               np.asarray(s2.queue.image_feats),
                               atol=1e-6)
    assert int(s1.queue.ptr) == int(s2.queue.ptr)
    # parameters after the optimizer step match
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
