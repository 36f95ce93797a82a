"""Tests for coarse objectives + ITC queue semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.config import FiberConfig
from fiber_tpu.models.fiber import FiberCoarse
from fiber_tpu.objectives import coarse as obj
from fiber_tpu.parallel.itc_queue import ItcQueue


def test_cross_entropy_ignore():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.array([0, 1, -100])
    loss, acc = obj.cross_entropy_ignore(logits, labels)
    assert loss < 0.01
    assert acc == 1.0


def test_itc_queue_ring_buffer():
    q = ItcQueue.create(jax.random.PRNGKey(0), queue_size=4, hidden_size=2,
                        image_size=4, max_text_len=3,
                        input_dtype=jnp.float32)
    feats = jnp.ones((3, 2))
    img = jnp.ones((3, 4, 4, 3))
    ids = jnp.ones((3, 3), jnp.int32)
    q = q.enqueue(feats, feats, img, ids, ids)
    assert int(q.ptr) == 3 and int(q.total) == 3
    assert int(q.valid_count()) == 3
    # wraparound
    q = q.enqueue(feats * 2, feats * 2, img, ids, ids)
    assert int(q.ptr) == 2  # (3 + 3) % 4
    assert int(q.valid_count()) == 4
    # slots [3, 0, 1] hold value 2; slot 2 holds value 1
    np.testing.assert_array_equal(np.asarray(q.image_feats[2]), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(q.image_feats[3]), [2.0, 2.0])
    np.testing.assert_array_equal(np.asarray(q.image_feats[0]), [2.0, 2.0])


@pytest.fixture(scope="module")
def pretrain_setup():
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm", "itc"))
    model = FiberCoarse(cfg)
    rng = jax.random.PRNGKey(0)
    B = 2
    img = jax.random.normal(rng, (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, dtype=jnp.int32)
    mask = jnp.ones((B, cfg.max_text_len), dtype=jnp.int32)
    variables = model.init(rng, img, ids, mask,
                           method=FiberCoarse.init_full)
    batch = {
        "image": img,
        "text_ids": ids,
        "text_masks": mask,
        "text_ids_mlm": ids.at[:, 2].set(50),  # pretend-masked
        "text_labels_mlm": jnp.where(
            jnp.arange(cfg.max_text_len)[None, :] == 2, 7, -100
        ).astype(jnp.int32).repeat(B, axis=0),
    }
    queue = ItcQueue.create(jax.random.PRNGKey(1), cfg.itc_queue_size,
                            cfg.hidden_size, cfg.image_size,
                            cfg.max_text_len, input_dtype=jnp.float32)
    return cfg, model, variables, batch, queue


def test_pretrain_losses_finite_and_queue_updates(pretrain_setup):
    cfg, model, variables, batch, queue = pretrain_setup
    total, out, new_queue = obj.pretrain_losses(
        model, variables, batch, queue, jax.random.PRNGKey(2),
        cfg.loss_names, train=True)
    assert jnp.isfinite(total)
    for k in ("mlm_loss", "itc_loss", "itm_loss"):
        assert k in out and jnp.isfinite(out[k]), k
    assert int(new_queue.total) == batch["image"].shape[0]


def test_pretrain_losses_grads_flow(pretrain_setup):
    cfg, model, variables, batch, queue = pretrain_setup

    def loss_fn(params):
        total, _, _ = obj.pretrain_losses(
            model, {"params": params}, batch, queue, jax.random.PRNGKey(3),
            cfg.loss_names, train=True)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(jnp.any(g != 0)) for _, g in flat)
    total_leaves = len(flat)
    # the vast majority of parameters must receive gradient
    assert nonzero > total_leaves * 0.8, (nonzero, total_leaves)
    # temperature must be trained by ITC
    assert jnp.any(grads["temp"] != 0)


def test_itc_negatives_not_self(pretrain_setup):
    """Mined hard negatives must never be the positive pair itself."""
    cfg, model, variables, batch, queue = pretrain_setup
    # make queue empty so negatives can only come from the batch
    _, _, negatives = obj.compute_itc(
        model, variables, batch, queue, jax.random.PRNGKey(4), train=False)
    # with B=2 and empty queue (total=0), valid columns = B; the negative
    # for row i must be row 1-i of the batch
    B = batch["image"].shape[0]
    img_negs = np.asarray(negatives["image_neg"])
    for i in range(B):
        assert not np.allclose(img_negs[i],
                               np.asarray(batch["image"][i])), i


def test_itm_hardneg_chunked_matches_monolithic(pretrain_setup):
    """The scan-of-3-forwards path must reproduce the 3B monolithic
    forward exactly when deterministic (batch-independent encoder)."""
    cfg, model, variables, batch, queue = pretrain_setup
    _, _, negatives = obj.compute_itc(
        model, variables, batch, queue, jax.random.PRNGKey(5), train=False)
    mono = obj.compute_itm_hardneg(model, variables, batch, negatives,
                                   train=False, chunk=False)
    chunked = obj.compute_itm_hardneg(model, variables, batch, negatives,
                                      train=False, chunk=True)
    np.testing.assert_allclose(np.asarray(mono["itm_loss"]),
                               np.asarray(chunked["itm_loss"]),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mono["itm_accuracy"]),
                               np.asarray(chunked["itm_accuracy"]),
                               rtol=0, atol=0)


def test_itm_hardneg_chunked_grads_flow(pretrain_setup):
    """Gradients must flow through the scanned hard-neg path in train
    mode (dropout rngs split per group)."""
    cfg, model, variables, batch, queue = pretrain_setup
    _, _, negatives = obj.compute_itc(
        model, variables, batch, queue, jax.random.PRNGKey(6), train=False)

    def loss_fn(params):
        out = obj.compute_itm_hardneg(
            model, {"params": params}, batch, negatives,
            rngs={"dropout": jax.random.PRNGKey(7)}, train=True, chunk=True)
        return out["itm_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    assert jnp.isfinite(loss_fn(variables["params"]))
    assert bool(jnp.any(grads["itm_score"]["fc"]["kernel"] != 0))
