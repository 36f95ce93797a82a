"""Tensor-parallel sharding: dp x tp mesh runs the full train step and
matches the dp-only loss."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.config import FiberConfig
from fiber_tpu.parallel.mesh import create_mesh
from fiber_tpu.parallel.tp import shard_params_tp, tp_sharding
from fiber_tpu.train.trainer import CoarseTrainer


def _batch(cfg, B):
    rng = jax.random.PRNGKey(1)
    img = jax.random.normal(rng, (B, cfg.image_size, cfg.image_size, 3))
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32)
    mask = jnp.ones((B, cfg.max_text_len), jnp.int32)
    return {"image": img, "text_ids": ids, "text_masks": mask,
            "text_ids_mlm": ids,
            "text_labels_mlm": jnp.full_like(ids, -100).at[:, 1].set(5)}


def test_tp_specs_shard_large_kernels():
    mesh = create_mesh(jax.devices()[:8], model=4)
    params = {
        "mlp": {"kernel": jnp.ones((512, 512)), "bias": jnp.ones((512,))},
        "emb": {"embedding": jnp.ones((1024, 512))},
        "odd": {"kernel": jnp.ones((512, 510))},  # not divisible by 4
    }
    specs = tp_sharding(params, mesh)
    assert specs["mlp"]["kernel"] == jax.sharding.PartitionSpec(
        None, "model")
    assert specs["mlp"]["bias"] == jax.sharding.PartitionSpec()
    assert specs["emb"]["embedding"] == jax.sharding.PartitionSpec("model")
    assert specs["odd"]["kernel"] == jax.sharding.PartitionSpec()


def test_train_step_dp_times_tp():
    assert jax.device_count() >= 8
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm"))
    B = 8

    # dp-only baseline
    t_dp = CoarseTrainer(cfg, mesh=create_mesh(jax.devices()[:8]))
    s_dp = t_dp.shard_state(t_dp.init_state(jax.random.PRNGKey(0)))
    b_dp = t_dp.shard_batch(_batch(cfg, B))
    s_dp, m_dp = t_dp.train_step(s_dp, b_dp, jax.random.PRNGKey(2))

    # dp x tp (2 x 4)
    mesh = create_mesh(jax.devices()[:8], model=4)
    t_tp = CoarseTrainer(cfg, mesh=mesh)
    state = t_tp.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params=shard_params_tp(state.params, mesh),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec())), state.opt_state),
        step=jax.device_put(state.step, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())))
    b_tp = t_tp.shard_batch(_batch(cfg, B))
    state, m_tp = t_tp.train_step(state, b_tp, jax.random.PRNGKey(2))

    for k in ("itm_loss", "mlm_loss"):
        a, b = float(m_dp[k]), float(m_tp[k])
        assert np.isfinite(a) and np.isfinite(b)
        np.testing.assert_allclose(a, b, rtol=2e-2), k
