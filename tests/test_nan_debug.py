"""NaN forensics: injected non-finite batch must dump state, training must
survive (grads zeroed), and the replay helper must localize the bad term.
(ref engine/trainer.py:140-194 dump-on-nan, tools/train_net.py:150-217
replay debugger)"""

import numpy as np

import jax
import jax.numpy as jnp

from fiber_tpu.config import FiberConfig
from fiber_tpu.parallel.mesh import create_mesh
from fiber_tpu.train.trainer import CoarseTrainer
from fiber_tpu.utils.nan_debug import (NanDumper, dump_training_state,
                                       load_training_state, replay)


def _batch(cfg, B, poison=False):
    img = jax.random.normal(jax.random.PRNGKey(0),
                            (B, cfg.image_size, cfg.image_size, 3))
    if poison:
        img = img.at[0, 0, 0, 0].set(jnp.inf)
    ids = jnp.full((B, cfg.max_text_len), 3, jnp.int32)
    return {
        "image": img, "text_ids": ids,
        "text_masks": jnp.ones_like(ids), "text_ids_mlm": ids,
        "text_labels_mlm": jnp.full_like(ids, -100).at[:, 1].set(5),
    }


def test_nan_dump_and_guard(tmp_path):
    cfg = FiberConfig.tiny_test(loss_names=("itm", "mlm"))
    trainer = CoarseTrainer(cfg, mesh=create_mesh())
    state = trainer.init_state(jax.random.PRNGKey(0))
    params_before = jax.tree_util.tree_map(np.asarray, state.params)

    dumper = NanDumper(str(tmp_path))
    batch = _batch(cfg, 4, poison=True)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["total_loss"])
    assert not np.isfinite(loss)
    path = dumper.check(0, loss, batch, state.params, metrics)
    assert path is not None and path.endswith(".npz")

    # guard: params must have moved only by the weight-decay step, i.e.
    # stay finite and close to the previous values
    for before, after in zip(jax.tree_util.tree_leaves(params_before),
                             jax.tree_util.tree_leaves(state.params)):
        a = np.asarray(after)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, np.asarray(before), atol=1e-2)

    # training continues and recovers on a clean batch
    state, metrics = trainer.train_step(state, _batch(cfg, 4),
                                        jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))

    # dump round-trip
    step, loaded_batch, loaded_params, loaded_metrics = \
        load_training_state(path)
    assert step == 0
    assert set(loaded_batch) == set(batch)
    assert not np.isfinite(loaded_batch["image"]).all()
    n_leaves = len(jax.tree_util.tree_leaves(state.params))
    assert len(jax.tree_util.tree_leaves(loaded_params)) == n_leaves

    # replay: fp32 re-evaluation reproduces the non-finite total loss
    def loss_fn(params, b, compute_dtype):
        c = cfg.replace(compute_dtype=compute_dtype)
        t = CoarseTrainer(c)
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        loss, (m, _) = t.loss_fn(params, jb, None, jax.random.PRNGKey(1),
                                 train=False)
        out = dict(m)
        out["total_loss"] = loss
        return out

    report = replay(path, loss_fn, dtypes=("float32",))
    assert report["float32"]["total_loss"][1] is False


def test_nan_dumper_respects_max_dumps(tmp_path):
    dumper = NanDumper(str(tmp_path), max_dumps=1)
    batch = {"x": jnp.ones((2,))}
    params = {"w": jnp.ones((2,))}
    assert dumper.check(0, float("nan"), batch, params) is not None
    assert dumper.check(1, float("nan"), batch, params) is None
    assert dumper.check(2, 1.0, batch, params) is None
