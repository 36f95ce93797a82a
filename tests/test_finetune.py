"""Few-shot finetune utilities: tuning masks, X-shot subset, early stop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fiber_tpu.train.finetune import (EarlyStopper, apply_tuning_mode,
                                      trainable_mask, x_shot_subset)


def _toy_params():
    return {
        "backbone": {"layers_0": {"kernel": jnp.ones((2, 2))}},
        "language_backbone": {"layer_0": {"kernel": jnp.ones((2, 2))}},
        "rpn": {"cls_logits": {"kernel": jnp.ones((2, 2))},
                "dot_product_projection_text": {"kernel": jnp.ones((2, 2))},
                "bias_lang": jnp.ones((2,))},
    }


def test_trainable_masks():
    p = _toy_params()
    full = trainable_mask(p, "full")
    assert all(jax.tree_util.tree_leaves(full))
    lin = trainable_mask(p, "linear_prob")
    assert lin["rpn"]["cls_logits"]["kernel"]
    assert not lin["backbone"]["layers_0"]["kernel"]
    assert not lin["language_backbone"]["layer_0"]["kernel"]
    pt = trainable_mask(p, "prompt_tuning")
    assert pt["rpn"]["dot_product_projection_text"]["kernel"]
    assert not pt["rpn"]["cls_logits"]["kernel"]
    lt = trainable_mask(p, "lang_tuning")
    assert lt["language_backbone"]["layer_0"]["kernel"]
    assert not lt["rpn"]["cls_logits"]["kernel"]


def test_apply_tuning_mode_freezes_updates():
    p = _toy_params()
    tx = apply_tuning_mode(optax.sgd(1.0), p, "linear_prob")
    state = tx.init(p)
    grads = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = tx.update(grads, state, p)
    assert float(jnp.abs(updates["backbone"]["layers_0"]["kernel"]).sum()
                 ) == 0.0
    assert float(jnp.abs(updates["rpn"]["cls_logits"]["kernel"]).sum()
                 ) > 0.0


def test_x_shot_subset():
    labels = [[1], [1], [2], [1, 2], [2], []]
    rng = np.random.default_rng(0)
    idx = x_shot_subset(labels, shots=1, rng=rng)
    covered = {c for i in idx for c in labels[i]}
    assert covered == {1, 2}
    idx3 = x_shot_subset(labels, shots=2, rng=rng)
    counts = {}
    for i in idx3:
        for c in labels[i]:
            counts[c] = counts.get(c, 0) + 1
    assert counts[1] >= 2 and counts[2] >= 2


def test_early_stopper():
    es = EarlyStopper(patience=2)
    assert not es.update(0.5)
    assert not es.update(0.6)   # improved
    assert not es.update(0.55)  # bad 1
    assert es.update(0.52)      # bad 2 -> stop
