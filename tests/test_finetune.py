"""Few-shot finetune utilities: tuning masks, X-shot subset, early stop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fiber_tpu.train.finetune import (EarlyStopper, apply_tuning_mode,
                                      trainable_mask, x_shot_subset)


def _toy_params():
    return {
        "backbone": {"layers_0": {"kernel": jnp.ones((2, 2))},
                     "fpn": {"lateral": {"kernel": jnp.ones((2, 2))}},
                     "tunable_linear": jnp.zeros((4, 2))},
        "language_backbone": {"layer_0": {"kernel": jnp.ones((2, 2))}},
        "rpn": {"cls_logits": {"kernel": jnp.ones((2, 2))},
                "tower": {"conv0": {"kernel": jnp.ones((2, 2))}},
                "dot_product_projection_text": {"kernel": jnp.ones((2, 2))},
                "bias_lang": jnp.ones((2,))},
    }


def test_trainable_masks():
    """The exact tuning_highlevel_override registry
    (ref finetune.py:246-294)."""
    p = _toy_params()
    full = trainable_mask(p, "full")
    assert all(jax.tree_util.tree_leaves(full))

    lin = trainable_mask(p, "linear_prob")
    assert lin["rpn"]["cls_logits"]["kernel"]
    assert not lin["rpn"]["tower"]["conv0"]["kernel"]
    assert not lin["backbone"]["layers_0"]["kernel"]
    assert not lin["backbone"]["fpn"]["lateral"]["kernel"]
    assert not lin["language_backbone"]["layer_0"]["kernel"]

    # v1: only the language backbone trains
    v1 = trainable_mask(p, "language_prompt_v1")
    assert v1["language_backbone"]["layer_0"]["kernel"]
    assert not v1["rpn"]["cls_logits"]["kernel"]
    assert not v1["backbone"]["layers_0"]["kernel"]
    assert not v1["backbone"]["tunable_linear"]

    # v2: only the tunable prompt linear trains
    v2 = trainable_mask(p, "language_prompt_v2")
    assert v2["backbone"]["tunable_linear"]
    assert not v2["language_backbone"]["layer_0"]["kernel"]
    assert not v2["rpn"]["cls_logits"]["kernel"]

    # v3: language backbone + linear probe heads
    v3 = trainable_mask(p, "language_prompt_v3")
    assert v3["language_backbone"]["layer_0"]["kernel"]
    assert v3["rpn"]["cls_logits"]["kernel"]
    assert not v3["rpn"]["tower"]["conv0"]["kernel"]

    # v4: prompt linear + linear probe heads
    v4 = trainable_mask(p, "language_prompt_v4")
    assert v4["backbone"]["tunable_linear"]
    assert v4["rpn"]["cls_logits"]["kernel"]
    assert not v4["language_backbone"]["layer_0"]["kernel"]


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
