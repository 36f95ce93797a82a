"""IoU matcher + balanced positive/negative sampler, static-shape.

Behavioral spec: modeling/matcher.py (Matcher with low/high thresholds and
allow_low_quality_matches) and modeling/balanced_positive_negative_sampler.py
(random 256-anchor subsample at fixed positive fraction).  The reference's
dynamic nonzero()/randperm() selections become masks: the matcher is pure
max/argmax algebra over a padded (G, N) quality matrix, and the sampler
draws a fixed-size soft selection by ranking random keys — identical in
expectation, static in shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BELOW_LOW = -1
BETWEEN = -2


def match_quality(quality: jax.Array, gt_valid: jax.Array,
                  high: float, low: float,
                  allow_low_quality: bool = False) -> jax.Array:
    """quality (G, N) padded, gt_valid (G,) -> matches (N,) int32 in
    [0, G) or BELOW_LOW/BETWEEN (ref matcher.py semantics)."""
    q = jnp.where(gt_valid[:, None], quality, -1.0)
    matched_vals = q.max(axis=0)
    all_matches = jnp.argmax(q, axis=0).astype(jnp.int32)

    matches = jnp.where(matched_vals < low, BELOW_LOW, all_matches)
    matches = jnp.where((matched_vals >= low) & (matched_vals < high),
                        BETWEEN, matches)

    if allow_low_quality:
        # per gt: the set of predictions tying its best overlap keeps its
        # raw match (matcher.py:set_low_quality_matches_, incl. ties)
        best_per_gt = q.max(axis=1, keepdims=True)            # (G, 1)
        is_best = (q == best_per_gt) & gt_valid[:, None] & (q > 0)
        restore = is_best.any(axis=0)                          # (N,)
        matches = jnp.where(restore, all_matches, matches)
    return matches


def balanced_sample(pos_mask: jax.Array, neg_mask: jax.Array,
                    rng: jax.Array, num_samples: int,
                    pos_fraction: float
                    ) -> Tuple[jax.Array, jax.Array]:
    """Random fixed-budget subsample (ref
    balanced_positive_negative_sampler.py): up to num_samples*pos_fraction
    positives, remainder negatives.  Returns boolean (N,) masks selected by
    ranking random keys — a static top-k replacement for randperm."""
    n = pos_mask.shape[0]
    n_pos_budget = int(num_samples * pos_fraction)

    k1, k2 = jax.random.split(rng)
    pos_keys = jnp.where(pos_mask, jax.random.uniform(k1, (n,)), -1.0)
    pos_rank = jnp.argsort(-pos_keys)
    pos_sel = jnp.zeros((n,), bool).at[pos_rank[:n_pos_budget]].set(True)
    pos_sel = pos_sel & pos_mask
    n_pos = jnp.minimum(pos_mask.sum(), n_pos_budget)

    neg_keys = jnp.where(neg_mask, jax.random.uniform(k2, (n,)), -1.0)
    neg_rank = jnp.argsort(-neg_keys)
    # take (num_samples - n_pos) negatives: rank index < budget
    neg_budget = num_samples - n_pos
    neg_order = jnp.zeros((n,), jnp.int32).at[neg_rank].set(
        jnp.arange(n, dtype=jnp.int32))
    neg_sel = (neg_order < neg_budget) & neg_mask
    return pos_sel, neg_sel
