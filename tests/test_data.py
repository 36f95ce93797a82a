"""Tests for the data layer: MLM masking, OD->grounding prompts,
positive maps, tokenizer, arrow reader, sharded iterator."""

import numpy as np
import pytest

from fiber_tpu.data.arrow_dataset import ShardedBatchIterator
from fiber_tpu.data.mlm import mlm_mask
from fiber_tpu.data.od_to_grounding import (build_detection_prompt,
                                            build_label_to_token_map,
                                            build_positive_map,
                                            check_for_positive_overflow,
                                            chunk_class_names)
from fiber_tpu.data.tokenizer import WhitespaceTokenizer


def test_mlm_mask_properties():
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 100, (64, 32))
    special = np.zeros_like(ids, bool)
    special[:, 0] = True  # BOS never masked
    masked, labels = mlm_mask(ids, special, vocab_size=100,
                              mask_token_id=4, rng=rng)
    assert (labels[:, 0] == -100).all()
    sel = labels != -100
    # roughly 15% selected
    frac = sel.mean()
    assert 0.10 < frac < 0.20, frac
    # ~80% of selected become the mask token
    mask_frac = (masked[sel] == 4).mean()
    assert 0.7 < mask_frac < 0.9
    # unselected positions unchanged
    assert (masked[~sel] == ids[~sel]).all()
    # labels hold original ids at selected positions
    assert (labels[sel] == ids[sel]).all()


def test_detection_prompt_and_positive_map():
    tok = WhitespaceTokenizer()
    names = {1: "person", 2: "dog", 3: "car", 4: "apple"}
    rng = np.random.default_rng(1)
    prompt = build_detection_prompt(names, labels_present=[1, 3],
                                    num_negatives=1, rng=rng,
                                    shuffle=False)
    assert "person" in prompt.caption and "car" in prompt.caption
    # spans map back to the right substring
    for label, (s, e) in prompt.label_spans.items():
        assert prompt.caption[s:e] == names[label]

    l2t = build_label_to_token_map(tok, prompt, max_len=16)
    assert all(len(v) >= 1 for v in l2t.values())
    # token ids for different labels don't overlap
    all_tok = sum(l2t.values(), [])
    assert len(all_tok) == len(set(all_tok))

    # positive map rows: one box of class 1, one of class 3
    spans = [prompt.label_spans[1], prompt.label_spans[3]]
    pm = build_positive_map(tok, prompt.caption, spans, max_len=16)
    assert pm.shape == (2, 16)
    np.testing.assert_array_equal(pm[0].nonzero()[0], l2t[1])
    np.testing.assert_array_equal(pm[1].nonzero()[0], l2t[3])

    assert check_for_positive_overflow(prompt, tok, [1, 3], max_len=16)
    assert not check_for_positive_overflow(prompt, tok, [1, 3], max_len=2)


def test_chunk_class_names():
    names = {i: f"c{i}" for i in range(1, 8)}
    chunks = chunk_class_names(names, 3)
    assert chunks == [[1, 2, 3], [4, 5, 6], [7]]


def test_sharded_iterator_disjoint_and_deterministic():
    its = [ShardedBatchIterator(100, batch_size=5, host_id=h, num_hosts=4,
                                seed=7) for h in range(4)]
    epochs = [it.epoch_indices(0) for it in its]
    all_idx = np.concatenate(epochs)
    assert len(all_idx) == 100
    assert len(set(all_idx.tolist())) == 100  # disjoint cover
    # deterministic
    np.testing.assert_array_equal(its[0].epoch_indices(0),
                                  ShardedBatchIterator(
                                      100, 5, 0, 4, 7).epoch_indices(0))
    # different epochs differ
    assert not np.array_equal(its[0].epoch_indices(0),
                              its[0].epoch_indices(1))


def test_whitespace_tokenizer_batch():
    tok = WhitespaceTokenizer()
    out = tok.batch(["a dog runs", "cat"], max_length=8)
    assert out["input_ids"].shape == (2, 8)
    assert out["attention_mask"][0].sum() == 5  # <s> a dog runs </s>
    assert out["attention_mask"][1].sum() == 3
    assert out["input_ids"][1, -1] == tok.pad_token_id


def test_multitask_iterator_mixes_proportionally():
    from fiber_tpu.data.multitask import MultitaskIterator
    it = MultitaskIterator([900, 100], batch_size=4, seed=0)
    picks = [next(it)[0] for _ in range(200)]
    frac = sum(1 for p in picks if p == 0) / len(picks)
    assert 0.8 < frac < 0.98
    # batches come from the right datasets
    d, idx = next(it)
    assert (idx < (900 if d == 0 else 100)).all()
