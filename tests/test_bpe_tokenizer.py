"""Real byte-level-BPE tokenizer path, fully offline.

Builds a genuine RobertaTokenizerFast from tiny in-test vocab/merges
files (no network) and drives the positive-map construction through it —
exercising the BPE edge cases the WhitespaceTokenizer path never hits:
subword-per-character splits, Ġ space-prefix tokens with trimmed/empty
offsets, and the reference's char_to_token beg+1/beg+2 fallbacks
(modulated_coco.py:630-657)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

transformers = pytest.importorskip("transformers")

from fiber_tpu.data.coco_datasets import (  # noqa: E402
    CocoGroundingDataset, create_positive_map_from_spans)
from fiber_tpu.data.od_to_grounding import build_positive_map  # noqa: E402

# byte-level alphabet subset + merged word tokens
_CHARS = list("abcdefghijklmnopqrstuvwxyz.") + ["Ġ"]
_MERGED = ["do", "dog", "ca", "car", "Ġd", "Ġdo", "Ġdog",
           "Ġc", "Ġca", "Ġcar"]
_MERGES = ["d o", "do g", "c a", "ca r",
           "Ġ d", "Ġd o", "Ġdo g", "Ġ c", "Ġc a", "Ġca r"]


@pytest.fixture(scope="module")
def bpe(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + _CHARS + _MERGED)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(_MERGES)
                                  + "\n")
    return transformers.RobertaTokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt"))


def test_bpe_offsets_and_subwords(bpe):
    cap = "dog. car. person."
    enc = bpe(cap, return_offsets_mapping=True, max_length=32,
              truncation=True)
    toks = bpe.convert_ids_to_tokens(enc["input_ids"])
    assert "dog" in toks            # merged at sentence start
    # merge ranks leave " car" as a standalone "Ġ" + merged "car" —
    # the empty-offset space token is exactly the beg+1 fallback case
    assert "car" in toks
    assert "p" in toks and "n" in toks  # 'person' falls to characters
    # offsets of the merged tokens cover the exact char spans
    om = enc["offset_mapping"]
    i_dog = toks.index("dog")
    assert om[i_dog] == (0, 3)
    i_car = toks.index("car")
    assert om[i_car] == (5, 8)


def test_positive_map_on_real_bpe(bpe):
    cap = "dog. car. person."
    spans = {"dog": (0, 3), "car": (5, 8), "person": (10, 16)}
    enc = bpe(cap, return_offsets_mapping=True, max_length=32,
              truncation=True)
    om = enc["offset_mapping"]
    toks = bpe.convert_ids_to_tokens(enc["input_ids"])

    pm = create_positive_map_from_spans(
        om, [[spans["dog"]], [spans["car"]], [spans["person"]]],
        max_len=32, normalize=False)
    # each row marks at least one token; rows don't bleed into '.' tokens
    for row, name in zip(pm, ("dog", "car", "person")):
        marked = np.nonzero(row)[0]
        assert len(marked) > 0, name
        for ti in marked:
            s, e = om[ti]
            assert s < spans[name][1] and e > spans[name][0], (
                f"{name}: token {toks[ti]} offsets {om[ti]}")
    # 'person' is character-split: its row marks all 6 char tokens
    assert pm[2].sum() == 6

    # matches the direct overlap-based builder
    pm2 = build_positive_map(bpe, cap, list(spans.values()), max_len=32)
    np.testing.assert_array_equal((pm > 0), (pm2 > 0))


def test_char_to_token_fallback_on_space_start(bpe):
    """A span starting at the space char: the space lives in a Ġ token
    whose trimmed offset is empty -> beg+1 fallback must fire."""
    cap = "dog. car."
    enc = bpe(cap, return_offsets_mapping=True, max_length=32,
              truncation=True)
    pm = create_positive_map_from_spans(
        enc["offset_mapping"], [[(4, 8)]], max_len=32, normalize=False)
    assert pm[0].sum() >= 1


def test_grounding_dataset_with_real_bpe(bpe, tmp_path):
    from test_coco_datasets import _write_coco
    img_dir, ann_file = _write_coco(tmp_path)
    ds = CocoGroundingDataset(img_dir, ann_file, tokenizer=bpe,
                              max_query_len=64, num_negatives=1,
                              shuffle_prompt=False)
    rec = ds[0]
    assert rec["input_ids"].shape == (64,)
    assert rec["positive_map"].shape[1] == 64
    # every gt box got at least one positive token under real BPE
    assert (rec["positive_map"].sum(axis=1) > 0).all()
    for l, toks in rec["label_to_token"].items():
        assert len(toks) > 0


def test_get_tokenizer_resolves_bpe_dir(tmp_path):
    """CLI tokenizer plumbing: a bare vocab+merges dir resolves to the
    real BPE; a bogus spec falls back to whitespace with a warning."""
    import warnings

    from fiber_tpu.data.tokenizer import WhitespaceTokenizer, get_tokenizer

    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + _CHARS + _MERGED)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(_MERGES) + "\n")

    tok = get_tokenizer(str(tmp_path))
    enc = tok("a dog", return_offsets_mapping=True)
    assert "dog" in tok.get_vocab() or "Ġdog" in tok.get_vocab()
    assert len(enc["input_ids"]) >= 3  # <s> ... </s>

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fallback = get_tokenizer(str(tmp_path / "missing"))
    assert isinstance(fallback, WhitespaceTokenizer)
    assert any("falling back" in str(x.message) for x in w)
