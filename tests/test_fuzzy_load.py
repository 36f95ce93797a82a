"""Fuzzy multi-format checkpoint loading (ref utils/checkpoint.py +
model_serialization.align_and_update_state_dicts semantics)."""

import numpy as np
import pytest

from fiber_tpu.utils.fuzzy_load import (align_and_update, flatten_params,
                                        load_foreign_state_dict,
                                        load_into_params, unflatten_params)


def _params():
    return {
        "backbone": {
            "layers_0": {
                "blocks_0": {
                    "attn": {
                        "qkv": {"kernel": np.zeros((8, 24), np.float32),
                                "bias": np.zeros((24,), np.float32)},
                        "relative_position_bias_table":
                            np.zeros((25, 2), np.float32),  # window 3
                    },
                    "norm1": {"scale": np.ones((8,), np.float32),
                              "bias": np.zeros((8,), np.float32)},
                },
            },
            "stem": {"kernel": np.zeros((3, 3, 3, 8), np.float32)},
        },
    }


def test_longest_suffix_match_and_layout_adaptation():
    params = _params()
    loaded = {
        # torch Linear (out, in) -> transposed into (in, out)
        "layers.0.blocks.0.attn.qkv.weight":
            np.arange(24 * 8, dtype=np.float32).reshape(24, 8),
        "layers.0.blocks.0.attn.qkv.bias":
            np.arange(24, dtype=np.float32),
        # LayerNorm weight -> scale
        "layers.0.blocks.0.norm1.weight": np.full((8,), 2.0, np.float32),
        "layers.0.blocks.0.norm1.bias": np.full((8,), 3.0, np.float32),
        # conv OIHW -> HWIO
        "stem.weight": np.arange(8 * 3 * 9, dtype=np.float32
                                 ).reshape(8, 3, 3, 3),
    }
    new, report = align_and_update(params, loaded)
    flat = flatten_params(new)
    np.testing.assert_array_equal(
        flat["backbone.layers_0.blocks_0.attn.qkv.kernel"],
        loaded["layers.0.blocks.0.attn.qkv.weight"].T)
    np.testing.assert_array_equal(
        flat["backbone.layers_0.blocks_0.norm1.scale"],
        np.full((8,), 2.0))
    np.testing.assert_array_equal(
        flat["backbone.stem.kernel"],
        loaded["stem.weight"].transpose(2, 3, 1, 0))
    assert len(report["matched"]) == 5
    # bias table had no source: left untouched, reported unmatched
    assert any("relative_position_bias_table" in k
               for k in report["unmatched_model"])


def test_bias_table_resized_on_window_mismatch():
    params = _params()
    loaded = {"layers.0.blocks.0.attn.relative_position_bias_table":
              np.random.default_rng(0).normal(size=(49, 2))  # window 4
              .astype(np.float32)}
    new, report = align_and_update(params, loaded)
    flat = flatten_params(new)
    t = flat["backbone.layers_0.blocks_0.attn.relative_position_bias_table"]
    assert t.shape == (25, 2)
    assert np.abs(t).sum() > 0
    assert len(report["matched"]) == 1


def test_shape_mismatch_skipped_not_crashed():
    params = {"head": {"kernel": np.zeros((4, 4), np.float32)}}
    loaded = {"head.weight": np.zeros((7, 3), np.float32)}
    new, report = align_and_update(params, loaded)
    assert report["skipped_shape"] == ["head.kernel <- head.weight"]
    assert flatten_params(new)["head.kernel"].shape == (4, 4)


def test_roundtrip_flatten_unflatten():
    params = _params()
    assert unflatten_params(flatten_params(params)).keys() == params.keys()


def test_load_c2_pkl_and_npz(tmp_path):
    import pickle
    blobs = {"blobs": {"conv1_w": np.ones((4, 3, 3, 3), np.float32),
                       "conv1_b_momentum": np.zeros(4)}}
    pkl = tmp_path / "model.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(blobs, f)
    sd = load_foreign_state_dict(str(pkl))
    assert "conv1_w" in sd and "conv1_b_momentum" not in sd

    npz = tmp_path / "model.npz"
    np.savez(npz, **{"module.a.weight": np.ones((2, 2))})
    sd = load_foreign_state_dict(str(npz))
    assert list(sd) == ["a.weight"]  # prefix stripped


def test_load_torch_pth(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"state_dict": {"module.fc.weight": torch.ones(3, 2)}}
    p = tmp_path / "model.pth"
    torch.save(sd, p)
    loaded = load_foreign_state_dict(str(p))
    assert loaded["fc.weight"].shape == (3, 2)

    params = {"fc": {"kernel": np.zeros((2, 3), np.float32)}}
    new, report = load_into_params(params, str(p))
    assert flatten_params(new)["fc.kernel"].shape == (2, 3)
    assert report["matched"] == ["fc.kernel <- fc.weight"]


def test_square_torch_weight_is_transposed():
    """A square torch Linear .weight must still be transposed onto a flax
    kernel — shape equality alone is ambiguous (review finding)."""
    params = {"proj": {"kernel": np.zeros((4, 4), np.float32)}}
    w = np.arange(16, dtype=np.float32).reshape(4, 4)
    new, report = align_and_update(params, {"proj.weight": w})
    np.testing.assert_array_equal(flatten_params(new)["proj.kernel"], w.T)
    assert report["matched"] == ["proj.kernel <- proj.weight"]


def test_prefix_strip_leading_only(tmp_path):
    """'module.'/'model.' strip only at the start: mid-key substrings
    like 'submodule' / 'text_model' must survive (review finding)."""
    npz = tmp_path / "m.npz"
    np.savez(npz, **{
        "module.some.submodule.weight": np.ones(2),
        "model.text_model.encoder.weight": np.ones(2),
    })
    from fiber_tpu.utils.fuzzy_load import load_foreign_state_dict
    sd = load_foreign_state_dict(str(npz))
    assert "some.submodule.weight" in sd
    assert "text_model.encoder.weight" in sd
