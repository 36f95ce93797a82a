"""Tests: alt backbones, TSV reader, catalog, plateau scheduler, LVIS
fixed-AP, profiling utils."""

import base64
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiber_tpu.data.catalog import DatasetCatalog, DatasetSpec
from fiber_tpu.data.tsv import TsvDetectionDataset, TsvFile
from fiber_tpu.detection.evaluation import lvis_fixed_ap
from fiber_tpu.models.alt_backbones import (BertTextEncoder,
                                            ClipTextEncoder,
                                            ResNetBackbone)
from fiber_tpu.train.detection_trainer import WarmupReduceLROnPlateau
from fiber_tpu.utils.profiling import count_params, summarize_model


def test_bert_text_encoder():
    m = BertTextEncoder(vocab_size=50, hidden_size=16, num_layers=2,
                        num_heads=2, max_position_embeddings=16)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids, mask)
    out = m.apply(v, ids, mask)
    assert out.shape == (2, 8, 16)


def test_clip_text_encoder_causal_and_pool():
    m = ClipTextEncoder(vocab_size=50, width=16, num_layers=2, num_heads=2,
                        context_length=16)
    ids = jnp.array([[1, 5, 49, 0, 0, 0, 0, 0]])  # 49 = EOT (max id)
    v = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(v, ids)
    assert out["hidden"].shape == (1, 8, 16)
    assert out["aggregate"].shape == (1, 16)
    # causality: changing a future token must not change earlier hidden
    out2 = m.apply(v, ids.at[0, 5].set(7))
    np.testing.assert_allclose(np.asarray(out["hidden"][0, :5]),
                               np.asarray(out2["hidden"][0, :5]),
                               atol=1e-5)


def test_resnet_backbone_taps():
    m = ResNetBackbone(layers=(1, 1, 1, 1))
    x = jnp.ones((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
        (1, 2, 2, 2048)]


def test_tsv_dataset(tmp_path):
    from PIL import Image
    img = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    rows = []
    for i in range(3):
        label = json.dumps([{"rect": [0, 0, 2, 2], "class": i}])
        rows.append(f"img{i}\t{label}\t{b64}")
    p = str(tmp_path / "data.tsv")
    with open(p, "w") as f:
        f.write("\n".join(rows) + "\n")
    ds = TsvDetectionDataset(p)
    assert len(ds) == 3
    rec = ds[1]
    assert rec["key"] == "img1"
    assert rec["labels"] == [1]
    assert rec["image"].size == (4, 4)
    # lineidx file created for O(1) reopen
    assert os.path.exists(str(tmp_path / "data.lineidx"))


def test_catalog():
    assert "coco_2017_val" in DatasetCatalog.names()
    spec = DatasetCatalog.get("coco_2017_val")
    assert spec.factory == "coco_json"
    DatasetCatalog.set("custom_odinw", DatasetSpec(
        factory="coco_json", args={"ann_file": "x.json"},
        task="detection"))
    assert DatasetCatalog.get("custom_odinw").task == "detection"
    with pytest.raises(KeyError):
        DatasetCatalog.get("nope")


def test_plateau_scheduler():
    s = WarmupReduceLROnPlateau(patience=2, gamma=0.1)
    assert s.step(0.5) == 1.0
    assert s.step(0.6) == 1.0     # improved
    assert s.step(0.55) == 1.0    # bad 1
    assert s.step(0.50) == pytest.approx(0.1)  # bad 2 -> decay
    assert s.step(0.7) == pytest.approx(0.1)   # improved, keeps scale


def test_lvis_fixed_ap():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([1])},
           {"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([2])}]
    preds = [{"boxes": np.array([[0, 0, 10, 10]]),
              "scores": np.array([0.9]), "labels": np.array([1])},
             {"boxes": np.array([[0, 0, 10, 10]]),
              "scores": np.array([0.8]), "labels": np.array([2])}]
    out = lvis_fixed_ap(preds, gts,
                        class_groups={1: "r", 2: "f"})
    assert out["fixed_mAP"] == pytest.approx(1.0)
    assert out["fixed_mAP_r"] == pytest.approx(1.0)
    assert np.isnan(out["fixed_mAP_c"])


def test_profiling_utils():
    params = {"a": jnp.ones((3, 4)), "b": jnp.ones((5,))}
    assert count_params(params) == 17
    info = summarize_model(lambda p, x: (p["a"] * 0).sum() + x.sum(),
                           params, jnp.ones((2, 2)))
    assert info["params"] == 17
