"""Backbone/language zoo: BiFPN, EfficientNet, Swin-v2, RNN encoder
(ref modeling/backbone/{bifpn,efficientnet,swint_v2}.py,
language_backbone/rnn_model.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.models.backbone_zoo import (BiFPN, EfficientNetBackbone,
                                           MBConv)
from fiber_tpu.models.language_zoo import RNNLanguageEncoder
from fiber_tpu.models.swin_v2 import SwinV2Backbone

B = 2


def test_bifpn_shapes_and_grads():
    feats = [jax.random.normal(jax.random.PRNGKey(i), (B, s, s, c))
             for i, (s, c) in enumerate(((16, 48), (8, 96), (4, 192)))]
    fpn = BiFPN(channels=32, repeats=2, in_channels=(48, 96, 192))
    v = fpn.init(jax.random.PRNGKey(9), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape for o in outs] == [
        (B, 16, 16, 32), (B, 8, 8, 32), (B, 4, 4, 32),
        (B, 2, 2, 32), (B, 1, 1, 32)]

    def loss(params):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in fpn.apply({"params": params}, feats))
    g = jax.grad(loss)(v["params"])
    gn = sum(float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    # fusion weights exist per merge node
    assert "p6_w1" in v["params"]["layer0"]


def test_efficientnet_strides():
    model = EfficientNetBackbone(variant="b0")
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), img)
    outs = model.apply(v, img)
    assert [o.shape[1] for o in outs] == [8, 4, 2]     # strides 8/16/32
    assert [o.shape[-1] for o in outs] == [40, 112, 320]  # b0 widths
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_efficientnet_width_scaling():
    from fiber_tpu.models.backbone_zoo import _scale_width
    assert _scale_width(32, 1.0) == 32
    assert _scale_width(32, 1.1) == 32   # standard round_filters behavior
    assert _scale_width(320, 1.2) == 384
    assert _scale_width(40, 1.4) == 56   # b4 stage width


def test_mbconv_residual():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 16))
    blk = MBConv(out_channels=16, stride=1)
    v = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape


def test_swin_v2_backbone():
    model = SwinV2Backbone(image_size=(64, 64), embed_dim=16,
                           depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                           window_size=4, layer_scale=True,
                           use_pallas=False)
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), img)
    outs = model.apply(v, img)
    assert [o.shape for o in outs] == [
        (B, 16, 16, 16), (B, 8, 8, 32), (B, 4, 4, 64), (B, 2, 2, 128)]
    # layer-scale gammas materialized
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    assert any("gamma" in "/".join(str(getattr(p, "key", p))
                                   for p in path)
               for path, _ in flat)


@pytest.mark.parametrize("rnn_type,bidi", [("lstm", True), ("gru", False)])
def test_rnn_language_encoder(rnn_type, bidi):
    ids = jnp.asarray([[5, 8, 9, 2, 0, 0], [4, 7, 0, 0, 0, 0]], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    enc = RNNLanguageEncoder(vocab_size=32, word_embedding_size=16,
                             word_vec_size=16, hidden_size=8,
                             rnn_type=rnn_type, bidirectional=bidi)
    v = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(v, ids, mask)
    D = 16 if bidi else 8
    assert out["hidden"].shape == (2, 6, D)
    assert out["aggregate"].shape == (2, D)
    assert out["final_output"].shape == (2, D)
    assert np.isfinite(np.asarray(out["hidden"])).all()
    # lang-dict contract for VLFuse consumers
    assert set(out) >= {"hidden", "embedded", "aggregate", "masks"}
