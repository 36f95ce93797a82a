"""Tests for GLIP-style early fusion (VLFuse / MHA-B)."""

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.detection.dyhead import VLDyHead
from fiber_tpu.detection.vlfuse import BiMultiHeadAttention, VLFuse


def test_bi_mha_shapes_and_masking():
    m = BiMultiHeadAttention(v_dim=16, l_dim=8, embed_dim=16, num_heads=2,
                             dropout=0.0)
    rng = jax.random.PRNGKey(0)
    v = jax.random.normal(rng, (2, 10, 16))
    l = jax.random.normal(rng, (2, 5, 8))
    mask = jnp.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    vars_ = m.init(rng, v, l, mask)
    dv, dl = m.apply(vars_, v, l, mask)
    assert dv.shape == (2, 10, 16)
    assert dl.shape == (2, 5, 8)
    # image->text attention must ignore masked text: changing a masked
    # text token must not change the image output
    l2 = l.at[0, 3].set(99.0)
    dv2, _ = m.apply(vars_, v, l2, mask)
    np.testing.assert_allclose(np.asarray(dv[0]), np.asarray(dv2[0]),
                               atol=1e-5)


def test_vlfuse_roundtrip_levels():
    m = VLFuse(v_dim=8, l_dim=8, embed_dim=16, num_heads=2)
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (2, 4, 4, 8)),
             jax.random.normal(rng, (2, 2, 2, 8))]
    lang = {"hidden": jax.random.normal(rng, (2, 6, 8)),
            "masks": jnp.ones((2, 6), jnp.int32)}
    vars_ = m.init(rng, feats, lang)
    outs, new_lang = m.apply(vars_, feats, lang)
    assert [o.shape for o in outs] == [(2, 4, 4, 8), (2, 2, 2, 8)]
    assert new_lang["hidden"].shape == (2, 6, 8)


def test_dyhead_with_early_fuse():
    head = VLDyHead(num_convs=2, in_channels=8, channels=8, num_anchors=1,
                    lang_dim=8, use_deform=False, max_query_len=6,
                    early_fuse="mha-b", num_text_heads=2)
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (1, 4, 4, 8)),
             jax.random.normal(rng, (1, 2, 2, 8)),
             jax.random.normal(rng, (1, 1, 1, 8)),
             jax.random.normal(rng, (1, 1, 1, 8)),
             jax.random.normal(rng, (1, 1, 1, 8))]
    lang = jax.random.normal(rng, (1, 6, 8))
    mask = jnp.ones((1, 6), jnp.int32)
    vars_ = head.init(rng, feats, lang, mask)
    out = head.apply(vars_, feats, lang, mask)
    assert len(out["box_cls"]) == 5
    assert out["dot_product_logits"][0].shape == (1, 16, 6)
    for v in out["dot_product_logits"]:
        assert bool(jnp.isfinite(v).all())


def test_dyhead_lang_layer_dummy_last():
    """The reference appends DummyLayer after the LAST VLFuse unless
    USE_FUSED_FEATURES_DOT_PRODUCT (vldyhead.py:632,658) — so no
    lang_layer params exist for the last conv index."""
    kw = dict(num_convs=2, in_channels=8, channels=8, num_anchors=1,
              lang_dim=8, use_deform=False, max_query_len=6,
              early_fuse="mha-b", num_text_heads=2)
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (1, s, s, 8))
             for s in (8, 4, 2, 1, 1)]
    lang = jax.random.normal(rng, (1, 6, 8))
    mask = jnp.ones((1, 6), jnp.int32)

    v0 = VLDyHead(**kw).init(rng, feats, lang, mask)
    assert "lang_layer_0" in v0["params"]
    assert "lang_layer_1" not in v0["params"]

    v1 = VLDyHead(use_fused_features_dot_product=True, **kw).init(
        rng, feats, lang, mask)
    assert "lang_layer_1" in v1["params"]


def test_dyhead_early_fuse_clip_lang():
    """CLIP lang self-path (ref vldyhead.py:652-654 MODEL_TYPE=='clip')."""
    head = VLDyHead(num_convs=2, in_channels=8, channels=8, num_anchors=1,
                    lang_dim=8, use_deform=False, max_query_len=6,
                    early_fuse="mha-b", num_text_heads=2,
                    lang_model="clip")
    rng = jax.random.PRNGKey(0)
    feats = [jax.random.normal(rng, (1, s, s, 8))
             for s in (8, 4, 2, 1, 1)]
    lang = jax.random.normal(rng, (1, 6, 8))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    vars_ = head.init(rng, feats, lang, mask)
    assert "in_proj" in vars_["params"]["lang_layer_0"]
    out = head.apply(vars_, feats, lang, mask)
    for v in out["dot_product_logits"]:
        assert bool(jnp.isfinite(v).all())


def test_bert_encoder_layer_clamp_parity():
    """Clamped lang layer vs the reference BertEncoderLayer executed
    in-process (vldyhead.py:254-304 + modeling_bert.py:139-146), at a
    scale where the +-50000 score clamp actually binds."""
    import torch
    from reference_loader_det import setup_fine_reference
    setup_fine_reference()
    from transformers import BertConfig

    from maskrcnn_benchmark.modeling.rpn.vldyhead import BertEncoderLayer

    from fiber_tpu.models.roberta import RobertaLayer

    D, H, L, B = 32, 4, 6, 2
    cfg = BertConfig(hidden_size=D, num_attention_heads=H,
                     intermediate_size=D * 4, hidden_act="gelu",
                     attention_probs_dropout_prob=0.0,
                     hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    ref = BertEncoderLayer(cfg, clamp_min_for_underflow=True,
                           clamp_max_for_overflow=True).eval()

    rng = np.random.default_rng(0)
    # huge hidden scale so |scores| > 50000 and the clamp is load-bearing
    hidden = (rng.standard_normal((B, L, D)) * 4000).astype(np.float32)
    mask = np.ones((B, L), np.float32)
    with torch.no_grad():
        ref_out = ref({"visual": [], "lang": {
            "hidden": torch.from_numpy(hidden),
            "masks": torch.from_numpy(mask)}})["lang"]["hidden"].numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}
    def ln(prefix):
        return {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"]}
    params = {
        "attention": {"query": lin("attention.self.query"),
                      "key": lin("attention.self.key"),
                      "value": lin("attention.self.value"),
                      "out_dense": lin("attention.output.dense")},
        "attn_layer_norm": ln("attention.output.LayerNorm"),
        "intermediate_dense": lin("intermediate.dense"),
        "output_dense": lin("output.dense"),
        "output_layer_norm": ln("output.LayerNorm"),
    }
    layer = RobertaLayer(hidden_size=D, num_heads=H,
                         intermediate_size=D * 4, attn_drop=0.0,
                         hidden_drop=0.0, score_clamp=50000.0)
    out = layer.apply({"params": params}, jnp.asarray(hidden))
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)

    # and prove the clamp engaged: without it the output differs
    layer_nc = RobertaLayer(hidden_size=D, num_heads=H,
                            intermediate_size=D * 4, attn_drop=0.0,
                            hidden_drop=0.0, score_clamp=None)
    out_nc = layer_nc.apply({"params": params}, jnp.asarray(hidden))
    assert float(jnp.abs(out - out_nc).max()) > 1e-3
