"""Numerical parity vs the reference torch modules (loaded in-process).

These tests execute the actual reference implementations
(coarse_grained/fiber/modules/{swin_transformer,roberta,heads}.py) on CPU
torch, convert their random-initialized state_dicts through our
checkpoint converter, and assert our flax forward matches within fp32
tolerance.  This validates both the model semantics and the converter
(the exact path released FIBER checkpoints will take).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fiber_tpu.models.roberta import (RobertaEncoderModel,  # noqa: E402
                                      extended_attention_mask)
from fiber_tpu.models.swin import SwinTransformer  # noqa: E402
from fiber_tpu.utils.checkpoint_convert import (  # noqa: E402
    convert_roberta_key, convert_swin_key, merge_into)
from reference_loader import load_reference_modules  # noqa: E402

ATOL = 2e-4

# tiny-but-structurally-real dims: full (2,2,18,2) depths so the
# reference's hardcoded stage-3 gating (i < 20 - NUM_FUSE_BLOCK,
# swin_transformer.py:502) is exercised
IMG = 64          # -> window = img/32 = 2 (ref swin_transformer.py:575)
EMBED = 8         # stage dims 8/16/32/64
HEADS = (1, 2, 4, 8)
DEPTHS = (2, 2, 18, 2)
TEXT_HIDDEN = 32
TEXT_HEADS = 2
TEXT_LAYERS = 12
NUM_FUSE = 6
MAX_LEN = 12
DIM_IMG = 64      # stage-4 dim; stage-3 dim = DIM_IMG/2


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_modules()


@pytest.fixture(scope="module")
def ref_swin(ref_mods):
    swin_mod, _, _ = ref_mods
    swin_mod.DIM_TEXT = TEXT_HIDDEN
    swin_mod.NUM_FUSE_BLOCK = NUM_FUSE
    torch.manual_seed(0)
    m = swin_mod.SwinTransformer(
        img_size=IMG, patch_size=4, in_chans=3, num_classes=0,
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def ref_roberta(ref_mods):
    _, rob_mod, _ = ref_mods
    from transformers.models.roberta.configuration_roberta import \
        RobertaConfig
    rob_mod.NUM_FUSE_BLOCK = NUM_FUSE
    rob_mod.DIM_IMG = DIM_IMG
    cfg = RobertaConfig(
        vocab_size=99, hidden_size=TEXT_HIDDEN,
        num_hidden_layers=TEXT_LAYERS, num_attention_heads=TEXT_HEADS,
        intermediate_size=TEXT_HIDDEN * 4, max_position_embeddings=64,
        pad_token_id=1, type_vocab_size=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5)
    torch.manual_seed(1)
    m = rob_mod.RobertaModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


def _swin_params_from_ref(ref_model):
    dst = {}
    unmapped = []
    for k, v in ref_model.state_dict().items():
        vnp = v.detach().numpy()
        if "relative_position_index" in k or k.endswith("attn_mask"):
            continue
        if not convert_swin_key(k, vnp, dst, IMG // 32, IMG // 32):
            unmapped.append(k)
    assert not unmapped, unmapped
    return dst


def _roberta_params_from_ref(ref_model):
    dst = {}
    unmapped = []
    for k, v in ref_model.state_dict().items():
        vnp = v.detach().numpy()
        if ("position_ids" in k or "pooler" in k
                or "crossattention_t2i.output.LayerNorm" in k):
            continue
        # unfused layers declare alpha_t2i but never use it
        import re
        m = re.match(r"encoder\.layer\.(\d+)\.alpha_t2i", k)
        if m and int(m.group(1)) < TEXT_LAYERS - NUM_FUSE:
            continue
        if not convert_roberta_key(k, vnp, dst):
            unmapped.append(k)
    assert not unmapped, unmapped
    return dst


def _my_swin():
    return SwinTransformer(
        image_size=IMG, patch_size=4, embed_dim=EMBED, depths=DEPTHS,
        num_heads=HEADS, drop_path_rate=0.0, num_fuse_block=NUM_FUSE)


def _my_roberta():
    return RobertaEncoderModel(
        vocab_size=99, hidden_size=TEXT_HIDDEN, num_layers=TEXT_LAYERS,
        num_heads=TEXT_HEADS, intermediate_size=TEXT_HIDDEN * 4,
        max_position_embeddings=64, num_fuse_block=NUM_FUSE,
        attn_drop=0.0, hidden_drop=0.0)


def test_swin_unfused_parity(ref_swin):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_swin(torch.from_numpy(img).permute(0, 3, 1, 2))
    ref_out = ref_out.numpy()  # (B, L, C) after final norm

    model = _my_swin()
    # init with text so the fusion params materialize (they exist in the
    # reference state_dict even on the unfused forward path)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img),
        jnp.zeros((2, MAX_LEN, TEXT_HIDDEN)), jnp.zeros((2, MAX_LEN)))
    params = merge_into(variables["params"], _swin_params_from_ref(ref_swin))
    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL)


def test_swin_fused_stepwise_parity(ref_swin):
    """Drive stage-3/4 blocks with text the way fiber_module.infer does
    (fiber_module.py:310-347) on both sides."""
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    text = rng.standard_normal((2, MAX_LEN, TEXT_HIDDEN)).astype(np.float32)
    mask = np.ones((2, MAX_LEN), np.float32)
    mask[:, -3:] = 0.0
    bias = (1.0 - mask) * -10000.0

    # ---- reference side
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    ttext = torch.from_numpy(text)
    tbias = torch.from_numpy(bias)[:, None, None, :]
    with torch.no_grad():
        x = ref_swin.patch_embed(timg)
        for layer in ref_swin.layers[:2]:
            x = layer(x)
        for bi, blk in enumerate(ref_swin.layers[2].blocks):
            if bi < 14:
                x = blk(x)
            else:
                x = blk(x, ttext, tbias)
        x = ref_swin.layers[2].downsample(x)
        for blk in ref_swin.layers[3].blocks:
            x = blk(x, ttext, tbias)
    ref_out = x.numpy()  # (B, L, C4) pre-norm

    # ---- our side
    model = _my_swin()
    jimg = jnp.asarray(img)
    jtext = jnp.asarray(text)
    jbias = jnp.asarray((1.0 - mask) * -10000.0)
    variables = model.init(jax.random.PRNGKey(0), jimg, jtext,
                           jnp.zeros((2, MAX_LEN)))
    params = merge_into(variables["params"], _swin_params_from_ref(ref_swin))

    def fwd(mdl):
        x = mdl.embed(jimg)
        for s in range(2):
            x = mdl.stages[s](x)
        for bi, blk in enumerate(mdl.stages[2].blocks):
            if bi < 14:
                x = blk(x)
            else:
                x = blk(x, text=jtext, text_bias=jbias)
        x = mdl.stages[2].downsample(x)
        for blk in mdl.stages[3].blocks:
            x = blk(x, text=jtext, text_bias=jbias)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)

    out = jax.eval_shape  # placeholder to appease linters
    out = model.apply({"params": params}, method=fwd)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL)


def test_full_fused_infer_parity(ref_mods, ref_swin, ref_roberta):
    """The complete FiberCoarse.infer (interleave + transforms + poolers +
    ITM/MLM heads) vs the reference call protocol (fiber_module.py:310-367),
    through convert_fiber_state_dict — the exact path a released FIBER
    checkpoint takes."""
    _, _, heads_mod = ref_mods
    from transformers.models.roberta.configuration_roberta import \
        RobertaConfig
    from fiber_tpu.config import FiberConfig
    from fiber_tpu.models.fiber import FiberCoarse
    from fiber_tpu.utils.checkpoint_convert import convert_fiber_state_dict

    hs = TEXT_HIDDEN
    torch.manual_seed(5)
    # reference-side head modules (names mirror fiber_module.__init__)
    t_text_tr = torch.nn.Linear(hs, hs)
    t_img_tr = torch.nn.Linear(DIM_IMG, hs)
    t_text_pool = heads_mod.Pooler(hs)
    t_img_pool = heads_mod.Pooler(hs)
    t_itm = heads_mod.ITMHead(hs * 2)
    bert_cfg = RobertaConfig(vocab_size=99, hidden_size=hs,
                             layer_norm_eps=1e-5)
    t_mlm = heads_mod.MLMHead(bert_cfg)
    for m in (t_text_tr, t_img_tr, t_text_pool, t_img_pool, t_itm, t_mlm):
        m.eval()
    # non-zero gates everywhere so fusion is exercised
    with torch.no_grad():
        for i in range(TEXT_LAYERS - NUM_FUSE, TEXT_LAYERS):
            ref_roberta.encoder.layer[i].alpha_t2i.fill_(0.25)
        for blk in list(ref_swin.layers[2].blocks[14:]) + \
                list(ref_swin.layers[3].blocks):
            blk.attn.alpha_i2t.fill_(0.25)

    rng = np.random.default_rng(6)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ids = rng.integers(4, 99, (2, MAX_LEN)).astype(np.int64)
    ids[:, -2:] = 1
    mask = (ids != 1).astype(np.int64)

    # ---- reference protocol (fiber_module.infer)
    with torch.no_grad():
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tids = torch.from_numpy(ids)
        tmask = torch.from_numpy(mask)
        x = ref_swin.patch_embed(timg)
        for layer in ref_swin.layers[:2]:
            x = layer(x)
        text = ref_roberta.embeddings(input_ids=tids)
        ext = ref_roberta.get_extended_attention_mask(
            tmask, tmask.shape, tids.device)
        for i in range(TEXT_LAYERS - NUM_FUSE):
            text = ref_roberta.encoder.layer[i](text, ext)[0]
        for bi, blk in enumerate(ref_swin.layers[2].blocks):
            if bi < 14:
                x = blk(x)
            else:
                fused = blk(x, text, ext)
                text = ref_roberta.encoder.layer[bi - 8](
                    text, ext, encoder_hidden_states=x)[0]
                x = fused
        x = ref_swin.layers[2].downsample(x)
        for bi, blk in enumerate(ref_swin.layers[3].blocks):
            fused = blk(x, text, ext)
            text = ref_roberta.encoder.layer[bi + 10](
                text, ext, encoder_hidden_states=x,
                last_norm=(bi == 0))[0]
            x = fused
        text_feats = t_text_tr(text)
        image_feats = t_img_tr(x)
        cls_text = t_text_pool(text_feats)
        avg_img = image_feats.mean(dim=1, keepdim=True)
        cls_img = t_img_pool(avg_img)
        cls = torch.cat([cls_text, cls_img], dim=-1)
        ref_itm = t_itm(cls).numpy()
        ref_mlm = t_mlm(text_feats).numpy()

    # ---- assemble a reference-layout state_dict and convert
    sd = {}
    for k, v in ref_swin.state_dict().items():
        sd[f"vit_model.{k}"] = v.numpy()
    for k, v in ref_roberta.state_dict().items():
        sd[f"text_transformer.{k}"] = v.numpy()
    for prefix, mod in [("cross_modal_text_transform", t_text_tr),
                        ("cross_modal_image_transform", t_img_tr),
                        ("cross_modal_text_pooler", t_text_pool),
                        ("cross_modal_image_pooler", t_img_pool),
                        ("itm_score", t_itm), ("mlm_score", t_mlm)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()
    converted, unmapped = convert_fiber_state_dict(sd, IMG, IMG)
    # only the unused-in-forward keys may remain unmapped
    allowed = ("alpha_t2i",)  # unfused layers' dead gates
    assert all(any(a in u for a in allowed) for u in unmapped), unmapped

    cfg = FiberConfig(
        image_size=IMG, patch_size=4, swin_embed_dim=EMBED,
        swin_depths=DEPTHS, swin_num_heads=HEADS, swin_drop_path_rate=0.0,
        input_image_embed_size=DIM_IMG, vocab_size=99,
        text_hidden_size=hs, num_text_layers=TEXT_LAYERS,
        num_text_heads=TEXT_HEADS, max_text_len=MAX_LEN,
        max_position_embeddings=64, hidden_size=hs,
        input_text_embed_size=hs, num_fuse_block=NUM_FUSE, drop_rate=0.0,
        loss_names=("itm", "mlm"), compute_dtype=jnp.float32)
    model = FiberCoarse(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(ids), jnp.asarray(mask),
                           method=FiberCoarse.init_full)
    # drop converted keys our itm-config model doesn't have (rank_output
    # is initialized from itm weights at conversion time in the reference)
    params = merge_into(variables["params"], converted)
    out = model.apply({"params": params}, jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out["itm"]), ref_itm, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["mlm"]), ref_mlm,
                               atol=5e-4)


def test_roberta_text_only_parity(ref_roberta):
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 99, (2, MAX_LEN)).astype(np.int64)
    ids[:, -2:] = 1  # padding
    mask = (ids != 1).astype(np.int64)

    with torch.no_grad():
        tids = torch.from_numpy(ids)
        tmask = torch.from_numpy(mask)
        emb = ref_roberta.embeddings(input_ids=tids)
        ext = ref_roberta.get_extended_attention_mask(
            tmask, tmask.shape, tids.device)
        h = emb
        for layer in ref_roberta.encoder.layer:
            h = layer(h, ext)[0]
    ref_out = h.numpy()

    model = _my_roberta()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
        jnp.zeros((2, 4, DIM_IMG // 2)), jnp.zeros((2, 4, DIM_IMG)),
        method=RobertaEncoderModel.init_full)
    params = merge_into(variables["params"],
                        _roberta_params_from_ref(ref_roberta))
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL)


def test_roberta_fused_layer_parity(ref_roberta):
    """Cross-attention layer with image K/V + alpha gate + last_norm
    deferral (roberta.py:427-505)."""
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 99, (2, MAX_LEN)).astype(np.int64)
    mask = np.ones((2, MAX_LEN), np.int64)
    img_small = rng.standard_normal((2, 4, DIM_IMG // 2)).astype(np.float32)
    img_large = rng.standard_normal((2, 4, DIM_IMG)).astype(np.float32)

    # make the gates non-zero so the cross path actually matters
    with torch.no_grad():
        for i in range(TEXT_LAYERS - NUM_FUSE, TEXT_LAYERS):
            ref_roberta.encoder.layer[i].alpha_t2i.fill_(0.37)

    with torch.no_grad():
        tids = torch.from_numpy(ids)
        tmask = torch.from_numpy(mask)
        ext = ref_roberta.get_extended_attention_mask(
            tmask, tmask.shape, tids.device)
        h = ref_roberta.embeddings(input_ids=tids)
        for i, layer in enumerate(ref_roberta.encoder.layer):
            if i < TEXT_LAYERS - NUM_FUSE:
                h = layer(h, ext)[0]
            elif i < 10:
                h = layer(h, ext, encoder_hidden_states=torch.from_numpy(
                    img_small))[0]
            else:
                h = layer(h, ext,
                          encoder_hidden_states=torch.from_numpy(img_large),
                          last_norm=(i != TEXT_LAYERS - 1))[0]
    ref_out = h.numpy()

    model = _my_roberta()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(img_small), jnp.asarray(img_large),
        method=RobertaEncoderModel.init_full)
    params = merge_into(variables["params"],
                        _roberta_params_from_ref(ref_roberta))

    def fwd(mdl):
        x = mdl.embeddings(jnp.asarray(ids))
        ext_mask = extended_attention_mask(jnp.asarray(mask))
        for i, layer in enumerate(mdl.layers):
            if i < TEXT_LAYERS - NUM_FUSE:
                x = layer(x, attn_mask=ext_mask)
            elif i < 10:
                x = layer(x, attn_mask=ext_mask,
                          image_feats=jnp.asarray(img_small))
            else:
                x = layer(x, attn_mask=ext_mask,
                          image_feats=jnp.asarray(img_large),
                          last_norm=(i != TEXT_LAYERS - 1))
        return x

    out = model.apply({"params": params}, method=fwd)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL)
