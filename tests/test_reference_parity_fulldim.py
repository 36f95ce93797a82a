"""FIBER-Base full-dimension parity vs the in-process reference modules.

The round-1 suite pinned semantics at toy dims (embed 8 / hidden 32);
these tests run the real FIBER-Base geometry — Swin-B (embed 128, depths
(2,2,18,2), heads (4,8,16,32)) at 384^2 with window 12, RoBERTa-Base
width (768, 12 layers, 12 heads) — through the same converter path a
released checkpoint takes, asserting the BASELINE.json tolerance (1e-3).
Also pins the RPB re-interpolation used on resolution change
(ref swin_helpers.py:20-44, 384 -> 576).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fiber_tpu.config import FiberConfig  # noqa: E402
from fiber_tpu.models.fiber import FiberCoarse  # noqa: E402
from fiber_tpu.utils.checkpoint_convert import (  # noqa: E402
    convert_fiber_state_dict, merge_into,
    resize_relative_position_bias_table)
from reference_loader import load_reference_modules  # noqa: E402

ATOL = 1e-3  # BASELINE.json detection/coarse logit tolerance

IMG = 384
EMBED = 128
HEADS = (4, 8, 16, 32)
DEPTHS = (2, 2, 18, 2)
TEXT_HIDDEN = 768
TEXT_HEADS = 12
TEXT_LAYERS = 12
NUM_FUSE = 6
MAX_LEN = 30
DIM_IMG = 1024
VOCAB = 5000  # converter-irrelevant; keeps the CPU MLM head small


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_modules()


def test_full_dim_fused_infer_parity(ref_mods):
    """Complete FiberCoarse.infer at FIBER-Base dims vs the reference
    interleave protocol (fiber_module.py:310-367) through the converter."""
    swin_mod, rob_mod, heads_mod = ref_mods
    from transformers.models.roberta.configuration_roberta import \
        RobertaConfig

    swin_mod.DIM_TEXT = TEXT_HIDDEN
    swin_mod.NUM_FUSE_BLOCK = NUM_FUSE
    rob_mod.NUM_FUSE_BLOCK = NUM_FUSE
    rob_mod.DIM_IMG = DIM_IMG

    torch.manual_seed(0)
    ref_swin = swin_mod.SwinTransformer(
        img_size=IMG, patch_size=4, in_chans=3, num_classes=0,
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    ref_swin.eval()

    bert_cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=TEXT_HIDDEN,
        num_hidden_layers=TEXT_LAYERS, num_attention_heads=TEXT_HEADS,
        intermediate_size=TEXT_HIDDEN * 4, max_position_embeddings=512,
        pad_token_id=1, type_vocab_size=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5)
    torch.manual_seed(1)
    ref_rob = rob_mod.RobertaModel(bert_cfg, add_pooling_layer=False)
    ref_rob.eval()

    hs = TEXT_HIDDEN
    torch.manual_seed(2)
    t_text_tr = torch.nn.Linear(hs, hs)
    t_img_tr = torch.nn.Linear(DIM_IMG, hs)
    t_text_pool = heads_mod.Pooler(hs)
    t_img_pool = heads_mod.Pooler(hs)
    t_itm = heads_mod.ITMHead(hs * 2)
    for m in (t_text_tr, t_img_tr, t_text_pool, t_img_pool, t_itm):
        m.eval()
    with torch.no_grad():
        for i in range(TEXT_LAYERS - NUM_FUSE, TEXT_LAYERS):
            ref_rob.encoder.layer[i].alpha_t2i.fill_(0.2)
        for blk in (list(ref_swin.layers[2].blocks[-(NUM_FUSE - 2):])
                    + list(ref_swin.layers[3].blocks)):
            blk.attn.alpha_i2t.fill_(0.2)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    ids = rng.integers(4, VOCAB, (1, MAX_LEN)).astype(np.int64)
    ids[:, -4:] = 1
    mask = (ids != 1).astype(np.int64)

    stage3 = DEPTHS[2]
    n_unfused3 = stage3 - NUM_FUSE + 2  # blocks fused: last (NUM_FUSE-2)
    with torch.no_grad():
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tids = torch.from_numpy(ids)
        tmask = torch.from_numpy(mask)
        x = ref_swin.patch_embed(timg)
        for layer in ref_swin.layers[:2]:
            x = layer(x)
        text = ref_rob.embeddings(input_ids=tids)
        ext = ref_rob.get_extended_attention_mask(tmask, tmask.shape,
                                                  tids.device)
        for i in range(TEXT_LAYERS - NUM_FUSE):
            text = ref_rob.encoder.layer[i](text, ext)[0]
        ti = TEXT_LAYERS - NUM_FUSE
        for bi, blk in enumerate(ref_swin.layers[2].blocks):
            if bi < n_unfused3:
                x = blk(x)
            else:
                fused = blk(x, text, ext)
                text = ref_rob.encoder.layer[ti](
                    text, ext, encoder_hidden_states=x)[0]
                ti += 1
                x = fused
        x = ref_swin.layers[2].downsample(x)
        for bi, blk in enumerate(ref_swin.layers[3].blocks):
            fused = blk(x, text, ext)
            text = ref_rob.encoder.layer[ti](
                text, ext, encoder_hidden_states=x,
                last_norm=(bi == 0))[0]
            ti += 1
            x = fused
        text_feats = t_text_tr(text)
        image_feats = t_img_tr(x)
        cls_text = t_text_pool(text_feats)
        avg_img = image_feats.mean(dim=1, keepdim=True)
        cls_img = t_img_pool(avg_img)
        ref_itm = t_itm(torch.cat([cls_text, cls_img], dim=-1)).numpy()

    sd = {}
    for k, v in ref_swin.state_dict().items():
        sd[f"vit_model.{k}"] = v.numpy()
    for k, v in ref_rob.state_dict().items():
        sd[f"text_transformer.{k}"] = v.numpy()
    for prefix, mod in [("cross_modal_text_transform", t_text_tr),
                        ("cross_modal_image_transform", t_img_tr),
                        ("cross_modal_text_pooler", t_text_pool),
                        ("cross_modal_image_pooler", t_img_pool),
                        ("itm_score", t_itm)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()
    converted, unmapped = convert_fiber_state_dict(sd, IMG, IMG)
    assert all("alpha_t2i" in u for u in unmapped), unmapped

    cfg = FiberConfig(
        image_size=IMG, patch_size=4, swin_embed_dim=EMBED,
        swin_depths=DEPTHS, swin_num_heads=HEADS, swin_drop_path_rate=0.0,
        input_image_embed_size=DIM_IMG, vocab_size=VOCAB,
        text_hidden_size=TEXT_HIDDEN, num_text_layers=TEXT_LAYERS,
        num_text_heads=TEXT_HEADS, max_text_len=MAX_LEN,
        max_position_embeddings=512, hidden_size=TEXT_HIDDEN,
        input_text_embed_size=TEXT_HIDDEN, num_fuse_block=NUM_FUSE,
        drop_rate=0.0, loss_names=("itm",), compute_dtype=jnp.float32,
        use_pallas_attention=False)
    model = FiberCoarse(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(ids), jnp.asarray(mask),
                           method=FiberCoarse.init_full)
    params = merge_into(variables["params"], converted)
    out = model.apply({"params": params}, jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out["itm"]), ref_itm, atol=ATOL)


def test_rpb_resize_matches_reference(ref_mods):
    """Converter's bicubic RPB re-interp (384 -> 576) vs the reference
    swin_adapt_position_encoding (swin_helpers.py:20-44)."""
    import importlib
    helpers = importlib.import_module("ref_fiber_modules.swin_helpers")

    rng = np.random.default_rng(9)
    nh = 8
    table = rng.standard_normal((23 * 23, nh)).astype(np.float32)  # w=12
    sd = {"blk.attn.relative_position_bias_table":
          torch.from_numpy(table.copy())}
    out = helpers.swin_adapt_position_encoding(dict(sd), before=384,
                                               after=576)
    ref_resized = out["blk.attn.relative_position_bias_table"].numpy()

    mine = resize_relative_position_bias_table(table, 12, 18)
    assert mine.shape == ref_resized.shape == (35 * 35, nh)
    np.testing.assert_allclose(mine, ref_resized, atol=5e-3)
