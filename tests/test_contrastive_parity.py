"""End-to-end parity of the full ATSS loss __call__ vs the reference,
including the optional heads: GLIP soft-token loss, MDETR contrastive
alignment, and the shallow contrastive loss.

Executes the actual reference ATSSLossComputation.__call__
(rpn/loss.py:846-1264) in-process with every loss flag on, then checks
our atss_grounding_loss + ShallowContrastiveHead reproduce all seven
returned losses on the same inputs.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fiber_tpu.detection import atss as my_atss  # noqa: E402
from fiber_tpu.detection.anchors import fpn_anchors  # noqa: E402
from fiber_tpu.detection.atss_loss import atss_grounding_loss  # noqa: E402
from fiber_tpu.detection.contrastive import (  # noqa: E402
    ShallowProjections, contrastive_align_loss, nll_softmax_loss,
    select_shallow_anchors, shallow_contrastive_loss)

from reference_loader_det import setup_fine_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    setup_fine_reference()
    import maskrcnn_benchmark.modeling.rpn.loss as loss
    import maskrcnn_benchmark.modeling.rpn.vldyhead as vldyhead
    from maskrcnn_benchmark.config import cfg as default_cfg
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    cfg = default_cfg.clone()
    cfg.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    cfg.MODEL.RPN.SCALES_PER_OCTAVE = 1
    return dict(loss=loss, vldyhead=vldyhead, cfg=cfg, BoxList=BoxList)


IMG_W, IMG_H = 96, 80
FEAT_SIZES = ((10, 12), (5, 6))
STRIDES = (8, 16)
SIZES = (64, 128)
T = 256          # the reference hardcodes 256 on the shallow text axis
CF = 32          # FPN channel width (shallow image projection input)
LD = 24          # lang dim
HD = 16          # shallow/contrastive hidden dim
N_VALID_TOK = 20


class _FakeTokenized:
    """char_to_token(im, c) = c // 4 — spans below are 4*token chars."""

    def char_to_token(self, im, c):
        t = c // 4
        return t if t < T else None


class _FakeTokenizer:
    def batch_encode_plus(self, captions, **kw):
        return _FakeTokenized()


def _build_scene(seed=11):
    rng = np.random.default_rng(seed)
    n_gt = (3, 2)
    # od labels shared across images so the shallow cross-image map has
    # genuine positives
    od_labels = [np.array([3, 7, 11]), np.array([7, 3])]
    gts, pms, od_tok_maps, tokens_positive = [], [], [], []
    for img, n in enumerate(n_gt):
        x1 = rng.uniform(0, IMG_W - 24, n)
        y1 = rng.uniform(0, IMG_H - 24, n)
        w = rng.uniform(10, 60, n)
        h = rng.uniform(10, 50, n)
        boxes = np.stack([x1, y1, np.minimum(x1 + w, IMG_W - 1),
                          np.minimum(y1 + h, IMG_H - 1)], axis=1)
        gts.append(boxes.astype(np.float32))
        pm = np.zeros((n, T), np.float32)
        od_tok = np.full((T,), -1.0, np.float32)
        spans = []
        for g in range(n):
            s = 2 + g * 5
            e = s + 2 + (g % 2)
            pm[g, s:e] = 1.0
            od_tok[s:e] = od_labels[img][g]
            spans.append([(4 * s, 4 * e)])
        pms.append(pm)
        od_tok_maps.append(od_tok)
        tokens_positive.append(spans)
    return gts, pms, od_labels, od_tok_maps, tokens_positive


def _rand_level_preds(rng, B):
    """Per-level predictions in torch NCHW + flattened views."""
    preds = {}
    for key, ch in (("cls", 1), ("reg", 4), ("ctr", 1), ("tok", T)):
        preds[key] = [torch.from_numpy(
            rng.standard_normal((B, ch, H, W)).astype(np.float32))
            for (H, W) in FEAT_SIZES]
    for key in ("dot", "align"):   # already (B, HWA, T) in the reference
        preds[key] = [torch.from_numpy(
            rng.standard_normal((B, H * W, T)).astype(np.float32))
            for (H, W) in FEAT_SIZES]
    preds["feat"] = [torch.from_numpy(
        rng.standard_normal((B, H * W, CF)).astype(np.float32))
        for (H, W) in FEAT_SIZES]
    return preds


def _nchw_to_bhwc(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def test_full_loss_call_parity(ref):
    B = 2
    rng = np.random.default_rng(7)
    gts, pms, od_labels, od_tok_maps, tokens_positive = _build_scene()
    anchors_np = fpn_anchors(FEAT_SIZES, strides=STRIDES, sizes=SIZES)
    level_sizes = [a.shape[0] for a in anchors_np]
    preds = _rand_level_preds(rng, B)
    text_masks_np = np.zeros((B, T), np.int64)
    text_masks_np[:, :N_VALID_TOK] = 1
    lang_emb_np = rng.standard_normal((B, T, LD)).astype(np.float32)

    # ---------------- reference side ----------------
    cfg = ref["cfg"].clone()
    fc = cfg.MODEL.DYHEAD.FUSE_CONFIG
    fc.USE_TOKEN_LOSS = True
    fc.USE_CONTRASTIVE_ALIGN_LOSS = True
    fc.USE_DOT_PRODUCT_TOKEN_LOSS = True
    # NOTE: shallow is parity-checked in a SEPARATE reference call below:
    # when both flags are on, the reference's shallow block clobbers
    # positive_map_box_to_self_text with the padded (B, max_anchor, T)
    # version before ContrastiveAlignLoss reads it (loss.py:1019-1031 vs
    # :1226-1229) — the two losses are mutually incompatible in one call.
    fc.USE_SHALLOW_ZERO_PADS = True
    fc.SHALLOW_MAX_POSITIVE_ANCHORS = 100

    loss_mod = ref["loss"]
    comp = loss_mod.ATSSLossComputation.__new__(loss_mod.ATSSLossComputation)
    torch.nn.Module.__init__(comp)
    comp.cfg = cfg
    comp.box_coder = ref["vldyhead"].BoxCoder(cfg)
    comp.cls_loss_func = loss_mod.SigmoidFocalLoss(
        cfg.MODEL.FOCAL.LOSS_GAMMA, cfg.MODEL.FOCAL.LOSS_ALPHA)
    comp.centerness_loss_func = torch.nn.BCEWithLogitsLoss(reduction="sum")
    comp.token_loss_func = loss_mod.TokenSigmoidFocalLoss(
        fc.TOKEN_ALPHA, fc.TOKEN_GAMMA)
    comp.tokenizer = _FakeTokenizer()
    torch.manual_seed(0)
    comp.shallow_contrastive_projection_image = torch.nn.Linear(CF, HD)
    comp.shallow_contrastive_projection_text = torch.nn.Linear(LD, HD)
    comp.shallow_log_scale = torch.nn.Parameter(torch.Tensor([0.0]))

    targets = []
    for i, g in enumerate(gts):
        bl = ref["BoxList"](torch.from_numpy(g), (IMG_W, IMG_H),
                            mode="xyxy")
        # binary labels: the reference's 1-channel cls focal treats only
        # label==1 as positive; FIBER runs USE_CLASSIFICATION_LOSS=False
        # (vldyhead.py:1080-1083) and our head is binary objectness, so
        # label=1 makes the always-computed ref cls term comparable
        bl.add_field("labels", torch.ones(len(g)).float())
        bl.add_field("tokens_positive", tokens_positive[i])
        bl.add_field("original_od_label",
                     torch.from_numpy(od_labels[i]).float())
        bl.add_field("positive_map_for_od_labels",
                     torch.from_numpy(od_tok_maps[i]))
        targets.append(bl)
    ref_anchors = [[ref["BoxList"](torch.from_numpy(a), (IMG_W, IMG_H),
                                   mode="xyxy") for a in anchors_np]
                   for _ in range(B)]
    pm_cat = torch.from_numpy(np.concatenate(pms, axis=0))
    proj_tokens = torch.from_numpy(lang_emb_np)
    text_masks_t = torch.from_numpy(text_masks_np)

    with torch.no_grad():
        # call 1: token + dot-product + contrastive align (no shallow)
        fc.USE_SHALLOW_CONTRASTIVE_LOSS = False
        (r_cls, r_reg, r_ctr, r_tok, r_align, r_dot, _) = comp(
            box_cls=preds["cls"], box_regression=preds["reg"],
            centerness=preds["ctr"], targets=targets, anchors=ref_anchors,
            captions=["x"] * B, positive_map=pm_cat,
            token_logits=preds["tok"], proj_tokens=proj_tokens,
            contrastive_logits=[t.clone() for t in preds["align"]],
            dot_product_logits=[t.clone() for t in preds["dot"]],
            text_masks=text_masks_t, shallow_img_emb_feats=None)
        # call 2: shallow contrastive (align off)
        fc.USE_CONTRASTIVE_ALIGN_LOSS = False
        fc.USE_SHALLOW_CONTRASTIVE_LOSS = True
        (_, _, _, _, _, _, r_shallow) = comp(
            box_cls=preds["cls"], box_regression=preds["reg"],
            centerness=preds["ctr"], targets=targets, anchors=ref_anchors,
            captions=["x"] * B, positive_map=pm_cat,
            token_logits=preds["tok"], proj_tokens=proj_tokens,
            contrastive_logits=None,
            dot_product_logits=[t.clone() for t in preds["dot"]],
            text_masks=text_masks_t,
            shallow_img_emb_feats=[t.clone() for t in preds["feat"]])

    # ---------------- our side ----------------
    G = max(len(g) for g in gts)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_valid = np.zeros((B, G), bool)
    pm_pad = np.zeros((B, G, T), np.float32)
    od_pad = np.full((B, G), -100, np.int32)
    for i, g in enumerate(gts):
        gt_boxes[i, :len(g)] = g
        gt_valid[i, :len(g)] = True
        pm_pad[i, :len(g)] = pms[i]
        od_pad[i, :len(g)] = od_labels[i]

    def tok_reshape(t):
        # (B, A*T, H, W) conv layout -> (B, HWA, T)
        B_, C_, H, W = t.shape
        return jnp.asarray(
            t.numpy().reshape(B_, 1, T, H, W).transpose(0, 3, 4, 1, 2)
            .reshape(B_, H * W, T))

    head_out = {
        "box_cls": [_nchw_to_bhwc(t) for t in preds["cls"]],
        "bbox_reg": [_nchw_to_bhwc(t) for t in preds["reg"]],
        "centerness": [_nchw_to_bhwc(t) for t in preds["ctr"]],
        "token_logits": [tok_reshape(t) for t in preds["tok"]],
        "dot_product_logits": [jnp.asarray(t.numpy())
                               for t in preds["dot"]],
        "contrastive_logits": [jnp.asarray(t.numpy())
                               for t in preds["align"]],
    }
    anchors_cat = jnp.asarray(np.concatenate(anchors_np, axis=0))
    assign = my_atss.batched_atss_assign(
        anchors_cat, level_sizes, jnp.asarray(gt_boxes),
        jnp.asarray(gt_valid), topk=cfg.MODEL.ATSS.TOPK)

    my = atss_grounding_loss(
        head_out, anchors_cat, level_sizes, jnp.asarray(gt_boxes),
        jnp.asarray(gt_valid), jnp.asarray(pm_pad),
        jnp.asarray(text_masks_np.astype(np.int32)),
        reg_loss_weight=cfg.MODEL.ATSS.REG_LOSS_WEIGHT,
        topk=cfg.MODEL.ATSS.TOPK, assign=assign)

    pairs = [(r_cls, "loss_cls"), (r_reg, "loss_reg"),
             (r_ctr, "loss_centerness"), (r_tok, "loss_token"),
             (r_align, "loss_contrastive_align"),
             (r_dot, "loss_dot_product_token")]
    for ref_val, key in pairs:
        np.testing.assert_allclose(float(ref_val), float(my[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)

    # ---- shallow contrastive head
    num_pos = jnp.maximum(assign.pos_mask.sum().astype(jnp.float32), 1.0)
    sel_idx, sel_is_pos = select_shallow_anchors(
        assign.pos_mask, assign.assigned_gt, max_anchors=8)
    img_feats = jnp.concatenate(
        [jnp.asarray(t.numpy()) for t in preds["feat"]], axis=1)
    proj = ShallowProjections(hdim=HD)
    params = {
        "projection_image": {
            "kernel": jnp.asarray(
                comp.shallow_contrastive_projection_image.weight
                .detach().numpy().T),
            "bias": jnp.asarray(
                comp.shallow_contrastive_projection_image.bias
                .detach().numpy())},
        "projection_text": {
            "kernel": jnp.asarray(
                comp.shallow_contrastive_projection_text.weight
                .detach().numpy().T),
            "bias": jnp.asarray(
                comp.shallow_contrastive_projection_text.bias
                .detach().numpy())},
        "shallow_log_scale": jnp.zeros((1,), jnp.float32),
    }
    qi, qt, ls = proj.apply({"params": params}, img_feats,
                            jnp.asarray(lang_emb_np))
    my_shallow = shallow_contrastive_loss(
        qi, qt, ls, jnp.asarray(text_masks_np.astype(np.int32)), sel_idx,
        sel_is_pos, assign.assigned_gt, jnp.asarray(pm_pad),
        jnp.asarray(od_pad),
        jnp.asarray(np.stack(od_tok_maps).astype(np.int32)), num_pos,
        zero_pads=True)
    np.testing.assert_allclose(float(r_shallow), float(my_shallow),
                               rtol=2e-4, atol=1e-5)


def test_contrastive_align_loss_unit(ref):
    """Direct method-level pin of ContrastiveAlignLoss and NllSoftMaxLoss
    on random logits/maps (ref loss.py:554-581)."""
    loss_mod = ref["loss"]
    comp = loss_mod.ATSSLossComputation.__new__(loss_mod.ATSSLossComputation)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 30, 12)).astype(np.float32)
    pm = rng.random((2, 30, 12)) < 0.1
    ref_val = comp.ContrastiveAlignLoss(torch.from_numpy(logits),
                                        torch.from_numpy(pm))
    mine = contrastive_align_loss(jnp.asarray(logits), jnp.asarray(pm))
    np.testing.assert_allclose(float(ref_val), float(mine), rtol=1e-5)

    tgt = rng.random((2, 30, 12)).astype(np.float32)
    ref_nll = comp.NllSoftMaxLoss(torch.from_numpy(logits),
                                  torch.from_numpy(tgt)).sum()
    my_nll = nll_softmax_loss(jnp.asarray(logits), jnp.asarray(tgt)).sum()
    np.testing.assert_allclose(float(ref_nll), float(my_nll), rtol=1e-5)


def test_shallow_neg_pads_grads_finite():
    """The random-negative-pads variant (USE_SHALLOW_ZERO_PADS=False,
    the reference default) is not bitwise-comparable (the reference
    random.samples its pad anchors); check it runs, is finite, and
    differentiates."""
    B, N, G = 2, 40, 3
    rng = np.random.default_rng(1)
    pos_mask = jnp.asarray(rng.random((B, N)) < 0.2)
    assigned_gt = jnp.asarray(rng.integers(0, G, (B, N)), jnp.int32)
    sel_idx, sel_is_pos = select_shallow_anchors(pos_mask, assigned_gt, 12)
    proj = ShallowProjections(hdim=8)
    feats = jnp.asarray(rng.standard_normal((B, N, 16)), jnp.float32)
    lang = jnp.asarray(rng.standard_normal((B, 10, 12)), jnp.float32)
    tm = jnp.ones((B, 10), jnp.int32)
    pm = jnp.asarray(rng.random((B, G, 10)) < 0.2)
    od = jnp.asarray(rng.integers(0, 5, (B, G)), jnp.int32)
    odt = jnp.asarray(rng.integers(-1, 5, (B, 10)), jnp.int32)
    variables = proj.init(jax.random.PRNGKey(0), feats, lang)

    def f(v, x):
        qi, qt, ls = proj.apply(v, x, lang)
        return shallow_contrastive_loss(
            qi, qt, ls, tm, sel_idx, sel_is_pos, assigned_gt, pm, od,
            odt, jnp.float32(4.0), zero_pads=False)

    val, g = jax.value_and_grad(f, argnums=1)(variables, feats)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()


def test_detector_with_all_contrastive_flags():
    """Tiny GroundingDetector with token/align/shallow losses on: one
    detection_loss eval is finite and differentiable."""
    from fiber_tpu.detection.detector import (DetectorConfig,
                                              GroundingDetector,
                                              detection_loss)
    cfg = DetectorConfig.tiny_test(
        use_token_loss=True, use_contrastive_align=True,
        use_shallow_contrastive=True, shallow_max_positive_anchors=16)
    model = GroundingDetector(cfg)
    rng = np.random.default_rng(0)
    B, G, Tq = 2, 3, cfg.max_query_len
    H, W = cfg.image_size
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, H, W, 3)),
                              jnp.float32),
        "input_ids": jnp.asarray(rng.integers(4, cfg.vocab_size, (B, Tq)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, Tq), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.array([[[4, 4, 40, 40], [10, 20, 50, 60], [0, 0, 30, 30]],
                      [[8, 8, 56, 56], [20, 10, 60, 44], [0, 0, 0, 0]]],
                     np.float32)),
        "gt_valid": jnp.asarray([[True, True, True],
                                 [True, True, False]]),
        "positive_map": jnp.asarray(
            (rng.random((B, G, Tq)) < 0.15).astype(np.float32)),
        "gt_od_labels": jnp.asarray(rng.integers(0, 5, (B, G)), jnp.int32),
        "od_label_of_tokens": jnp.asarray(
            rng.integers(-1, 5, (B, Tq)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["input_ids"], batch["attention_mask"])
    assert "shallow_head" in variables["params"]

    def loss_fn(v):
        losses = detection_loss(model, v, batch, train=False)
        return losses["total_loss"], losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables)
    for k in ("loss_token", "loss_contrastive_align",
              "loss_shallow_contrastive"):
        assert k in losses and np.isfinite(float(losses[k])), k
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
