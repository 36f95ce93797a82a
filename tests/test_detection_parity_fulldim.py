"""Whole-model detection-stack parity vs the assembled reference
GeneralizedVLRCNN (SURVEY.md:444-446 north star, second clause).

Every detection *component* is parity-pinned elsewhere
(test_detection_reference_parity.py, test_swin_vl_parity.py,
test_vlfuse.py); this test pins the ASSEMBLY — fusion backbone (Swin +
RoBERTa interleave) -> FPN -> VLDyHead tower -> dot-product grounding
logits + box deltas + centerness — against the in-process reference
model (generalized_vl_rcnn.py:242-404, fusion_swin_transformer_v2.py:
803-953, vldyhead.py:587-916) with weights carried over by
utils/checkpoint_convert.convert_detection_state_dict.

Two geometries:
  * tiny (narrow channels, full 24-block interleave — the reference
    hardcodes the fusion schedule so depths stay (2,2,18,2))
  * full FIBER-Base dims at a reduced 320x480 resolution (slow tier)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiber_tpu.detection.detector import DetectorConfig, GroundingDetector
from fiber_tpu.utils.checkpoint_convert import convert_detection_state_dict
from fiber_tpu.utils.fuzzy_load import flatten_params

torch = pytest.importorskip("torch")


def _build_pair(tiny: bool, image_size, max_query_len: int,
                use_deform: bool = False):
    from reference_loader_det import build_reference_vlrcnn
    ref_cfg, ref = build_reference_vlrcnn(tiny=tiny,
                                          max_query_len=max_query_len,
                                          use_deform=use_deform)
    cfg = DetectorConfig(
        image_size=image_size, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=12, num_fuse_block=6,
        out_channels=64 if tiny else 256,
        num_dyhead_convs=2 if tiny else 6,
        max_query_len=max_query_len, lang_dim=768, num_text_heads=12,
        use_deform=use_deform, use_pallas_attention=False)
    model = GroundingDetector(cfg)
    return ref, model, cfg


def _converted_params(ref, model, cfg):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    conv, unmapped = convert_detection_state_dict(
        sd, use_deform=cfg.use_deform)
    # nothing on the FIBER path may silently fail to convert
    assert not unmapped, f"unmapped reference keys: {unmapped[:10]}"

    H, W = cfg.image_size
    T = cfg.max_query_len
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H, W, 3), jnp.float32),
                      jnp.ones((1, T), jnp.int32),
                      jnp.ones((1, T), jnp.int32))
    flat_init = flatten_params(init["params"])
    flat_conv = flatten_params(conv)
    missing = sorted(set(flat_init) - set(flat_conv))
    extra = sorted(set(flat_conv) - set(flat_init))
    assert not missing, f"model params not covered: {missing[:10]}"
    assert not extra, f"converted keys with no model slot: {extra[:10]}"
    for k, v in flat_conv.items():
        assert tuple(np.shape(v)) == tuple(np.shape(flat_init[k])), (
            k, np.shape(v), np.shape(flat_init[k]))
    return {"params": conv}


def _run_pair(ref, model, cfg, seed=0):
    H, W = cfg.image_size
    T = cfg.max_query_len
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.5
    ids = rng.integers(4, 1000, (1, T)).astype(np.int64)
    mask = np.ones((1, T), np.int64)
    mask[:, T - 4:] = 0
    ids[:, T - 4:] = 1  # roberta pad id

    # reference: fused backbone then the VLDyHead tower
    # (the exact seams GeneralizedVLRCNN.forward drives, :313-360)
    from maskrcnn_benchmark.structures.image_list import to_image_list
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
    image_list = to_image_list(timg)
    tok = {"input_ids": torch.from_numpy(ids),
           "attention_mask": torch.from_numpy(mask)}
    with torch.no_grad():
        feats, lang, _ = ref.fusion_backbone(tok, image_list)
        outs = ref.rpn.head(list(feats), lang, lang["embedded"])
    box_cls, box_reg, centerness = outs[0], outs[1], outs[2]
    dot = outs[6]

    params = _converted_params(ref, model, cfg)
    out = model.apply(params, jnp.asarray(img), jnp.asarray(ids),
                      jnp.asarray(mask), deterministic=True)
    ho = out["head_out"]

    for lvl in range(5):
        # NCHW -> NHWC for the per-level conv heads
        for name, ref_t in (("box_cls", box_cls[lvl]),
                            ("bbox_reg", box_reg[lvl]),
                            ("centerness", centerness[lvl])):
            got = np.asarray(ho[name][lvl])
            want = ref_t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                got, want, atol=1e-3, rtol=1e-3,
                err_msg=f"level {lvl} {name}")
        got = np.asarray(ho["dot_product_logits"][lvl])
        want = dot[lvl].numpy()
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                                   err_msg=f"level {lvl} dot_product")


def test_whole_model_parity_tiny():
    ref, model, cfg = _build_pair(True, (64, 96), 24)
    _run_pair(ref, model, cfg)


def test_whole_model_parity_tiny_deform():
    """Tiny geometry with USE_DFCONV=True (the benched/production
    default, DetectorConfig.use_deform) — pins the deform ASSEMBLY:
    offset/mask conv wiring, weight conversion, the shared-conv-args
    quirk incl. the conv_up flat-buffer reinterpretation — against the
    reference DyConv tower running an independent CPU stand-in of its
    CUDA kernel (round-5 VERDICT item 4)."""
    ref, model, cfg = _build_pair(True, (64, 96), 24, use_deform=True)
    _run_pair(ref, model, cfg)


@pytest.mark.slow
def test_whole_model_parity_fulldim():
    """FIBER-Base dims at 320x480 — the detection analogue of
    test_reference_parity_fulldim.py (round-4 VERDICT item 2)."""
    ref, model, cfg = _build_pair(False, (320, 480), 48)
    _run_pair(ref, model, cfg)


@pytest.mark.slow
def test_whole_model_parity_fulldim_deform():
    """Reduced-full dims with deform ON — closes the last unpinned seam
    between the parity config and the benched config (use_deform=True
    at full channels)."""
    ref, model, cfg = _build_pair(False, (160, 224), 32, use_deform=True)
    _run_pair(ref, model, cfg)
