"""Probe: build the reference GeneralizedVLRCNN (SWINT-FPN-RETINANET +
roberta-fused-v2 + VLDyHead) in-process and dump its state_dict keys,
alongside our GroundingDetector param paths — scaffolding for the
whole-model detection parity converter (VERDICT round-4 item 2).

CPU-only; run with: PYTHONPATH= python tools/probe_det_parity.py
"""

import sys

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from reference_loader_det import load_default_cfg, setup_fine_reference  # noqa: E402


def build_reference(tiny=False):
    setup_fine_reference()
    cfg = load_default_cfg()
    cfg.defrost()
    m = cfg.MODEL
    m.META_ARCHITECTURE = "GeneralizedVLRCNN"
    m.RPN_ONLY = True
    m.RPN_ARCHITECTURE = "VLDYHEAD"
    m.SWINT.VERSION = "fusion"
    m.SWINT.EMBED_DIM = 128
    m.SWINT.DEPTHS = (2, 2, 18, 2)
    m.SWINT.NUM_HEADS = (4, 8, 16, 32)
    m.SWINT.WINDOW_SIZE = 12
    m.SWINT.OUT_CHANNELS = (128, 256, 512, 1024)
    m.SWINT.DROP_PATH_RATE = 0.0
    m.BACKBONE.FUSION_VERSION = "v2"
    m.BACKBONE.CONV_BODY = "SWINT-FPN-RETINANET"
    m.BACKBONE.OUT_CHANNELS = 256
    m.BACKBONE.USE_CHECKPOINT = False
    m.LANGUAGE_BACKBONE.MODEL_TYPE = "roberta-fused-v2"
    m.LANGUAGE_BACKBONE.TOKENIZER_TYPE = "roberta-base"
    m.LANGUAGE_BACKBONE.LANG_DIM = 768
    m.LANGUAGE_BACKBONE.USE_CHECKPOINT = False
    m.RPN.USE_FPN = True
    m.RPN.ANCHOR_SIZES = (64, 128, 256, 512, 1024)
    m.RPN.ANCHOR_STRIDE = (8, 16, 32, 64, 128)
    m.RPN.ASPECT_RATIOS = (1.0,)
    m.RPN.SCALES_PER_OCTAVE = 1
    m.DYHEAD.CHANNELS = 256
    m.DYHEAD.NUM_CONVS = 6
    m.DYHEAD.USE_GN = True
    m.DYHEAD.USE_DYRELU = True
    m.DYHEAD.USE_DFCONV = True
    m.DYHEAD.USE_DYFUSE = True
    m.DYHEAD.TOPK = 9
    m.DYHEAD.SCORE_AGG = "MEAN"
    m.DYHEAD.LOG_SCALE = 0.0
    m.DYHEAD.USE_CHECKPOINT = False
    fc = m.DYHEAD.FUSE_CONFIG
    fc.EARLY_FUSE_ON = False
    fc.TYPE = "NONE"
    fc.USE_DOT_PRODUCT_TOKEN_LOSS = True
    fc.USE_LAYER_SCALE = True
    fc.CLAMP_MIN_FOR_UNDERFLOW = True
    fc.CLAMP_MAX_FOR_OVERFLOW = True
    fc.CLAMP_DOT_PRODUCT = True
    if tiny:
        m.SWINT.EMBED_DIM = 16
        m.SWINT.DEPTHS = (2, 2, 2, 2)
        m.SWINT.NUM_HEADS = (2, 2, 2, 2)
        m.SWINT.WINDOW_SIZE = 4
        m.SWINT.OUT_CHANNELS = (16, 32, 64, 128)
        m.BACKBONE.OUT_CHANNELS = 32
        m.DYHEAD.CHANNELS = 32
        m.DYHEAD.NUM_CONVS = 2
    cfg.freeze()

    # offline stubs: from_pretrained would hit the network (zero egress)
    from transformers.models.roberta.configuration_roberta import RobertaConfig
    from maskrcnn_benchmark.modeling.language_backbone import (
        roberta_fused_model_v2 as rfm)
    from maskrcnn_benchmark.modeling.detector import generalized_vl_rcnn as gvl

    def local_roberta_config(name, **kw):
        return RobertaConfig(
            vocab_size=50265, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=1,
            pad_token_id=1, bos_token_id=0, eos_token_id=2,
            layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)

    rfm.RobertaConfig.from_pretrained = classmethod(
        lambda cls, name, **kw: local_roberta_config(name))
    rfm.RobertaModel.from_pretrained = classmethod(
        lambda cls, name, add_pooling_layer=True, config=None, **kw:
        cls(config, add_pooling_layer=add_pooling_layer))

    class _FakeTok:
        mask_token_id = 50264
        pad_token_id = 1

        def get_vocab(self):
            return {"<s>": 0, "<pad>": 1}

    gvl.AutoTokenizer.from_pretrained = staticmethod(
        lambda *a, **kw: _FakeTok())

    torch.manual_seed(0)
    model = gvl.GeneralizedVLRCNN(cfg)
    model.eval()
    return cfg, model


def main():
    tiny = "--tiny" in sys.argv
    cfg, model = build_reference(tiny=tiny)
    sd = model.state_dict()
    print(f"reference state_dict: {len(sd)} tensors")
    for k, v in sd.items():
        print(f"  {k} {tuple(v.shape)}")
    total = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"total params: {total/1e6:.1f}M")


if __name__ == "__main__":
    main()
