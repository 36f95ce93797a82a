"""PyTorch checkpoint -> flax param-tree converters.

Loads the reference's released checkpoints (PL `state_dict` layout, ref:
fiber_module.py:138-147) into FiberCoarse parameter trees, including:

* Linear weight transposition (torch (out,in) -> flax kernel (in,out))
* Conv weight layout (torch OIHW -> flax HWIO)
* LayerNorm weight/bias -> scale/bias
* ITC queue buffers stripped (ref: fiber_module.py:141-143)
* relative-position-bias bicubic re-interpolation when the image resolution
  (and hence window size) changes (ref: swin_helpers.py:20-44)
* unused reference params dropped (crossattention_t2i.output.LayerNorm is
  declared but never applied, roberta pooler unused, unfused alpha_t2i)

No reference code is used; the key mapping is derived from the reference's
module structure as documented in SURVEY.md §2.1.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# low-level helpers
# --------------------------------------------------------------------------
def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights for the 4 taps around fractional
    offset t in [0, 1): positions (-1-t, -t, 1-t, 2-t).  a=-0.75 matches
    torch's bicubic kernel (jax.image uses a=-0.5, which diverges from
    the reference's F.interpolate by up to ~0.3 on RPB tables)."""
    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2,
                     a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                     0.0))
    offs = np.stack([-1 - t, -t, 1 - t, 2 - t], axis=-1)  # (N, 4)
    return k(offs)


def _bicubic_1d(x: np.ndarray, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False) along
    axis 0 with edge clamping."""
    in_size = x.shape[0]
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    w = _cubic_weights(t)                                  # (out, 4)
    idx = np.clip(i0[:, None] + np.arange(-1, 3)[None, :], 0, in_size - 1)
    return np.einsum("ot,ot...->o...", w, x[idx])


def resize_relative_position_bias_table(table: np.ndarray,
                                        window_before: int,
                                        window_after: int) -> np.ndarray:
    """Bicubic re-interpolation of the ((2w-1)^2, nH) RPB table — exact
    semantics of ref swin_helpers.swin_adapt_position_encoding
    (swin_helpers.py:20-44: F.interpolate bicubic, align_corners=False)."""
    if window_before == window_after:
        return table
    s_before = 2 * window_before - 1
    s_after = 2 * window_after - 1
    nh = table.shape[1]
    grid = np.asarray(table, np.float32).reshape(s_before, s_before, nh)
    out = _bicubic_1d(grid, s_after)                       # rows
    out = _bicubic_1d(out.transpose(1, 0, 2), s_after).transpose(1, 0, 2)
    return out.reshape(s_after * s_after, nh)


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# --------------------------------------------------------------------------
# key mapping
# --------------------------------------------------------------------------
_DROP_PATTERNS = [
    r"^(image|text)_queue$", r"^(image|text)_input(_mask)?_queue$",
    r"^queue_(ptr|total)$",
    r"relative_position_index", r"attn_mask$",
    r"position_ids$",
    r"crossattention_t2i\.output\.LayerNorm",  # declared, never applied
    r"text_transformer\.pooler\.",             # unused HF pooler
    r"num_batches_tracked",
]


def _should_drop(key: str) -> bool:
    return any(re.search(p, key) for p in _DROP_PATTERNS)


def _map_layernorm(dst: Dict, prefix: str, key_tail: str, v: np.ndarray):
    name = "scale" if key_tail == "weight" else "bias"
    _set(dst, f"{prefix}/{name}", v)


def convert_swin_key(key: str, v: np.ndarray, dst: Dict,
                     window_before: int, window_after: int) -> bool:
    """Map one `vit_model.*` reference key into the flax tree.

    Returns True if handled."""
    m = re.match(r"patch_embed\.proj\.(weight|bias)", key)
    if m:
        _set(dst, f"patch_embed/proj/{'kernel' if m.group(1) == 'weight' else 'bias'}",
             _conv(v) if m.group(1) == "weight" else v)
        return True
    m = re.match(r"patch_embed\.norm\.(weight|bias)", key)
    if m:
        _map_layernorm(dst, "patch_embed/norm", m.group(1), v)
        return True
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        _map_layernorm(dst, "norm", m.group(1), v)
        return True
    m = re.match(r"layers\.(\d+)\.downsample\.(norm|reduction)\.(weight|bias)",
                 key)
    if m:
        s, mod, wb = m.groups()
        base = f"layers_{s}/downsample/{mod}"
        if mod == "reduction":
            _set(dst, f"{base}/kernel", _t(v))
        else:
            _map_layernorm(dst, base, wb, v)
        return True
    m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.*)", key)
    if not m:
        return False
    s, b, rest = m.groups()
    base = f"layers_{s}/blocks_{b}"
    ln = re.match(r"(norm1|norm2)\.(weight|bias)", rest)
    if ln:
        _map_layernorm(dst, f"{base}/{ln.group(1)}", ln.group(2), v)
        return True
    if rest == "attn.relative_position_bias_table":
        _set(dst, f"{base}/attn/relative_position_bias_table",
             resize_relative_position_bias_table(v, window_before,
                                                 window_after))
        return True
    att = re.match(r"attn\.(qkv|proj|qkv_text_i2t|qkv_i2t|proj_i2t)"
                   r"\.(weight|bias)", rest)
    if att:
        mod, wb = att.groups()
        _set(dst, f"{base}/attn/{mod}/{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    if rest == "attn.alpha_i2t":
        _set(dst, f"{base}/attn/alpha_i2t", v.reshape(1))
        return True
    nrm = re.match(r"attn\.norm_i2t_i\.(weight|bias)", rest)
    if nrm:
        _map_layernorm(dst, f"{base}/attn/norm_i2t_i", nrm.group(1), v)
        return True
    mlp = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
    if mlp:
        mod, wb = mlp.groups()
        _set(dst, f"{base}/mlp/{mod}/{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    return False


def convert_roberta_key(key: str, v: np.ndarray, dst: Dict) -> bool:
    """Map one `text_transformer.*` reference key (HF-4.6 fork layout)."""
    m = re.match(r"embeddings\.(word|position|token_type)_embeddings\.weight",
                 key)
    if m:
        _set(dst, f"embeddings/{m.group(1)}_embeddings/embedding", v)
        return True
    m = re.match(r"embeddings\.LayerNorm\.(weight|bias)", key)
    if m:
        _map_layernorm(dst, "embeddings/LayerNorm", m.group(1), v)
        return True
    m = re.match(r"encoder\.layer\.(\d+)\.(.*)", key)
    if not m:
        return False
    i, rest = m.groups()
    base = f"layer_{i}"
    patterns = [
        (r"attention\.self\.(query|key|value)\.(weight|bias)",
         lambda g: f"{base}/attention/{g[0]}"),
        (r"attention\.output\.dense\.(weight|bias)",
         lambda g: f"{base}/attention/out_dense"),
        (r"crossattention_t2i\.self\.(query|key|value)\.(weight|bias)",
         lambda g: f"{base}/crossattention_t2i/{g[0]}"),
        (r"crossattention_t2i\.output\.dense\.(weight|bias)",
         lambda g: f"{base}/crossattention_t2i/out_dense"),
        (r"intermediate\.dense\.(weight|bias)",
         lambda g: f"{base}/intermediate_dense"),
        (r"output\.dense\.(weight|bias)",
         lambda g: f"{base}/output_dense"),
    ]
    for pat, to in patterns:
        mm = re.match(pat, rest)
        if mm:
            g = mm.groups()
            wb = g[-1]
            _set(dst, f"{to(g)}/{'kernel' if wb == 'weight' else 'bias'}",
                 _t(v) if wb == "weight" else v)
            return True
    mm = re.match(r"attention\.output\.LayerNorm\.(weight|bias)", rest)
    if mm:
        _map_layernorm(dst, f"{base}/attn_layer_norm", mm.group(1), v)
        return True
    mm = re.match(r"output\.LayerNorm\.(weight|bias)", rest)
    if mm:
        _map_layernorm(dst, f"{base}/output_layer_norm", mm.group(1), v)
        return True
    if rest == "alpha_t2i":
        _set(dst, f"{base}/alpha_t2i", v.reshape(1))
        return True
    return False


_HEAD_SIMPLE = {
    "cross_modal_text_transform": "cross_modal_text_transform",
    "cross_modal_image_transform": "cross_modal_image_transform",
    "cross_modal_text_transform_itc": "cross_modal_text_transform_itc",
    "cross_modal_image_transform_itc": "cross_modal_image_transform_itc",
    "rank_output": "rank_output",
}
_POOLERS = {
    "cross_modal_text_pooler": "cross_modal_text_pooler",
    "cross_modal_image_pooler": "cross_modal_image_pooler",
    "cross_modal_text_pooler_itc": "cross_modal_text_pooler_itc",
    "cross_modal_image_pooler_itc": "cross_modal_image_pooler_itc",
}
_SEQ_CLASSIFIERS = {"vqa_classifier", "nlvr2_classifier"}


def convert_head_key(key: str, v: np.ndarray, dst: Dict) -> bool:
    if key == "temp":
        _set(dst, "temp", v.reshape(()))
        return True
    m = re.match(r"(\w+)\.(weight|bias)$", key)
    if m and m.group(1) in _HEAD_SIMPLE:
        wb = m.group(2)
        _set(dst, f"{_HEAD_SIMPLE[m.group(1)]}/"
                  f"{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    m = re.match(r"(\w+)\.dense\.(weight|bias)$", key)
    if m and m.group(1) in _POOLERS:
        wb = m.group(2)
        _set(dst, f"{_POOLERS[m.group(1)]}/dense/"
                  f"{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    m = re.match(r"itm_score\.fc\.(weight|bias)", key)
    if m:
        wb = m.group(1)
        _set(dst, f"itm_score/fc/{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    # MLM head: transform.dense / transform.LayerNorm / decoder.weight / bias
    m = re.match(r"mlm_score\.transform\.dense\.(weight|bias)", key)
    if m:
        wb = m.group(1)
        _set(dst, f"mlm_score/transform_dense/"
                  f"{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    m = re.match(r"mlm_score\.transform\.LayerNorm\.(weight|bias)", key)
    if m:
        _map_layernorm(dst, "mlm_score/transform_ln", m.group(1), v)
        return True
    if key == "mlm_score.decoder.weight":
        _set(dst, "mlm_score/decoder/kernel", _t(v))
        return True
    if key in ("mlm_score.bias", "mlm_score.decoder.bias"):
        _set(dst, "mlm_score/decoder/bias", v)
        return True
    # Sequential classifiers: index 0 -> fc1, 1 -> ln, 3 -> fc2
    m = re.match(r"(\w+)\.(\d)\.(weight|bias)", key)
    if m and m.group(1) in _SEQ_CLASSIFIERS:
        name, idx, wb = m.groups()
        sub = {"0": "fc1", "1": "ln", "3": "fc2"}[idx]
        if sub == "ln":
            _map_layernorm(dst, f"{name}/{sub}", wb, v)
        else:
            _set(dst, f"{name}/{sub}/{'kernel' if wb == 'weight' else 'bias'}",
                 _t(v) if wb == "weight" else v)
        return True
    # captioning projections: cross_modal_att_layers.{i}
    m = re.match(r"cross_modal_att_layers\.(\d+)\.(weight|bias)", key)
    if m:
        i, wb = m.groups()
        _set(dst, f"caption_image_proj_{i}/"
                  f"{'kernel' if wb == 'weight' else 'bias'}",
             _t(v) if wb == "weight" else v)
        return True
    return False


def convert_fiber_state_dict(state_dict: Dict[str, np.ndarray],
                             resolution_before: int = 384,
                             resolution_after: int = 384,
                             strict: bool = False) -> Tuple[Dict, list]:
    """Convert a reference FIBER PL `state_dict` to a flax param tree.

    Returns (params, unmapped_keys)."""
    wb, wa = resolution_before // 32, resolution_after // 32
    params: Dict[str, Any] = {}
    swin: Dict[str, Any] = {}
    text: Dict[str, Any] = {}
    unmapped = []
    for key, v in state_dict.items():
        v = np.asarray(v)
        if _should_drop(key):
            continue
        if key.startswith("vit_model."):
            if not convert_swin_key(key[len("vit_model."):], v, swin, wb, wa):
                unmapped.append(key)
        elif key.startswith("text_transformer."):
            if not convert_roberta_key(key[len("text_transformer."):], v,
                                       text):
                unmapped.append(key)
        else:
            if not convert_head_key(key, v, params):
                unmapped.append(key)
    params["vit_model"] = swin
    params["text_transformer"] = text
    if strict and unmapped:
        raise ValueError(f"unmapped keys: {unmapped[:20]}...")
    return params, unmapped


_DET_DYCONV_NAMES = {"0": "conv_up", "1": "conv_same", "2": "conv_down"}


def convert_detection_state_dict(state_dict: Dict[str, np.ndarray],
                                 use_deform: bool = True,
                                 strict: bool = False
                                 ) -> Tuple[Dict, list]:
    """Convert a reference fine-grained `GeneralizedVLRCNN` state_dict
    (fusion-in-backbone config: SWINT-FPN-RETINANET + roberta-fused-v2 +
    VLDyHead) into a `GroundingDetector` flax param tree.

    Reference module layout (key prefixes):
      fusion_backbone.backbone.body.*   Swin body, same block field names
          as the coarse stack (fusion_swin_transformer_v2.py:76-800) plus
          per-stage output-norm taps ``norm{i}`` -> our ``out_norm_{i}``
      fusion_backbone.backbone.fpn.fpn_inner{i}/fpn_layer{i}/top_blocks.p6/p7
          (fpn.py:35-65,150-156) -> lateral_{i-1}/output_{i-1}/p6/p7
      fusion_backbone.language_backbone.body.model.*  HF RoBERTa fork
          (roberta_fused_model_v2.py) -> backbone.language_backbone
      rpn.head.dyhead_tower.{i}.DyConv.{j}  j: 0=conv_up 1=conv_same
          2=conv_down (vldyhead.py:169-172 append order; forward use
          :221-229), AttnConv.1 (1x1 conv) -> attn_conv Dense,
          relu.fc.{0,2} -> dyrelu.fc1/fc2 (layers/dyrelu.py:75-77),
          offset -> offset_conv
      rpn.head.{cls_logits,bbox_pred,centerness}  1x1 convs
      rpn.head.{dot_product_projection_text,log_scale,bias_lang,bias0}
          (vldyhead.py:700-711); scales.{l}.scale -> scales vector (5,)

    `use_deform` selects the destination naming of the tower convs: the
    deformable Conv3x3Norm stores its kernel at the module level while the
    plain one nests it under ``conv`` (detection/dyhead.py:69-84).

    Returns (params, unmapped_keys).
    """
    backbone: Dict[str, Any] = {}
    text: Dict[str, Any] = {}
    fpn: Dict[str, Any] = {}
    rpn: Dict[str, Any] = {}
    scales = np.ones(5, np.float32)
    unmapped = []

    drop_extra = [
        r"pooler\.", r"position_ids$", r"cls\.predictions",
        r"\.rpb$",  # v2 log-CPB tables absent in v1-style fusion body
        # derived constants, regenerated by detector_anchors (pinned by
        # tests/test_detection_reference_parity.py)
        r"anchor_generator\.cell_anchors",
    ]

    def dropped(key: str) -> bool:
        return _should_drop(key) or any(re.search(p, key)
                                        for p in drop_extra)

    for key, v in state_dict.items():
        v = np.asarray(v)
        if dropped(key):
            continue
        if key.startswith("fusion_backbone.backbone.body."):
            k = key[len("fusion_backbone.backbone.body."):]
            m = re.match(r"norm(\d+)\.(weight|bias)$", k)
            if m:
                _map_layernorm(backbone, f"out_norm_{m.group(1)}",
                               m.group(2), v)
                continue
            # window size unchanged -> no RPB re-interp
            if convert_swin_key(k, v, backbone, 12, 12):
                continue
            unmapped.append(key)
        elif key.startswith("fusion_backbone.backbone.fpn."):
            k = key[len("fusion_backbone.backbone.fpn."):]
            # fpn_inner1/fpn_layer1 never exist: in_channels_list leads
            # with 0 for the skipped stride-4 level (fpn.py:44-45), so
            # reference index 2 is our level 0 (stride 8)
            m = re.match(r"fpn_(inner|layer)(\d+)\.(weight|bias)$", k)
            if m:
                kind, idx, wb = m.groups()
                name = ("lateral" if kind == "inner" else "output")
                dst = f"{name}_{int(idx) - 2}"
                _set(fpn, f"{dst}/{'kernel' if wb == 'weight' else 'bias'}",
                     _conv(v) if wb == "weight" else v)
                continue
            m = re.match(r"top_blocks\.(p6|p7)\.(weight|bias)$", k)
            if m:
                mod, wb = m.groups()
                _set(fpn, f"{mod}/{'kernel' if wb == 'weight' else 'bias'}",
                     _conv(v) if wb == "weight" else v)
                continue
            unmapped.append(key)
        elif key.startswith("fusion_backbone.language_backbone.body.model."):
            k = key[len("fusion_backbone.language_backbone.body.model."):]
            if not convert_roberta_key(k, v, text):
                unmapped.append(key)
        elif key == "fusion_backbone.tunable_linear.weight":
            backbone["tunable_linear"] = v
        elif key.startswith("rpn.head."):
            k = key[len("rpn.head."):]
            m = re.match(r"dyhead_tower\.(\d+)\.(.*)", k)
            if m:
                i, rest = m.groups()
                base = f"dyconv_{i}"
                mm = re.match(r"DyConv\.(\d)\.conv\.(weight|bias)$", rest)
                if mm:
                    j, wb = mm.groups()
                    mid = _DET_DYCONV_NAMES[j] + ("" if use_deform
                                                  else "/conv")
                    _set(rpn, f"{base}/{mid}/"
                              f"{'kernel' if wb == 'weight' else 'bias'}",
                         _conv(v) if wb == "weight" else v)
                    continue
                mm = re.match(r"DyConv\.(\d)\.bn\.(weight|bias)$", rest)
                if mm:
                    j, wb = mm.groups()
                    _map_layernorm(
                        rpn, f"{base}/{_DET_DYCONV_NAMES[j]}/gn", wb, v)
                    continue
                mm = re.match(r"AttnConv\.1\.(weight|bias)$", rest)
                if mm:
                    wb = mm.group(1)
                    if wb == "weight":   # (1, C, 1, 1) conv -> (C, 1) Dense
                        _set(rpn, f"{base}/attn_conv/kernel",
                             _t(v.reshape(v.shape[0], v.shape[1])))
                    else:
                        _set(rpn, f"{base}/attn_conv/bias", v)
                    continue
                mm = re.match(r"relu\.fc\.(0|2)\.(weight|bias)$", rest)
                if mm:
                    j, wb = mm.groups()
                    fc = "fc1" if j == "0" else "fc2"
                    _set(rpn, f"{base}/dyrelu/{fc}/"
                              f"{'kernel' if wb == 'weight' else 'bias'}",
                         _t(v) if wb == "weight" else v)
                    continue
                mm = re.match(r"offset\.(weight|bias)$", rest)
                if mm:
                    wb = mm.group(1)
                    _set(rpn, f"{base}/offset_conv/"
                              f"{'kernel' if wb == 'weight' else 'bias'}",
                         _conv(v) if wb == "weight" else v)
                    continue
                unmapped.append(key)
                continue
            m = re.match(r"(cls_logits|bbox_pred|centerness|token_logits|"
                         r"contrastive_align_projection_image)"
                         r"\.(weight|bias)$", k)
            if m:
                mod, wb = m.groups()
                _set(rpn, f"{mod}/{'kernel' if wb == 'weight' else 'bias'}",
                     _conv(v) if wb == "weight" else v)
                continue
            m = re.match(r"(dot_product_projection_text|"
                         r"contrastive_align_projection_text)"
                         r"\.(weight|bias)$", k)
            if m:
                mod, wb = m.groups()
                _set(rpn, f"{mod}/{'kernel' if wb == 'weight' else 'bias'}",
                     _t(v) if wb == "weight" else v)
                continue
            if k in ("log_scale", "bias0"):
                rpn[k] = v.reshape(1)
                continue
            if k == "bias_lang":
                rpn[k] = v
                continue
            m = re.match(r"scales\.(\d)\.scale$", k)
            if m:
                scales[int(m.group(1))] = float(v)
                continue
            unmapped.append(key)
        else:
            unmapped.append(key)

    rpn["scales"] = scales
    backbone["language_backbone"] = text
    backbone["fpn"] = fpn
    params = {"backbone": backbone, "rpn": rpn}
    if strict and unmapped:
        raise ValueError(f"unmapped keys: {unmapped[:20]}...")
    return params, unmapped


def load_fiber_checkpoint(path: str, resolution_before: int = 384,
                          resolution_after: int = 384):
    """torch.load a released FIBER .ckpt and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_fiber_state_dict(sd, resolution_before, resolution_after)


def merge_into(params, converted,
               skippable: Tuple[str, ...] = ("alpha_t2i",)) -> Any:
    """Overlay converted weights onto an init param tree (shape-checked).

    Keys in `skippable` may be absent from the model (e.g. the reference
    declares alpha_t2i on every RobertaLayer but only fused layers use it,
    roberta.py:440; our model only creates the live ones)."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    def overlay(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                if any(s in f"{path}/{k}" for s in skippable):
                    continue
                raise KeyError(f"{path}/{k} not in model params")
            if isinstance(v, dict):
                overlay(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {np.shape(v)}")
                dst[k] = jnp.asarray(v, dst[k].dtype)

    import flax
    out = flax.core.unfreeze(out) if hasattr(flax.core, "unfreeze") else out
    overlay(out, converted)
    return out
