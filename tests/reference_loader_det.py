"""Import the reference's fine-grained (maskrcnn_benchmark) torch modules
for detection parity testing.

The image lacks yacs / pycocotools / timm / the compiled `_C` CUDA
extension, so we install minimal stand-ins before adding
/root/reference/fine_grained to sys.path.  Reference code is executed,
never copied; the stand-ins implement only the public APIs the reference
imports (a dict-backed CfgNode, pure-torch NMS, no-op doc decorators).
"""

from __future__ import annotations

import copy
import importlib.util
import sys
import types

REF_FINE = "/root/reference/fine_grained"


# ---------------------------------------------------------------------------
# yacs stand-in: attribute-access dict with clone/merge/freeze
# ---------------------------------------------------------------------------
class CfgNode(dict):
    """Minimal yacs.config.CfgNode: nested attribute-style config tree."""

    def __init__(self, init=None, **kwargs):
        init = dict(init or {}, **kwargs)
        super().__init__()
        for k, v in init.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        def rec(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    rec(dst[k], v)
                else:
                    dst[k] = v
        rec(self, other)

    def merge_from_list(self, opts):
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value

    def freeze(self):
        pass

    def defrost(self):
        pass

    def is_frozen(self):
        return False

    def dump(self, **kwargs):
        return repr(dict(self))


def _install_yacs_stub():
    if "yacs" in sys.modules:
        return
    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    for name, mod in [("yacs", yacs), ("yacs.config", config)]:
        mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        sys.modules[name] = mod


def _install_pycocotools_stub():
    if "pycocotools" in sys.modules:
        return
    pkg = types.ModuleType("pycocotools")
    coco = types.ModuleType("pycocotools.coco")
    cocoeval = types.ModuleType("pycocotools.cocoeval")
    mask = types.ModuleType("pycocotools.mask")

    class COCO:  # placeholder; parity tests never evaluate through pycoco
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools stub: not usable in tests")

    class COCOeval:
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools stub: not usable in tests")

    coco.COCO = COCO
    cocoeval.COCOeval = COCOeval
    mask.encode = mask.decode = mask.area = mask.toBbox = \
        lambda *a, **k: None
    mask.frPyObjects = lambda *a, **k: None

    def _box_iou(dts, gts, iscrowd):
        """pycocotools maskUtils.iou for the bbox path only: xywh box
        lists, iou = inter / (union or det-area when iscrowd)."""
        import numpy as np
        d = np.asarray(dts, np.float64).reshape(-1, 4)
        g = np.asarray(gts, np.float64).reshape(-1, 4)
        crowd = np.asarray(list(iscrowd), bool).reshape(1, -1) \
            if len(gts) else np.zeros((1, 0), bool)
        dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
        gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
        iw = np.clip(np.minimum(dx2[:, None], gx2[None, :])
                     - np.maximum(d[:, None, 0], g[None, :, 0]), 0, None)
        ih = np.clip(np.minimum(dy2[:, None], gy2[None, :])
                     - np.maximum(d[:, None, 1], g[None, :, 1]), 0, None)
        inter = iw * ih
        da = (d[:, 2] * d[:, 3])[:, None]
        ga = (g[:, 2] * g[:, 3])[None, :]
        denom = np.where(crowd, da, da + ga - inter)
        return np.where(denom > 0, inter / np.maximum(denom, 1e-12), 0.0)

    mask.iou = _box_iou
    pkg.coco = coco
    pkg.cocoeval = cocoeval
    pkg.mask = mask
    for name, mod in [("pycocotools", pkg), ("pycocotools.coco", coco),
                      ("pycocotools.cocoeval", cocoeval),
                      ("pycocotools.mask", mask)]:
        mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        sys.modules[name] = mod


def _install_C_stub():
    """Pure-torch CPU stand-ins for the compiled ops the reference binds
    at import time (nms/ml_nms; ROI + focal ops have Python fallbacks)."""
    if "maskrcnn_benchmark._C" in sys.modules:
        return
    import torch

    def nms(boxes, scores, thresh):
        # reference kernel semantics (csrc/cpu/nms_cpu.cpp): +1 inclusive
        # pixel widths and suppression at iou >= thresh
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = ((xx2 - xx1 + 1).clamp(min=0)
                     * (yy2 - yy1 + 1).clamp(min=0))
            a_i = ((boxes[i, 2] - boxes[i, 0] + 1)
                   * (boxes[i, 3] - boxes[i, 1] + 1))
            a_r = ((boxes[rest, 2] - boxes[rest, 0] + 1)
                   * (boxes[rest, 3] - boxes[rest, 1] + 1))
            iou = inter / (a_i + a_r - inter)
            order = rest[iou < thresh]
        return torch.as_tensor(keep, dtype=torch.long)

    def ml_nms(boxes, scores, labels, thresh):
        # class-offset trick: boxes of different classes never overlap
        offset = (boxes.max() + 1.0) if boxes.numel() else 1.0
        shifted = boxes + labels.to(boxes)[:, None] * offset
        return nms(shifted, scores, thresh)

    _C = types.ModuleType("maskrcnn_benchmark._C")
    _C.nms = nms
    _C.ml_nms = ml_nms
    _C.soft_nms = None  # bound but unused on the FIBER path
    _C.__spec__ = importlib.util.spec_from_loader(
        "maskrcnn_benchmark._C", loader=None)
    sys.modules["maskrcnn_benchmark._C"] = _C


def _install_prettytable_stub():
    if "prettytable" in sys.modules:
        return
    pt = types.ModuleType("prettytable")

    class PrettyTable:
        def __init__(self, field_names=None, **k):
            self.field_names = field_names or []
            self.rows = []

        def add_row(self, row):
            self.rows.append(row)

        def __str__(self):
            lines = ["\t".join(map(str, self.field_names))]
            lines += ["\t".join(map(str, r)) for r in self.rows]
            return "\n".join(lines)

    pt.PrettyTable = PrettyTable
    pt.__spec__ = importlib.util.spec_from_loader("prettytable", loader=None)
    sys.modules["prettytable"] = pt


def _install_ftfy_stub():
    if "ftfy" in sys.modules:
        return
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    ftfy.__spec__ = importlib.util.spec_from_loader("ftfy", loader=None)
    sys.modules["ftfy"] = ftfy


def _install_imp_stub():
    """`imp` was removed in py3.12; the reference only uses load_source."""
    if "imp" in sys.modules:
        return
    imp = types.ModuleType("imp")

    def load_source(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    imp.load_source = load_source
    imp.__spec__ = importlib.util.spec_from_loader("imp", loader=None)
    sys.modules["imp"] = imp


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    _C = sys.modules["maskrcnn_benchmark._C"]
    ops.nms = _C.nms
    tv.ops = ops

    datasets = types.ModuleType("torchvision.datasets")

    class CocoDetection:
        """Import-time base only; reference dataset classes are not
        instantiable in tests (pycocotools absent)."""

        def __init__(self, root=None, annFile=None, *a, **k):
            raise RuntimeError("torchvision stub: CocoDetection base "
                               "cannot be instantiated in tests")

    datasets.CocoDetection = CocoDetection
    datasets.__path__ = []  # mark as package so submodules can be stubbed
    vision = types.ModuleType("torchvision.datasets.vision")

    class VisionDataset:
        def __init__(self, root=None, *a, **k):
            self.root = root

    vision.VisionDataset = VisionDataset
    datasets.VisionDataset = VisionDataset
    datasets.vision = vision
    tv.datasets = datasets

    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    import torch

    def to_tensor(pic):
        import numpy as np
        arr = np.asarray(pic, dtype="float32") / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1)

    def normalize(t, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=t.dtype)[:, None, None]
        std = torch.as_tensor(std, dtype=t.dtype)[:, None, None]
        return (t - mean) / std

    def hflip(t):
        return t.flip(-1)

    functional.to_tensor = to_tensor
    functional.normalize = normalize
    functional.hflip = hflip

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    transforms.Compose = Compose
    transforms.functional = functional
    tv.transforms = transforms
    for name, mod in [("torchvision", tv), ("torchvision.ops", ops),
                      ("torchvision.datasets", datasets),
                      ("torchvision.datasets.vision", vision),
                      ("torchvision.transforms", transforms),
                      ("torchvision.transforms.functional", functional)]:
        mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        sys.modules[name] = mod


def _install_torch_six_stub():
    """torch._six was removed from modern torch; lvis_eval.py imports it
    at module top but never uses it (lvis/lvis_eval.py:12)."""
    if "torch._six" in sys.modules:
        return
    import torch
    six = types.ModuleType("torch._six")
    six.string_classes = (str,)
    six.int_classes = (int,)
    six.PY37 = sys.version_info >= (3, 7)
    six.PY3 = True
    six.__spec__ = importlib.util.spec_from_loader("torch._six",
                                                   loader=None)
    torch._six = six
    sys.modules["torch._six"] = six


_ready = False


def setup_fine_reference():
    """Install all stubs and put the fine_grained tree on sys.path."""
    global _ready
    if _ready:
        return
    sys.path.insert(0, "/root/repo/tests")
    from reference_loader import _install_timm_stub, _patch_transformers
    _install_timm_stub()
    _patch_transformers()
    _install_yacs_stub()
    _install_pycocotools_stub()
    if REF_FINE not in sys.path:
        sys.path.insert(0, REF_FINE)
    _install_C_stub()
    _install_torch_six_stub()
    _install_torchvision_stub()
    _install_imp_stub()
    _install_prettytable_stub()
    _install_ftfy_stub()
    _ready = True


def load_default_cfg():
    """The reference's full default config tree (config/defaults.py)."""
    setup_fine_reference()
    from maskrcnn_benchmark.config import cfg
    return cfg.clone()


def modulated_deform_conv_cpu(x, offset, mask, weight, bias=None,
                              stride=1, padding=1, dilation=1, groups=1,
                              deformable_groups=1):
    """CPU torch stand-in for the reference's CUDA-only
    modulated_deform_conv (csrc/cuda/deform_conv_cuda.cu:495-:570 +
    deform_conv_kernel_cuda.cu im2col), written independently of
    fiber_tpu's jax op so whole-model deform parity is a real
    cross-implementation check.

    Mirrors the kernel exactly, including:
      * dmcn bilinear border semantics (sample counted iff
        -1 < s < size; out-of-range corners contribute 0)
      * the NO-SHAPE-CHECK flat reinterpretation of oversized
        offset/mask buffers with the conv's own output strides
        (the forward passes offset[b] raw; vldyhead's conv_up path
        relies on this)
    """
    import torch
    assert groups == 1 and deformable_groups == 1
    B, C, H, W = x.shape
    Cout, Cin, kh, kw = weight.shape
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    off = offset.contiguous().view(B, -1)[:, :2 * kh * kw * Ho * Wo]
    off = off.view(B, kh * kw, 2, Ho, Wo)   # [..., 0]=dy, [..., 1]=dx
    msk = mask.contiguous().view(B, -1)[:, :kh * kw * Ho * Wo]
    msk = msk.view(B, kh * kw, Ho, Wo)
    base_y = (torch.arange(Ho, dtype=x.dtype) * stride - padding)
    base_x = (torch.arange(Wo, dtype=x.dtype) * stride - padding)

    out = torch.zeros(B, Cout, Ho, Wo, dtype=x.dtype)
    xf = x.reshape(B, C, -1)
    for k in range(kh * kw):
        ky, kx = k // kw, k % kw
        sy = base_y.view(1, Ho, 1) + ky * dilation + off[:, k, 0]
        sx = base_x.view(1, 1, Wo) + kx * dilation + off[:, k, 1]
        valid = (sy > -1) & (sy < H) & (sx > -1) & (sx < W)
        y0 = torch.floor(sy)
        x0 = torch.floor(sx)
        ly, lx = sy - y0, sx - x0
        vals = torch.zeros(B, C, Ho, Wo, dtype=x.dtype)
        for yy, wy in ((y0, 1 - ly), (y0 + 1, ly)):
            for xx, wx in ((x0, 1 - lx), (x0 + 1, lx)):
                inb = ((yy >= 0) & (yy <= H - 1)
                       & (xx >= 0) & (xx <= W - 1))
                yi = yy.clamp(0, H - 1).long()
                xi = xx.clamp(0, W - 1).long()
                flat = (yi * W + xi).view(B, 1, -1).expand(B, C, Ho * Wo)
                v = torch.gather(xf, 2, flat).view(B, C, Ho, Wo)
                vals = vals + v * (wy * wx * inb.to(x.dtype)).unsqueeze(1)
        samp = vals * (msk[:, k] * valid.to(x.dtype)).unsqueeze(1)
        out = out + torch.einsum("bchw,oc->bohw", samp,
                                 weight[:, :, ky, kx])
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def patch_deform_cpu():
    """Route the reference's ModulatedDeformConv.forward through the CPU
    stand-in (the shipped binding raises on CPU: layers/deform_conv.py
    binds _C.modulated_deform_conv_forward, CUDA-only)."""
    from maskrcnn_benchmark.layers import deform_conv as dc

    def _apply(input, offset, mask, weight, bias=None, stride=1,
               padding=0, dilation=1, groups=1, deformable_groups=1):
        with __import__("torch").no_grad():
            return modulated_deform_conv_cpu(
                input, offset, mask, weight, bias, stride, padding,
                dilation, groups, deformable_groups)

    dc.modulated_deform_conv = _apply


def build_reference_vlrcnn(tiny: bool = True, max_query_len: int = 24,
                           seed: int = 0, use_deform: bool = False):
    """Build the reference's assembled GeneralizedVLRCNN in-process:
    SWINT-FPN-RETINANET (fusion v2 body) + roberta-fused-v2 + VLDyHead
    (generalized_vl_rcnn.py:64-240).

    The fusion-v2 interleave is HARDCODED in the reference (stage-3
    blocks >= 14 get dim_text=768, fusion_swin_transformer_v2.py:458;
    stage-4 blocks 0/1 fused explicitly :906-918; 6 pre-text layers
    :850), so even the tiny variant keeps depths (2,2,18,2), full
    Swin-B widths and lang_dim 768, shrinking only the resolution and
    the dyhead tower.  use_deform=True enables USE_DFCONV with the CPU
    stand-in above (the shipped binding is CUDA-only); component-level
    deform parity lives in tests/test_deform_conv.py.

    Returns (cfg, model.eval()).
    """
    setup_fine_reference()
    import torch
    cfg = load_default_cfg()
    cfg.defrost()
    m = cfg.MODEL
    m.META_ARCHITECTURE = "GeneralizedVLRCNN"
    m.RPN_ONLY = True
    m.RPN_ARCHITECTURE = "VLDYHEAD"
    m.SWINT.VERSION = "fusion"
    m.SWINT.DEPTHS = (2, 2, 18, 2)
    m.SWINT.WINDOW_SIZE = 12
    m.SWINT.DROP_PATH_RATE = 0.0
    m.BACKBONE.FUSION_VERSION = "v2"
    m.BACKBONE.CONV_BODY = "SWINT-FPN-RETINANET"
    m.BACKBONE.USE_CHECKPOINT = False
    m.LANGUAGE_BACKBONE.MODEL_TYPE = "roberta-fused-v2"
    m.LANGUAGE_BACKBONE.TOKENIZER_TYPE = "roberta-base"
    m.LANGUAGE_BACKBONE.LANG_DIM = 768
    m.LANGUAGE_BACKBONE.MAX_QUERY_LEN = max_query_len
    m.LANGUAGE_BACKBONE.USE_CHECKPOINT = False
    m.RPN.USE_FPN = True
    m.RPN.ANCHOR_SIZES = (64, 128, 256, 512, 1024)
    m.RPN.ANCHOR_STRIDE = (8, 16, 32, 64, 128)
    m.RPN.ASPECT_RATIOS = (1.0,)
    m.RPN.SCALES_PER_OCTAVE = 1
    m.DYHEAD.NUM_CLASSES = 2          # binary objectness (grounding path)
    m.DYHEAD.NUM_CONVS = 6
    m.DYHEAD.USE_GN = True
    m.DYHEAD.USE_DYRELU = True
    # the reference deform conv binds CUDA-only kernels; with
    # use_deform=True we patch in modulated_deform_conv_cpu (above)
    m.DYHEAD.USE_DFCONV = bool(use_deform)
    if use_deform:
        patch_deform_cpu()
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
    # Swin-B widths are NOT shrinkable: the fused roberta hardcodes the
    # t2i cross K/V in-dims to 512/1024 (roberta_fused_model_v2.py:
    # 193-202), i.e. the stage-3/4 dims of embed_dim 128.  The tiny
    # variant shrinks only the resolution and the dyhead.
    m.SWINT.EMBED_DIM = 128
    m.SWINT.NUM_HEADS = (4, 8, 16, 32)
    m.SWINT.OUT_CHANNELS = (128, 256, 512, 1024)
    if tiny:
        m.BACKBONE.OUT_CHANNELS = 64
        m.DYHEAD.CHANNELS = 64
        m.DYHEAD.NUM_CONVS = 2
    else:
        m.BACKBONE.OUT_CHANNELS = 256
        m.DYHEAD.CHANNELS = 256
    cfg.freeze()

    # offline stand-ins: from_pretrained would hit the network (zero
    # egress); construct the configs locally instead
    from transformers.models.roberta.configuration_roberta import (
        RobertaConfig)
    from maskrcnn_benchmark.modeling.language_backbone import (
        roberta_fused_model_v2 as rfm)
    from maskrcnn_benchmark.modeling.detector import (
        generalized_vl_rcnn as gvl)

    def local_roberta_config(*a, **kw):
        return RobertaConfig(
            vocab_size=50265, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=1,
            pad_token_id=1, bos_token_id=0, eos_token_id=2,
            layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)

    rfm.RobertaConfig.from_pretrained = classmethod(
        lambda cls, name, **kw: local_roberta_config())
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

    torch.manual_seed(seed)
    model = gvl.GeneralizedVLRCNN(cfg)
    model.eval()
    return cfg, model
