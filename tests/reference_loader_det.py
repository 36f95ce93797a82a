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
