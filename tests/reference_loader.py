"""Import the reference's torch modules for parity testing.

Installs minimal stand-ins for the timm APIs the reference imports (the
image lacks timm) and loads coarse_grained/fiber/modules/{swin_transformer,
roberta}.py as an isolated package.  Reference code is executed, never
copied; these tests pin our JAX reimplementation to the original torch
behavior through the checkpoint converter.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from typing import Optional

REF_MODULES = "/root/reference/coarse_grained/fiber/modules"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = lambda *a, **k: None
    helpers.overlay_external_default_cfg = lambda *a, **k: None
    features = types.ModuleType("timm.models.features")
    for n in ("FeatureListNet", "FeatureDictNet", "FeatureHookNet"):
        setattr(features, n, type(n, (), {}))
    hub = types.ModuleType("timm.models.hub")
    hub.has_hf_hub = lambda *a, **k: False
    hub.download_cached_file = lambda *a, **k: None
    hub.load_state_dict_from_hf = lambda *a, **k: None
    hub.load_state_dict_from_url = lambda *a, **k: None
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.checkpoint_filter_fn = lambda sd, model: sd
    vit._init_vit_weights = lambda *a, **k: None

    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class PatchEmbed(nn.Module):
        """timm-equivalent: conv proj + flatten + optional norm."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0],
                              img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size, stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    layers.PatchEmbed = PatchEmbed
    layers.Mlp = Mlp
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.Conv2dSame = nn.Conv2d
    layers.Linear = nn.Linear

    timm.data = data
    timm.models = models
    models.helpers = helpers
    models.features = features
    models.hub = hub
    models.registry = registry
    models.vision_transformer = vit
    models.layers = layers
    for name, mod in [("timm", timm), ("timm.data", data),
                      ("timm.models", models),
                      ("timm.models.helpers", helpers),
                      ("timm.models.features", features),
                      ("timm.models.hub", hub),
                      ("timm.models.registry", registry),
                      ("timm.models.vision_transformer", vit),
                      ("timm.models.layers", layers)]:
        mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        sys.modules[name] = mod


def _patch_transformers():
    """Backfill transformers-4.6 APIs the reference imports."""
    import transformers.modeling_utils as mu
    try:
        from transformers import pytorch_utils
        for n in ("find_pruneable_heads_and_indices", "prune_linear_layer",
                  "apply_chunking_to_forward"):
            if not hasattr(mu, n) and hasattr(pytorch_utils, n):
                setattr(mu, n, getattr(pytorch_utils, n))
    except ImportError:
        pass
    import transformers
    if not hasattr(transformers, "file_utils"):
        fu = types.ModuleType("transformers.file_utils")
        sys.modules["transformers.file_utils"] = fu
        transformers.file_utils = fu
    fu = sys.modules.get("transformers.file_utils")
    # signatures of these doc decorators changed across versions; replace
    # with permissive no-ops (docs only)
    for n in ("add_code_sample_docstrings", "add_start_docstrings",
              "add_start_docstrings_to_model_forward",
              "replace_return_docstrings"):
        setattr(fu, n, lambda *a, **k: (lambda f: f))


def _load(name: str, path: str, package: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def load_reference_modules():
    """Returns (swin_transformer, roberta) reference modules, or raises."""
    if "mods" in _cache:
        return _cache["mods"]
    _install_timm_stub()
    _patch_transformers()
    pkg = types.ModuleType("ref_fiber_modules")
    pkg.__path__ = [REF_MODULES]
    sys.modules["ref_fiber_modules"] = pkg
    _load("ref_fiber_modules.swin_helpers",
          f"{REF_MODULES}/swin_helpers.py", "ref_fiber_modules")
    swin = _load("ref_fiber_modules.swin_transformer",
                 f"{REF_MODULES}/swin_transformer.py", "ref_fiber_modules")
    roberta = _load("ref_fiber_modules.roberta",
                    f"{REF_MODULES}/roberta.py", "ref_fiber_modules")
    heads = _load("ref_fiber_modules.heads",
                  f"{REF_MODULES}/heads.py", "ref_fiber_modules")
    _cache["mods"] = (swin, roberta, heads)
    return _cache["mods"]
