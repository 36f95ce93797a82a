"""Fuzzy multi-format checkpoint loading.

TPU-native equivalent of the reference's DetectronCheckpointer stack
(utils/checkpoint.py:114-160, utils/model_serialization.py:22-208,
utils/c2_model_loading.py): load a foreign checkpoint — a torch ``.pth``,
a Caffe2/Detectron ``.pkl`` blob dict, or an ``.npz`` — and merge it
into a flax param tree by longest-suffix key matching, reshaping
relative-position-bias tables on resolution mismatch.

Key alignment follows model_serialization.align_and_update_state_dicts:
for every model key, pick the loaded key that is the LONGEST suffix
match; ignore non-matches; on shape mismatch either resize (bias
tables) or skip with a report.  Torch-layout tensors are converted by
rank + name heuristics (Dense kernels transposed, conv kernels
OIHW->HWIO, norm ``weight``->``scale``), mirroring
utils/checkpoint_convert.py's explicit mappings.
"""

from __future__ import annotations

import pickle
import warnings
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

# leading wrappers stripped only at the START of a key (a naive
# replace-anywhere corrupts e.g. "some.submodule.weight" -> "some.sub");
# the tower names are removed anywhere, matching the reference's
# align_and_update_state_dicts (model_serialization.py:41-44).
LEADING_PREFIXES = ("module.", "model.", "state_dict.")
ANYWHERE_SUBSTRINGS = ("text_transformer.", "vit_model.")


# ---------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------
def load_foreign_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth / .pt (torch), .pkl (Caffe2 blobs) or .npz checkpoint
    into a flat {dotted_key: np.ndarray} dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    elif path.endswith(".pkl"):
        # Detectron/C2 format: pickled dict, often {"blobs": {...}}
        # (ref c2_model_loading.py:131-140, checkpoint.py:133-141)
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if "blobs" in data:
            data = data["blobs"]
        if "model" in data and isinstance(data["model"], dict):
            data = data["model"]
        sd = {k: np.asarray(v) for k, v in data.items()
              if not k.endswith("_momentum")}
    else:
        import torch
        try:
            # Safe path first: tensors-only deserialization.
            data = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # Older/pickled formats (Lightning, Detectron surgeries) need
            # full unpickling, which executes code embedded in the file —
            # only do so for checkpoints you trust.
            warnings.warn(
                f"{path}: falling back to weights_only=False torch.load; "
                "this trusts arbitrary code in the checkpoint file.")
            data = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("state_dict", "model", "module"):
            if isinstance(data, dict) and key in data and isinstance(
                    data[key], dict):
                data = data[key]
                break
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in data.items()}
    out = {}
    for k, v in sd.items():
        stripped = True
        while stripped:
            stripped = False
            for p in LEADING_PREFIXES:
                if k.startswith(p):
                    k = k[len(p):]
                    stripped = True
        for p in ANYWHERE_SUBSTRINGS:
            k = k.replace(p, "")
        out[k] = v
    return out


# ---------------------------------------------------------------------
# flax tree <-> flat paths
# ---------------------------------------------------------------------
def flatten_params(tree: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            flat.update(flatten_params(v, path))
        else:
            flat[path] = v
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------------
# torch-layout -> flax-layout heuristics
# ---------------------------------------------------------------------
def adapt_tensor(model_key: str, model_val: np.ndarray,
                 loaded_val: np.ndarray,
                 loaded_key: str = "") -> Optional[np.ndarray]:
    """Convert a torch-layout tensor to the flax layout expected at
    model_key; None if no consistent interpretation exists.

    A torch ``.weight`` landing on a flax ``kernel`` is ALWAYS
    transposed/permuted (Linear is (out, in), conv is OIHW) — shape
    equality alone is ambiguous for square kernels, and skipping the
    transpose would silently load every C-to-C projection sideways."""
    lv = np.asarray(loaded_val)
    mshape = tuple(model_val.shape)
    torch_weight_to_kernel = (model_key.rsplit(".", 1)[-1] == "kernel"
                              and loaded_key.endswith(".weight"))
    if lv.ndim == 2 and torch_weight_to_kernel:
        return lv.T if lv.T.shape == mshape else None
    if lv.ndim == 4 and torch_weight_to_kernel:
        perm = lv.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        return perm if perm.shape == mshape else None
    if lv.shape == mshape:
        return lv
    if lv.ndim == 2 and lv.T.shape == mshape:
        return lv.T                      # torch Linear weight (out, in)
    if lv.ndim == 4 and lv.transpose(2, 3, 1, 0).shape == mshape:
        return lv.transpose(2, 3, 1, 0)  # torch conv OIHW -> HWIO
    return None


def _is_bias_table(key: str, reshape_keys: Tuple[str, ...]) -> bool:
    return any(k in key for k in reshape_keys)


# ---------------------------------------------------------------------
# alignment
# ---------------------------------------------------------------------
def align_and_update(params: Dict, loaded: Mapping[str, np.ndarray],
                     reshape_keys: Tuple[str, ...] = (
                         "relative_position_bias_table",),
                     ) -> Tuple[Dict, Dict[str, List[str]]]:
    """Merge `loaded` into a copy of flax `params` by longest-suffix key
    matching (model_serialization.py:22-80 semantics).

    Loaded dotted keys are compared against dot-joined flax paths with
    common torch/flax synonyms normalized (weight~kernel/scale,
    ``.``-separated indices).  Returns (new_params, report) where report
    has "matched", "skipped_shape", "unmatched_model" lists."""
    flat = flatten_params(params)
    report: Dict[str, List[str]] = {"matched": [], "skipped_shape": [],
                                    "unmatched_model": []}

    def variants(loaded_key: str, model_key: str) -> List[str]:
        """Loaded-key spellings comparable against this model key.
        torch "layers.0.blocks.1.x" vs flax "layers_0.blocks_1.x";
        torch ".weight" -> flax ".kernel" (Dense/Conv) / ".scale"
        (LayerNorm) — but never onto other leaf names (a ".weight"
        must not shadow a ".bias" leaf)."""
        tail = model_key.rsplit(".", 1)[-1]
        under = _underscore_indices(loaded_key)
        v = [loaded_key, under]
        if tail in ("kernel", "scale") and loaded_key.endswith(".weight"):
            v.append(loaded_key[:-len(".weight")] + "." + tail)
            v.append(under[:-len(".weight")] + "." + tail)
        return v

    new_flat = dict(flat)
    for mkey in sorted(flat):
        best: Tuple[int, Optional[str]] = (0, None)
        for lkey in loaded:
            for cand in variants(lkey, mkey):
                if mkey == cand or mkey.endswith("." + cand):
                    if len(cand) > best[0]:
                        best = (len(cand), lkey)
        if best[1] is None:
            report["unmatched_model"].append(mkey)
            continue
        lkey = best[1]
        adapted = adapt_tensor(mkey, flat[mkey], loaded[lkey],
                               loaded_key=lkey)
        if adapted is None and _is_bias_table(mkey, reshape_keys):
            from fiber_tpu.utils.checkpoint_convert import (
                resize_relative_position_bias_table)
            src = np.asarray(loaded[lkey])
            dst_len = int(np.asarray(flat[mkey]).shape[0])
            w_src = int(round((np.sqrt(src.shape[0]) + 1) / 2))
            w_dst = int(round((np.sqrt(dst_len) + 1) / 2))
            if (2 * w_src - 1) ** 2 == src.shape[0] and (
                    2 * w_dst - 1) ** 2 == dst_len:
                adapted = resize_relative_position_bias_table(
                    src, w_src, w_dst)
        if adapted is None:
            report["skipped_shape"].append(f"{mkey} <- {lkey}")
            continue
        new_flat[mkey] = adapted.astype(np.asarray(flat[mkey]).dtype)
        report["matched"].append(f"{mkey} <- {lkey}")
    return unflatten_params(new_flat), report


def _underscore_indices(key: str) -> str:
    """"layers.0.blocks.1.attn.qkv.weight" -> "layers_0.blocks_1.attn.qkv.weight"."""
    parts = key.split(".")
    out: List[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return ".".join(out)


def load_into_params(params: Dict, path: str, **kwargs
                     ) -> Tuple[Dict, Dict[str, List[str]]]:
    """One-call fuzzy load: read any supported format and merge."""
    return align_and_update(params, load_foreign_state_dict(path), **kwargs)
