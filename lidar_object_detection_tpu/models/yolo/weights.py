"""ultralytics .pt checkpoint -> Flax variables converter.

The reference loads ``yolo11x-seg.pt`` / ``yolo11x.pt`` through ultralytics
(V1_BBox_Pointwise_filtering.py:14, ObjectDetection_final.py:114).  This
module maps a torch *state dict* (name -> array; obtain it with
``torch.load(path)`` on a raw state-dict file, or
``torch.load(path)['model'].state_dict()`` where ultralytics is installed)
onto the Flax module tree of
:class:`lidar_object_detection_tpu.models.yolo.model.Yolo11`.

The Flax module names were chosen to make this a token-wise translation:

  flax ``params/layer2/m0/cv1/conv/kernel``  <-  ``model.2.m.0.cv1.conv.weight``
  flax ``batch_stats/layer0/bn/mean``        <-  ``model.0.bn.running_mean``
  flax ``params/head/detect/cv3_0_0_0/dw/conv/kernel``
                                             <-  ``model.23.cv3.0.0.0.conv.weight``

Transforms: conv kernels (out, in/g, kh, kw) -> (kh, kw, in/g, out); the
Proto transposed-conv kernel keeps the torch (in, out, 2, 2) layout
(see ``TransposedUpsample2x``); BN weight/bias -> scale/bias and
running stats -> batch_stats.  The constant DFL projection
(``model.23.dfl.conv.weight`` == arange(16)) has no learnable Flax
counterpart -- decoding bakes it in -- and is checked, not copied.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


HEAD_INDEX = 23  # Detect/Segment is layer 23 in the YOLO11 graph


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Translate a flax variable path (collection-less) to the torch key
    stem and the leaf kind.  Returns (torch_stem, leaf)."""
    *mods, leaf = path
    tokens = []
    for seg in mods:
        if seg == "head":
            tokens.append(f"model.{HEAD_INDEX}")
        elif seg == "detect" or seg == "dw":
            continue  # flattened in torch (Segment inherits Detect; DWConv is Conv)
        elif seg.startswith("layer"):
            tokens.append(f"model.{seg[5:]}")
        elif re.fullmatch(r"(cv\d|m)_?\d.*", seg) and "_" in seg:
            head, *idx = seg.split("_")
            tokens.append(".".join([head, *idx]))
        elif re.fullmatch(r"m\d+", seg):
            tokens.append(f"m.{seg[1:]}")
        elif seg in ("ffn0", "ffn1"):
            tokens.append(f"ffn.{seg[3]}")
        else:
            tokens.append(seg)
    return ".".join(tokens), leaf


def _leaf_key_and_transform(stem: str, leaf: str, collection: str):
    """Map (stem, leaf name, collection) -> (torch key, transform fn)."""
    ident = lambda x: x
    conv_t = lambda x: np.transpose(x, (2, 3, 1, 0))
    if collection == "batch_stats":
        return f"{stem}.running_{'mean' if leaf == 'mean' else 'var'}", ident
    if leaf == "kernel":
        if stem.endswith("upsample"):
            return f"{stem}.weight", ident          # (in, out, 2, 2) verbatim
        return f"{stem}.weight", conv_t
    if leaf == "scale":
        return f"{stem}.weight", ident              # BN gamma
    if leaf == "bias":
        return f"{stem}.bias", ident
    if leaf == "mean":
        return f"{stem}.running_mean", ident
    if leaf == "var":
        return f"{stem}.running_var", ident
    raise KeyError(f"unhandled leaf {leaf} at {stem}")


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables) -> dict:
    """Fill a Flax variables template with torch weights.

    Args:
      state_dict: torch name -> array (numpy or torch tensors).
      variables: template from ``Yolo11().init(...)`` (shapes must match).

    Returns:
      New variables pytree with converted weights.

    Raises:
      KeyError / ValueError listing any unmapped or shape-mismatched
      entries -- conversion is all-or-nothing.
    """
    import jax

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    problems = []

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for keypath, value in flat:
        names = tuple(getattr(k, "key", getattr(k, "idx", None))
                      for k in keypath)
        collection, *path = names
        stem, leaf = _flax_path_to_torch_key(tuple(path))
        try:
            torch_key, transform = _leaf_key_and_transform(
                stem, leaf, collection)
        except KeyError as e:
            problems.append(str(e))
            continue
        if torch_key not in sd:
            problems.append(f"missing in state dict: {torch_key} "
                            f"(for flax {'/'.join(map(str, names))})")
            continue
        arr = transform(sd[torch_key])
        if arr.shape != value.shape:
            problems.append(
                f"shape mismatch {torch_key}: torch {arr.shape} vs "
                f"flax {value.shape}")
            continue
        used.add(torch_key)
        out[names] = arr.astype(np.asarray(value).dtype)

    leftovers = [k for k in sd
                 if k not in used
                 and not k.startswith(f"model.{HEAD_INDEX}.dfl.")
                 and "num_batches_tracked" not in k]
    if leftovers:
        problems.append(f"unconsumed torch keys: {sorted(leftovers)[:10]}"
                        f" (+{max(0, len(leftovers) - 10)} more)")
    if problems:
        raise ValueError("weight conversion failed:\n  "
                         + "\n  ".join(problems[:40]))

    def rebuild(keypath, value):
        names = tuple(getattr(k, "key", getattr(k, "idx", None))
                      for k in keypath)
        return out[names]

    return jax.tree_util.tree_map_with_path(rebuild, variables)


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-saved raw state dict (``torch.save(sd, path)``).

    Full ultralytics ``.pt`` checkpoints pickle ultralytics classes and need
    the ultralytics package to unpickle; extract the state dict there and
    re-save it raw for this loader.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path} does not contain a state dict")
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def fold_serving_variables(variables, dtype=None, eps: float = 1e-3):
    """Fold BatchNorm into conv kernels and cast the tree for serving.

    Profiling the serving forward (examples/profile_detector.py, single
    v5e, batch 38) showed the step dominated not by conv FLOPs but by
    *weight traffic*: variables stored f32 are DMA'd and converted to
    bf16 on every call (72% of device op-time in async copies), and each
    BatchNorm recomputes ``rsqrt(var + eps)`` per step.  This transforms
    the variables once at load:

    * every ``ConvBNAct`` pair (a subtree with ``conv`` + ``bn`` children,
      the ultralytics ``Conv``) gets ``w' = w * gamma / sqrt(var + eps)``
      folded into the conv kernel (out-channel axis, grouped convs
      included) and ``b' = beta - mean * gamma / sqrt(var + eps)`` into
      the BN bias, with the running stats reset to the exact-identity
      pair ``mean = 0, var = 1 - eps`` (so ``var + eps == 1`` and the BN
      epilogue degenerates to the per-channel shift XLA fuses into the
      conv);
    * the whole tree (params + batch_stats) is cast to ``dtype``
      (bf16 halves the per-step weight stream; the conv ran in bf16
      before, so the only numeric change is *when* rounding happens:
      after the fold multiply instead of before the BN epilogue).

    The transform is exact in f32 (folds computed in f64-free f32) and
    drift-free at the bf16 level used for serving; the unfolded path
    remains the parity oracle (tests/test_yolo.py).
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                    variables["params"])
    stats = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                   variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        for key, child in p_node.items():
            if not isinstance(child, dict):
                continue
            s_child = s_node.get(key, {}) if isinstance(s_node, dict) else {}
            if "conv" in child and "bn" in child and "bn" in s_child:
                gamma = child["bn"]["scale"]
                beta = child["bn"]["bias"]
                mean = s_child["bn"]["mean"]
                var = s_child["bn"]["var"]
                t = gamma / np.sqrt(var + eps)                 # (out,)
                child["conv"]["kernel"] = child["conv"]["kernel"] * t
                child["bn"]["scale"] = np.ones_like(gamma)
                child["bn"]["bias"] = beta - mean * t
                s_child["bn"]["mean"] = np.zeros_like(mean)
                s_child["bn"]["var"] = np.full_like(
                    var, np.float32(1.0) - np.float32(eps))
            walk(child, s_child)

    walk(params, stats)
    cast = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), tree)
    out = dict(variables)
    out["params"] = cast(params)
    if stats:
        out["batch_stats"] = cast(stats)
    return out
