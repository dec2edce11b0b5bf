"""Numerical-safety utilities (SURVEY.md section 5: the reference has no
sanitizers; the TPU-native replacements are jit-vs-eager parity checks and
NaN guards rather than thread-race detection -- nothing here is threaded).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np


def jit_eager_parity(fn: Callable, *args, rtol: float = 0.0,
                     atol: float = 0.0, **kwargs) -> Dict[str, Any]:
    """Run ``fn`` jitted and eagerly, compare every output leaf.

    Returns {"ok": bool, "mismatches": [leaf-path, max-abs-diff]}.
    """
    import jax

    with jax.disable_jit():
        eager = fn(*args, **kwargs)
    jitted = jax.jit(fn)(*args, **kwargs)

    mismatches = []
    e_leaves = jax.tree_util.tree_flatten_with_path(eager)[0]
    j_leaves = jax.tree_util.tree_leaves(jitted)
    for (path, ev), jv in zip(e_leaves, j_leaves):
        ea, ja = np.asarray(ev), np.asarray(jv)
        if ea.dtype == bool or np.issubdtype(ea.dtype, np.integer):
            ok = np.array_equal(ea, ja)
            diff = float(np.sum(ea != ja))
        else:
            ok = np.allclose(ea, ja, rtol=rtol, atol=atol, equal_nan=True)
            diff = float(np.max(np.abs(ea - ja))) if ea.size else 0.0
        if not ok:
            mismatches.append((jax.tree_util.keystr(path), diff))
    return {"ok": not mismatches, "mismatches": mismatches}


def assert_finite(tree, name: str = "tree") -> None:
    """Raise if any float leaf contains NaN/Inf (host-side guard)."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad = np.size(arr) - int(np.isfinite(arr).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values")


def checkify_nan_guard(fn: Callable):
    """Wrap a jittable fn with jax.experimental.checkify NaN checking."""
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.nan_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def coordinate_ranges(points, corners=None) -> Dict[str, Any]:
    """The reference's coordinate-system debug dump
    (``debug_coordinate_systems``, V5_ProjectingBBoxes.py:64-85) as data:
    min/max per axis for the cloud and optionally the first box."""
    pts = np.asarray(points)[:, :3]
    out = {"points": {ax: (float(pts[:, i].min()), float(pts[:, i].max()))
                      for i, ax in enumerate("xyz")}}
    if corners is not None and len(corners):
        c = np.asarray(corners)[0]
        out["bbox0"] = {ax: (float(c[:, i].min()), float(c[:, i].max()))
                        for i, ax in enumerate("xyz")}
    return out
