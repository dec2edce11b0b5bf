"""Exact rotated BEV IoU via vectorized Sutherland-Hodgman clipping.

The PointPillars assignment/eval/NMS paths approximate rotated boxes by
their axis-aligned BEV extent (decode.bev_aabb); this op computes the exact
polygon intersection of two rotated rectangles, fully vectorized and
jittable.

The clipping trick that makes it TPU-friendly: instead of compacting the
variable-length vertex list after each halfplane clip (which needs scatters
-- slow on TPU), every invalid output slot is GAP-FILLED with the previous
valid vertex via a cummax + gather.  Duplicate consecutive vertices are
harmless: they create zero-length edges that neither cross later clip
planes nor contribute shoelace area.  The vertex buffer doubles per clip
(4 -> 64 after the four clip edges), so this is sized for eval/NMS-scale
pair counts (up to ~10^5 pairs), not dense anchor assignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box7_to_bev_corners(boxes7):
    """(..., 7) -> (..., 4, 2) BEV corners, counter-clockwise."""
    x, y = boxes7[..., 0], boxes7[..., 1]
    w, l, yaw = boxes7[..., 3], boxes7[..., 4], boxes7[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # local corners (length along +x_local, width along +y_local), CCW
    lx = jnp.stack([l / 2, -l / 2, -l / 2, l / 2], -1)
    ly = jnp.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
    gx = x[..., None] + lx * c[..., None] - ly * s[..., None]
    gy = y[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([gx, gy], -1)


def _cross(d, v):
    return d[..., 0] * v[..., 1] - d[..., 1] * v[..., 0]


def _clip_halfplane(poly, p1, p2):
    """Clip a ring (V, 2) (duplicate-padded) by the halfplane left of the
    directed edge p1 -> p2.  Returns (2V, 2), duplicate-padded."""
    v = poly.shape[0]
    nxt = jnp.roll(poly, -1, axis=0)
    d = p2 - p1
    num = _cross(d[None], poly - p1[None])         # (V,) >=0 == inside
    num_n = _cross(d[None], nxt - p1[None])
    inside = num >= 0
    inside_n = num_n >= 0
    denom = num - num_n
    t = num / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x = poly + (nxt - poly) * t[:, None]

    cand = jnp.stack([x, nxt], axis=1).reshape(2 * v, 2)
    valid = jnp.stack([inside != inside_n, inside_n], axis=1).reshape(2 * v)

    idx = jnp.arange(2 * v)
    marked = jnp.where(valid, idx, -1)
    last = jax.lax.cummax(marked)
    wrap = jnp.max(marked)                          # last valid overall
    fill = jnp.where(last < 0, wrap, last)
    out = cand[jnp.clip(fill, 0, 2 * v - 1)]
    # fully-clipped polygon -> all zeros (area 0)
    return jnp.where(wrap >= 0, out, jnp.zeros_like(out))


def _shoelace(poly):
    nxt = jnp.roll(poly, -1, axis=0)
    return 0.5 * jnp.abs(jnp.sum(
        poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]))


def _pair_intersection_area(corners_a, corners_b):
    """Intersection area of two CCW quads (4, 2) each."""
    poly = corners_a
    for j in range(4):
        poly = _clip_halfplane(poly, corners_b[j], corners_b[(j + 1) % 4])
    return _shoelace(poly)


def rotated_iou_matrix(boxes_a, boxes_b):
    """Exact BEV IoU between rotated boxes.

    Args:
      boxes_a: (N, 7); boxes_b: (M, 7) -- (x, y, z, w, l, h, yaw).
    Returns:
      (N, M) IoU of the rotated BEV rectangles.
    """
    ca = box7_to_bev_corners(boxes_a)               # (N, 4, 2)
    cb = box7_to_bev_corners(boxes_b)               # (M, 4, 2)
    inter = jax.vmap(lambda a: jax.vmap(
        lambda b: _pair_intersection_area(a, b))(cb))(ca)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 1e-9, inter / union, 0.0)


def rotated_iou_matrix_np(boxes_a, boxes_b):
    """NumPy twin of :func:`rotated_iou_matrix` for HOST-side eval paths.

    Same gap-filled Sutherland-Hodgman math, vectorized over all (N, M)
    pairs with NumPy.  Exists because ragged eval code (AP ranking,
    greedy matching over per-frame detection counts) would otherwise
    re-trace the jitted op for every distinct (N, M) -- each retrace is a
    fresh XLA compile, which through the axon relay costs tens of
    seconds.  Parity with the jitted op is pinned in
    tests/test_rotated_iou.py.
    """
    import numpy as np

    a = np.asarray(boxes_a, np.float64).reshape(-1, 7)
    b = np.asarray(boxes_b, np.float64).reshape(-1, 7)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return np.zeros((n, m))

    def corners(bx):
        x, y = bx[:, 0], bx[:, 1]
        w, l, yaw = bx[:, 3], bx[:, 4], bx[:, 6]
        c, s = np.cos(yaw), np.sin(yaw)
        lx = np.stack([l / 2, -l / 2, -l / 2, l / 2], -1)
        ly = np.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
        gx = x[:, None] + lx * c[:, None] - ly * s[:, None]
        gy = y[:, None] + lx * s[:, None] + ly * c[:, None]
        return np.stack([gx, gy], -1)                # (K, 4, 2)

    ca = corners(a)[:, None]                         # (N, 1, 4, 2)
    cb = corners(b)[None]                            # (1, M, 4, 2)
    poly = np.broadcast_to(ca, (n, m, 4, 2)).copy()  # (N, M, V, 2)
    for j in range(4):
        p1 = cb[..., j, :]                           # (1, M, 2)
        p2 = cb[..., (j + 1) % 4, :]
        v = poly.shape[2]
        nxt = np.roll(poly, -1, axis=2)
        d = p2 - p1                                  # (1, M, 2)
        rel = poly - p1[:, :, None, :]
        rel_n = nxt - p1[:, :, None, :]
        num = d[:, :, None, 0] * rel[..., 1] - d[:, :, None, 1] * rel[..., 0]
        num_n = (d[:, :, None, 0] * rel_n[..., 1]
                 - d[:, :, None, 1] * rel_n[..., 0])
        inside = num >= 0
        inside_n = num_n >= 0
        denom = num - num_n
        t = num / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        x = poly + (nxt - poly) * t[..., None]
        cand = np.stack([x, nxt], axis=3).reshape(n, m, 2 * v, 2)
        valid = np.stack([inside != inside_n, inside_n],
                         axis=3).reshape(n, m, 2 * v)
        idx = np.arange(2 * v)
        marked = np.where(valid, idx, -1)
        last = np.maximum.accumulate(marked, axis=2)
        wrap = marked.max(axis=2, keepdims=True)
        fill = np.where(last < 0, wrap, last)
        poly = np.take_along_axis(
            cand, np.clip(fill, 0, 2 * v - 1)[..., None].repeat(2, -1),
            axis=2)
        poly = np.where((wrap >= 0)[..., None], poly, 0.0)
    nxt = np.roll(poly, -1, axis=2)
    inter = 0.5 * np.abs(np.sum(
        poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1], axis=2))
    area_a = (a[:, 3] * a[:, 4])[:, None]
    area_b = (b[:, 3] * b[:, 4])[None, :]
    union = area_a + area_b - inter
    return np.where(union > 1e-9, inter / union, 0.0)
