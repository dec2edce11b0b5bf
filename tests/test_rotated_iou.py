"""Exact rotated BEV IoU vs a NumPy Sutherland-Hodgman oracle."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from lidar_object_detection_tpu.ops.rotated_iou import (
    box7_to_bev_corners, rotated_iou_matrix)

# eager polygon clipping dispatches op-by-op (~15 s/test on 1 CPU core);
# the jitted wrapper compiles once per input shape and is compile-cached
riou = jax.jit(rotated_iou_matrix)


def np_corners(b):
    x, y, w, l, yaw = b[0], b[1], b[3], b[4], b[6]
    c, s = np.cos(yaw), np.sin(yaw)
    out = []
    for lx, ly in [(l / 2, w / 2), (-l / 2, w / 2), (-l / 2, -w / 2),
                   (l / 2, -w / 2)]:
        out.append([x + lx * c - ly * s, y + lx * s + ly * c])
    return np.asarray(out)


def cross2(a, b):
    return a[0] * b[1] - a[1] * b[0]


def np_clip(poly, p1, p2):
    d = p2 - p1
    out = []
    n = len(poly)
    for i in range(n):
        v, vn = poly[i], poly[(i + 1) % n]
        num, num_n = cross2(d, v - p1), cross2(d, vn - p1)
        ins, ins_n = num >= 0, num_n >= 0
        if ins != ins_n:
            t = num / (num - num_n)
            out.append(v + (vn - v) * t)
        if ins_n:
            out.append(vn)
    return np.asarray(out)


def np_inter_area(ca, cb):
    poly = ca
    for j in range(4):
        if len(poly) == 0:
            return 0.0
        poly = np_clip(poly, cb[j], cb[(j + 1) % 4])
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def np_riou(a, b):
    ca, cb = np_corners(a), np_corners(b)
    inter = np_inter_area(ca, cb)
    union = a[3] * a[4] + b[3] * b[4] - inter
    return inter / union if union > 0 else 0.0


def box(x, y, w, l, yaw):
    return np.asarray([x, y, 0.0, w, l, 1.5, yaw], np.float32)


def test_analytic_cases():
    a = box(0, 0, 2, 2, 0.0)
    cases = [
        (box(0, 0, 2, 2, 0.0), 1.0),                       # identical
        (box(10, 0, 2, 2, 0.0), 0.0),                      # disjoint
        (box(1, 0, 2, 2, 0.0), 2 / 6),                     # half overlap
        # square rotated 45 deg inside itself: inter = 8(sqrt2-1)=3.3137
        (box(0, 0, 2, 2, np.pi / 4), 8 * (np.sqrt(2) - 1)
         / (8 - 8 * (np.sqrt(2) - 1))),
    ]
    for b, want in cases:
        got = float(riou(jnp.asarray(a[None]),
                         jnp.asarray(b[None]))[0, 0])
        assert got == pytest.approx(want, abs=1e-4), (b, got, want)


def test_matches_numpy_oracle(rng):
    boxes_a = np.stack([box(rng.uniform(-10, 10), rng.uniform(-10, 10),
                            rng.uniform(1, 3), rng.uniform(2, 6),
                            rng.uniform(-np.pi, np.pi)) for _ in range(12)])
    boxes_b = np.stack([box(rng.uniform(-10, 10), rng.uniform(-10, 10),
                            rng.uniform(1, 3), rng.uniform(2, 6),
                            rng.uniform(-np.pi, np.pi)) for _ in range(9)])
    got = np.asarray(riou(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(12):
        for j in range(9):
            want = np_riou(boxes_a[i], boxes_b[j])
            assert got[i, j] == pytest.approx(want, abs=2e-4), (i, j)


def test_corners_ccw():
    c = np.asarray(box7_to_bev_corners(jnp.asarray(
        box(1, 2, 2, 4, 0.7)[None])))[0]
    # shoelace signed area positive == CCW
    x, y = c[:, 0], c[:, 1]
    signed = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert signed > 0
    assert np.asarray(c).shape == (4, 2)


def test_evaluate_bev_exact_mode():
    from lidar_object_detection_tpu.pipelines.pointpillars import evaluate_bev

    gt = np.stack([box(5, 5, 2, 4, 0.8), box(-5, -5, 2, 4, 0.0)])
    det = {"boxes7": np.stack([box(5, 5, 2, 4, 0.8), box(20, 20, 2, 4, 0.0)]),
           "valid": np.asarray([True, True])}
    res = evaluate_bev(det, gt, np.asarray([True, True]), exact=True)
    assert res.matched == 1 and res.total_gt == 2 and res.total_det == 2


def test_rotated_nms_in_decode():
    """Rotated NMS suppresses a heavily-overlapping rotated duplicate that
    the AABB approximation would keep or drop differently."""
    from lidar_object_detection_tpu.models.pointpillars import (
        PillarsConfig, PillarGridConfig, anchor_grid)
    from lidar_object_detection_tpu.models.pointpillars.decode import (
        decode_predictions)

    cfg = PillarsConfig(grid=PillarGridConfig(
        x_range=(0.0, 20.48), y_range=(-10.24, 10.24), pillar_size=0.32))
    h, w, a = cfg.grid.ny // 2, cfg.grid.nx // 2, cfg.num_anchors
    outputs = {
        "cls": np.full((h, w, a, 1), -9.0, np.float32),
        "box": np.zeros((h, w, a, 7), np.float32),
        "dir": np.zeros((h, w, a, 2), np.float32),
    }
    # two confident anchors at the SAME cell, both anchor rotations ->
    # same center, yaw 0 vs pi/2: crossed 1.6x3.9 rectangles,
    # inter = 1.6^2 = 2.56, union = 2*6.24 - 2.56 -> rotated IoU ~0.258
    outputs["cls"][10, 12, 0, 0] = 4.0
    outputs["cls"][10, 12, 1, 0] = 3.0
    def decode(thr):
        return jax.jit(lambda o: decode_predictions(
            o, cfg, score_threshold=0.3, iou_threshold=thr,
            rotated_nms=True))({k: jnp.asarray(v)
                                for k, v in outputs.items()})

    det = decode(0.2)
    assert int(np.asarray(det["valid"]).sum()) == 1   # second one suppressed
    det2 = decode(0.3)
    assert int(np.asarray(det2["valid"]).sum()) == 2  # 0.258 < 0.3 survives


def test_numpy_twin_matches_jitted(rng):
    """rotated_iou_matrix_np (host eval path) == the jitted op."""
    from lidar_object_detection_tpu.ops.rotated_iou import (
        rotated_iou_matrix_np)
    a = np.stack([rng.uniform(-10, 10, 7) for _ in range(17)]).astype(
        np.float32)
    b = np.stack([rng.uniform(-10, 10, 7) for _ in range(23)]).astype(
        np.float32)
    for arr in (a, b):
        arr[:, 3:6] = np.abs(arr[:, 3:6]) + 0.5     # positive sizes
    jitted = np.asarray(riou(jnp.asarray(a), jnp.asarray(b)))
    twin = rotated_iou_matrix_np(a, b)
    np.testing.assert_allclose(twin, jitted, atol=2e-5)
    # empty operands
    assert rotated_iou_matrix_np(np.zeros((0, 7)), b).shape == (0, 23)
    assert rotated_iou_matrix_np(a, np.zeros((0, 7))).shape == (17, 0)
