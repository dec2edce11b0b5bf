"""Kernel parity: erosion vs cv2, mask pack/gather, NMS, Hungarian, scatter."""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.ops import (
    ellipse_kernel_offsets,
    erode_masks,
    erode_packed,
    gather_mask_bits,
    hungarian,
    nms,
    pack_masks,
    scatter_depth_maps,
    unpack_masks,
)

cv2 = pytest.importorskip("cv2")
scipy_opt = pytest.importorskip("scipy.optimize")


# ---------------------------------------------------------------- erosion

def test_ellipse_kernel_matches_cv2():
    for k in (3, 5, 7):
        cv_kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        ours = np.zeros((k, k), np.uint8)
        for dy, dx in ellipse_kernel_offsets(k):
            ours[dy + k // 2, dx + k // 2] = 1
        np.testing.assert_array_equal(ours, cv_kernel)


@pytest.mark.parametrize("ksize,iters", [(3, 1), (3, 2), (5, 1)])
def test_erosion_parity_with_cv2(rng, ksize, iters):
    masks = (rng.random((7, 48, 96)) > 0.6).astype(np.float32)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    oracle = []
    for m in masks:
        m8 = (m * 255).astype(np.uint8)           # cvs_erosion.py:101-103
        e = cv2.erode(m8, kernel, iterations=iters)
        oracle.append(e.astype(np.float32) / 255.0)
    oracle = np.stack(oracle) > 0.5

    got = np.asarray(erode_masks(jnp.asarray(masks), ksize, iters))
    np.testing.assert_array_equal(got, oracle)


def test_erosion_all_planes_at_once(rng):
    masks = (rng.random((32, 32, 64)) > 0.5)
    bits = pack_masks(jnp.asarray(masks))
    eroded_bits = erode_packed(bits, 3, 1)
    per_plane = np.stack([
        np.asarray(erode_masks(jnp.asarray(masks[i:i + 1]), 3, 1))[0]
        for i in range(32)])
    np.testing.assert_array_equal(
        np.asarray(unpack_masks(eroded_bits, 32)), per_plane)


# ---------------------------------------------------------------- masks

def test_pack_unpack_roundtrip(rng):
    masks = rng.random((32, 20, 40)) > 0.5
    bits = pack_masks(masks)
    assert bits.dtype == np.uint32
    np.testing.assert_array_equal(np.asarray(unpack_masks(bits, 32)), masks)
    # jax path too
    bits_j = pack_masks(jnp.asarray(masks))
    np.testing.assert_array_equal(np.asarray(bits_j), bits)


def test_gather_mask_bits(rng):
    d, h, w, p = 8, 30, 50, 200
    masks = rng.random((d, h, w)) > 0.5
    bits = jnp.asarray(pack_masks(masks))
    u = rng.integers(-5, w + 5, p)
    v = rng.integers(-5, h + 5, p)
    valid = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (rng.random(p) > 0.2)
    got = np.asarray(gather_mask_bits(bits, jnp.asarray(u.astype(np.float64)),
                                      jnp.asarray(v.astype(np.float64)),
                                      jnp.asarray(valid), d))
    for i in range(d):
        oracle = np.zeros(p, bool)
        for j in range(p):
            if valid[j]:
                oracle[j] = masks[i, v[j], u[j]]
        np.testing.assert_array_equal(got[i], oracle)


# ---------------------------------------------------------------- NMS

def oracle_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[pos + 1:]:
            if suppressed[j]:
                continue
            b1, b2 = boxes[i], boxes[j]
            xi, yi = max(b1[0], b2[0]), max(b1[1], b2[1])
            xa, ya = min(b1[2], b2[2]), min(b1[3], b2[3])
            inter = max(0, xa - xi) * max(0, ya - yi)
            union = ((b1[2] - b1[0]) * (b1[3] - b1[1])
                     + (b2[2] - b2[0]) * (b2[3] - b2[1]) - inter)
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return keep


def test_nms_parity(rng):
    n = 64
    centers = rng.uniform(0, 200, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
    scores = rng.random(n)
    idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.ones(n, bool), 0.5, 16)
    got = list(np.asarray(idx)[np.asarray(keep)])
    oracle = oracle_nms(boxes, scores, 0.5)[:16]
    assert got == oracle


def test_nms_respects_valid_mask(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60.0]])
    scores = np.array([0.9, 0.8, 0.7])
    valid = np.array([False, True, True])
    idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(valid), 0.5, 4)
    got = list(np.asarray(idx)[np.asarray(keep)])
    assert got == [1, 2]


# ---------------------------------------------------------------- Hungarian

@pytest.mark.parametrize("n", [1, 2, 5, 16, 32])
def test_hungarian_matches_scipy_cost(rng, n):
    for trial in range(5):
        cost = rng.random((n, n)).astype(np.float32)
        col4row = np.asarray(hungarian(jnp.asarray(cost)))
        # valid permutation
        assert sorted(col4row.tolist()) == list(range(n))
        rows, cols = scipy_opt.linear_sum_assignment(cost)
        got = cost[np.arange(n), col4row].sum()
        want = cost[rows, cols].sum()
        assert np.isclose(got, want, atol=1e-5), (trial, got, want)


@pytest.mark.parametrize("r,c", [(3, 10), (8, 8), (1, 5), (32, 384)])
def test_hungarian_rectangular_matches_scipy(rng, r, c):
    cost = rng.random((r, c)).astype(np.float32)
    col4row = np.asarray(hungarian(jnp.asarray(cost)))
    assert len(set(col4row.tolist())) == r      # distinct columns
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    got = cost[np.arange(r), col4row].sum()
    assert np.isclose(got, cost[rows, cols].sum(), atol=1e-4)


def test_hungarian_with_masks(rng):
    # 3 real rows, 5 real cols inside an 8x8 padded problem
    n, d, g = 8, 3, 5
    cost = np.full((n, n), 0.0, np.float32)
    real = rng.random((d, g)).astype(np.float32)
    cost[:d, :g] = real
    row_mask = np.zeros(n, bool)
    row_mask[:d] = True
    col_mask = np.zeros(n, bool)
    col_mask[:g] = True
    col4row = np.asarray(hungarian(jnp.asarray(cost),
                                   jnp.asarray(row_mask),
                                   jnp.asarray(col_mask)))[:d]
    rows, cols = scipy_opt.linear_sum_assignment(real)
    got = real[np.arange(d), col4row].sum()
    assert np.isclose(got, real[rows, cols].sum(), atol=1e-5)
    assert all(c < g for c in col4row)


# ------------------------------------------------- fixed-trip LAP (serving)

@pytest.mark.parametrize("r,c", [(1, 5), (3, 10), (8, 8), (32, 64),
                                 (32, 384)])
def test_lap_matches_scipy_cost(rng, r, c):
    from lidar_object_detection_tpu.ops import lap

    for trial in range(3):
        cost = rng.random((r, c)).astype(np.float32)
        col4row = np.asarray(lap(jnp.asarray(cost)))
        assert (col4row >= 0).all()
        assert len(set(col4row.tolist())) == r      # distinct columns
        rows, cols = scipy_opt.linear_sum_assignment(cost)
        got = cost[np.arange(r), col4row].sum()
        want = cost[rows, cols].sum()
        assert np.isclose(got, want, atol=1e-5), (trial, got, want)


def test_lap_with_masks_matches_scipy(rng):
    from lidar_object_detection_tpu.ops import lap

    n, d, g = 16, 5, 9
    cost = np.zeros((n, n), np.float32)
    real = rng.random((d, g)).astype(np.float32)
    cost[:d, :g] = real
    row_mask = np.zeros(n, bool)
    row_mask[:d] = True
    col_mask = np.zeros(n, bool)
    col_mask[:g] = True
    col4row = np.asarray(lap(jnp.asarray(cost), jnp.asarray(row_mask),
                             jnp.asarray(col_mask)))[:d]
    rows, cols = scipy_opt.linear_sum_assignment(real)
    got = real[np.arange(d), col4row].sum()
    assert np.isclose(got, real[rows, cols].sum(), atol=1e-5)
    assert all(cc < g for cc in col4row)


def test_lap_vs_exact_on_v5_shapes(rng):
    """The serving solver must produce the same assignments as the
    dynamic-while_loop oracle on V5-shaped problems: 32 dets x 384 boxes,
    scores in [0, 1], sparse validity."""
    from lidar_object_detection_tpu.ops import lap

    for trial in range(3):
        cost = (1.0 - rng.random((32, 384))).astype(np.float32)
        row_mask = rng.random(32) < 0.4
        col_mask = rng.random(384) < 0.1
        a = np.asarray(lap(jnp.asarray(cost), jnp.asarray(row_mask),
                           jnp.asarray(col_mask)))
        h = np.asarray(hungarian(jnp.asarray(cost), jnp.asarray(row_mask),
                                 jnp.asarray(col_mask)))
        real_rows = np.nonzero(row_mask)[0]
        np.testing.assert_array_equal(a[real_rows], h[real_rows])


def test_hungarian_match_lap_agrees_with_exact(dataset, frame100):
    """End-to-end V5 gate parity between the two solvers on real data."""
    from lidar_object_detection_tpu.fusion import hungarian_match
    from lidar_object_detection_tpu.models.stub import StubDetector

    det = StubDetector(dataset.camera).detect_records([frame100])
    corners = np.zeros((384, 8, 3), np.float32)
    corners[:frame100.num_boxes] = frame100.corners_cam0
    bv = np.zeros(384, bool)
    bv[:frame100.num_boxes] = True
    K = jnp.asarray(dataset.camera.intrinsics, jnp.float32)
    args = (jnp.asarray(det["boxes"][0]), jnp.asarray(det["det_valid"][0]),
            jnp.asarray(corners), jnp.asarray(bv), K)
    idx_a, score_a, iou_a = hungarian_match(*args, solver="lap")
    idx_e, score_e, iou_e = hungarian_match(*args, solver="exact")
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_e))
    np.testing.assert_allclose(np.asarray(score_a), np.asarray(score_e),
                               atol=1e-5)


# ---------------------------------------------------------------- scatter

def test_scatter_depth_maps(rng):
    h, w, p, d = 20, 30, 500, 4
    u = rng.integers(0, w, p)
    v = rng.integers(0, h, p)
    depth = rng.uniform(1, 30, p)
    car_mask = rng.random((d, p)) > 0.7
    valid = rng.random(p) > 0.1
    got = np.asarray(scatter_depth_maps(
        jnp.asarray(u.astype(np.float64)), jnp.asarray(v.astype(np.float64)),
        jnp.asarray(depth), jnp.asarray(car_mask), jnp.asarray(valid), h, w))
    for i in range(d):
        oracle = np.zeros((h, w))
        for j in range(p):
            if car_mask[i, j] and valid[j]:
                oracle[v[j], u[j]] = max(oracle[v[j], u[j]], depth[j])
        np.testing.assert_allclose(got[i], oracle)


def test_nms_nan_scores_dropped(rng):
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110.0]])
    scores = np.array([np.nan, 0.8, 0.6])
    idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.ones(3, bool), 0.5, 4)
    got = list(np.asarray(idx)[np.asarray(keep)])
    assert got == [1, 2]           # finite detections survive a NaN peer


def test_pallas_nms_parity(rng):
    from lidar_object_detection_tpu.ops.pallas_nms import pallas_nms

    n = 64
    centers = rng.uniform(0, 200, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
    scores = rng.random(n).astype(np.float32)
    scores[5] = np.nan
    valid = rng.random(n) > 0.1
    ref_idx, ref_keep = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.5, 16)
    got_idx, got_keep = pallas_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.asarray(valid), 0.5, 16,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got_keep), np.asarray(ref_keep))
    kept = np.asarray(ref_keep)
    np.testing.assert_array_equal(np.asarray(got_idx)[kept],
                                  np.asarray(ref_idx)[kept])
