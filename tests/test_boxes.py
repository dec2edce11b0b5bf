"""Box geometry parity vs NumPy oracles mirroring the reference scripts."""

import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.geom import boxes as boxes_lib


def oracle_oriented_inside(points, corners):
    """oriented_point_in_bbox semantics (V1:142-183)."""
    v1 = corners[1] - corners[0]
    v2 = corners[3] - corners[0]
    v3 = corners[4] - corners[0]
    rel = points - corners[0]
    p1 = rel @ v1 / (v1 @ v1)
    p2 = rel @ v2 / (v2 @ v2)
    p3 = rel @ v3 / (v3 @ v3)
    return ((p1 >= 0) & (p1 <= 1) & (p2 >= 0) & (p2 <= 1)
            & (p3 >= 0) & (p3 <= 1))


def make_box(center, size, yaw):
    """Oriented box corners in the reference order: 0-3 bottom (c0, c0+w,
    c0+l+w, c0+l), 4-7 top."""
    w, l, h = size
    cx, cy, cz = center
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    base = np.array([
        [-w / 2, -l / 2, -h / 2],
        [w / 2, -l / 2, -h / 2],
        [w / 2, l / 2, -h / 2],
        [-w / 2, l / 2, -h / 2],
        [-w / 2, -l / 2, h / 2],
        [w / 2, -l / 2, h / 2],
        [w / 2, l / 2, h / 2],
        [-w / 2, l / 2, h / 2],
    ])
    return base @ R.T + np.array(center)


def test_oriented_inside_parity(rng):
    boxes = np.stack([
        make_box((5, 2, 0), (2, 4.5, 1.6), 0.3),
        make_box((-3, 8, 1), (1.8, 4.0, 1.5), -1.2),
        make_box((10, -5, 0.5), (2.2, 5.0, 1.7), 2.9),
    ])
    points = rng.uniform(-15, 15, size=(5000, 3))
    inside = np.asarray(boxes_lib.points_in_oriented_boxes(
        jnp.asarray(points), jnp.asarray(boxes)))
    for g in range(boxes.shape[0]):
        np.testing.assert_array_equal(inside[:, g],
                                      oracle_oriented_inside(points, boxes[g]))
    # sanity: each box contains some of the uniform points
    assert inside.sum() > 0


def test_aabb_parity(rng):
    boxes = np.stack([make_box((0, 0, 0), (2, 4, 2), 0.0)])
    points = rng.uniform(-3, 3, size=(1000, 3))
    inside = np.asarray(boxes_lib.points_in_aabb(
        jnp.asarray(points), jnp.asarray(boxes)))[:, 0]
    lo, hi = boxes[0].min(0), boxes[0].max(0)
    oracle = np.all((points >= lo) & (points <= hi), axis=1)
    np.testing.assert_array_equal(inside, oracle)
    # for an axis-aligned box both tests agree
    oriented = np.asarray(boxes_lib.points_in_oriented_boxes(
        jnp.asarray(points), jnp.asarray(boxes)))[:, 0]
    np.testing.assert_array_equal(inside, oriented)


def test_transform_corners_parity(dataset, frame100):
    corners = frame100.corners_cam0
    T = dataset.transforms.cam_to_velo
    got = np.asarray(boxes_lib.transform_corners(jnp.asarray(corners),
                                                 jnp.asarray(T)))
    homo = np.concatenate([corners, np.ones((*corners.shape[:2], 1))], -1)
    oracle = np.einsum("ij,gcj->gci", T, homo)[..., :3]
    np.testing.assert_allclose(got, oracle, atol=1e-9)


def test_visibility_filter_parity(dataset, frame100):
    """filter_visible_bboxes (V1:96-115) oracle parity on real frame 100."""
    cam = dataset.camera
    K = cam.intrinsics
    vis = np.asarray(boxes_lib.corners_visibility(
        jnp.asarray(frame100.corners_cam0), jnp.asarray(K),
        cam.width, cam.height))
    oracle = []
    for corners in frame100.corners_cam0:
        u, v, d = cam.cam2image(corners.T)
        ok = (d > 0.1) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        oracle.append(ok.sum() >= 2)
    np.testing.assert_array_equal(vis, np.asarray(oracle))
    assert 0 < vis.sum() <= len(oracle)


def test_project_boxes_to_2d_parity(dataset, frame100):
    """project_3d_bbox_to_2d (V5:215-252) oracle parity."""
    cam = dataset.camera
    info = {k: np.asarray(val) for k, val in boxes_lib.project_boxes_to_2d(
        jnp.asarray(frame100.corners_cam0),
        jnp.asarray(cam.intrinsics)).items()}
    for g, corners in enumerate(frame100.corners_cam0):
        u, v, d = cam.cam2image(corners.T)
        pos = d > 0
        if not pos.any():
            assert not info["valid"][g]
            continue
        assert info["valid"][g]
        np.testing.assert_allclose(
            info["bbox"][g],
            [u[pos].min(), v[pos].min(), u[pos].max(), v[pos].max()])
        np.testing.assert_allclose(info["avg_depth"][g], d[pos].mean(),
                                   rtol=1e-12)
        np.testing.assert_allclose(
            info["area"][g],
            (u[pos].max() - u[pos].min()) * (v[pos].max() - v[pos].min()))


def test_iou_matrix_parity(rng):
    def oracle_iou(b1, b2):
        xi, yi = max(b1[0], b2[0]), max(b1[1], b2[1])
        xa, ya = min(b1[2], b2[2]), min(b1[3], b2[3])
        if xa <= xi or ya <= yi:
            return 0.0
        inter = (xa - xi) * (ya - yi)
        a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
        a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
        union = a1 + a2 - inter
        return inter / union if union > 0 else 0.0

    a = rng.uniform(0, 100, (12, 2))
    boxes_a = np.concatenate([a, a + rng.uniform(1, 50, (12, 2))], -1)
    b = rng.uniform(0, 100, (7, 2))
    boxes_b = np.concatenate([b, b + rng.uniform(1, 50, (7, 2))], -1)
    got = np.asarray(boxes_lib.iou_2d_matrix(jnp.asarray(boxes_a),
                                             jnp.asarray(boxes_b)))
    for i in range(12):
        for j in range(7):
            assert np.isclose(got[i, j], oracle_iou(boxes_a[i], boxes_b[j]))
