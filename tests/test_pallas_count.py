"""Pallas fused inside-count kernel parity (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.geom.boxes import points_in_oriented_boxes
from lidar_object_detection_tpu.ops.pallas_count import pallas_inside_counts
from tests.test_boxes import make_box


def reference_counts(points, car_mask_f, corners, box_mask):
    inside = points_in_oriented_boxes(jnp.asarray(points),
                                      jnp.asarray(corners),
                                      jnp.asarray(box_mask))
    return np.asarray(car_mask_f @ np.asarray(inside, np.float32))


def test_pallas_counts_match_reference(rng):
    p, d, g, tile = 2048, 8, 16, 512
    points = rng.uniform(-20, 20, (p, 3)).astype(np.float32)
    car = (rng.random((d, p)) > 0.6).astype(np.float32)
    corners = np.stack([
        make_box(rng.uniform(-10, 10, 3), (2, 4.5, 1.7),
                 rng.uniform(-3, 3)) for _ in range(g)]).astype(np.float32)
    box_mask = rng.random(g) > 0.25

    got = np.asarray(pallas_inside_counts(
        jnp.asarray(points), jnp.asarray(car), jnp.asarray(corners),
        jnp.asarray(box_mask), tile=tile, interpret=True))
    want = reference_counts(points, car, corners, box_mask)
    np.testing.assert_array_equal(got, want)
    assert got.sum() > 0


def test_pallas_counts_real_frame(dataset, frame100):
    from lidar_object_detection_tpu.geom.boxes import transform_corners

    p = 16384
    points = frame100.points[:p, :3].astype(np.float32)
    corners = np.asarray(transform_corners(
        jnp.asarray(frame100.corners_cam0.astype(np.float32)),
        jnp.asarray(dataset.transforms.cam_to_velo.astype(np.float32))))
    g = 64
    corners_pad = np.zeros((g, 8, 3), np.float32)
    corners_pad[:len(corners)] = corners
    box_mask = np.zeros(g, bool)
    box_mask[:len(corners)] = True
    rng = np.random.default_rng(1)
    car = (rng.random((4, p)) > 0.5).astype(np.float32)

    got = np.asarray(pallas_inside_counts(
        jnp.asarray(points), jnp.asarray(car), jnp.asarray(corners_pad),
        jnp.asarray(box_mask), tile=4096, interpret=True))
    want = reference_counts(points, car, corners_pad, box_mask)
    np.testing.assert_array_equal(got, want)
