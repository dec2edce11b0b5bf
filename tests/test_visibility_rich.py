"""corners_visibility_rich parity with the secondtest.py oracle semantics."""

import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.geom.boxes import (
    REASON_ALL_BEHIND, REASON_NO_INTERSECTION, REASON_TOO_SMALL,
    REASON_VALID, corners_visibility_rich)


def oracle(corners, cam, min_in_view=4, depth_range=(0.1, 100.0),
           min_area=100.0):
    """Mirror of is_bbox_in_camera_view (secondtest.py:277-359)."""
    u, v, d = cam.cam2image(corners.T)
    vd = (d >= depth_range[0]) & (d <= depth_range[1])
    if vd.sum() == 0:
        return False, "all_behind_camera"
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height) & vd
    if in_img.sum() < min_in_view:
        uu, vv = u[vd], v[vd]
        intersects = not (uu.max() < 0 or uu.min() >= cam.width
                          or vv.max() < 0 or vv.min() >= cam.height)
        if not intersects:
            return False, "no_intersection"
    if vd.sum() >= 2:
        area = (u[vd].max() - u[vd].min()) * (v[vd].max() - v[vd].min())
        if area < min_area:
            return False, "too_small"
    return True, "valid"


REASON_NAME = {REASON_VALID: "valid", REASON_ALL_BEHIND: "all_behind_camera",
               REASON_NO_INTERSECTION: "no_intersection",
               REASON_TOO_SMALL: "too_small"}


def test_rich_visibility_real_frame(dataset, frame100):
    cam = dataset.camera
    keep, reason = corners_visibility_rich(
        jnp.asarray(frame100.corners_cam0), jnp.asarray(cam.intrinsics),
        cam.width, cam.height)
    keep = np.asarray(keep)
    reason = np.asarray(reason)
    for g, corners in enumerate(frame100.corners_cam0):
        ok, why = oracle(corners, cam)
        assert keep[g] == ok, (g, why, REASON_NAME[int(reason[g])])
        assert REASON_NAME[int(reason[g])] == why, g
    assert keep.sum() >= 1


def test_rich_visibility_synthetic(dataset):
    cam = dataset.camera
    K = cam.intrinsics

    def box_at(z, size=2.0):
        base = np.array([[0, 0, 0], [0, size / 2, 0], [size, 0, 0],
                         [size, size / 2, 0], [0, 0, size], [0, size / 2, size],
                         [size, 0, size], [size, size / 2, size]], float)
        return base + np.array([0.0, 0.0, z])

    boxes = np.stack([
        box_at(10.0),            # visible
        box_at(-20.0),           # fully behind
        box_at(95.0, size=0.2),  # tiny projected area
    ])
    keep, reason = corners_visibility_rich(
        jnp.asarray(boxes), jnp.asarray(K), cam.width, cam.height)
    keep, reason = np.asarray(keep), np.asarray(reason)
    assert keep[0] and reason[0] == REASON_VALID
    assert not keep[1] and reason[1] == REASON_ALL_BEHIND
    assert not keep[2] and reason[2] == REASON_TOO_SMALL
