"""Bitwise-parity tests of the jitted projection against the float64 NumPy
oracle (the reference's V1:340-344 + devkit cam2image semantics)."""

import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.geom import projection as proj


def numpy_project_oracle(points, velo_to_rect, K):
    """Reference-semantics oracle: homogeneous 4x4 transform, intrinsic
    multiply, divide by |depth| (zeros -> -1e-6), round."""
    homo = points.astype(np.float64).copy()
    homo[:, 3] = 1.0
    cam = (velo_to_rect @ homo.T).T[:, :3]
    prj = (K @ cam.T)
    depth = prj[2].copy()
    depth[depth == 0] = -1e-6
    u = np.round(prj[0] / np.abs(depth))
    v = np.round(prj[1] / np.abs(depth))
    return u, v, depth


def test_projection_parity_real_scan(dataset, frame100):
    pts = frame100.points.astype(np.float64)
    T = dataset.transforms.velo_to_rect
    K = dataset.camera.intrinsics

    uo, vo, do = numpy_project_oracle(pts, T, K)
    u, v, d = proj.project_velo_points(jnp.asarray(pts), jnp.asarray(T),
                                       jnp.asarray(K))
    np.testing.assert_array_equal(np.asarray(u), uo)
    np.testing.assert_array_equal(np.asarray(v), vo)
    np.testing.assert_allclose(np.asarray(d), do, rtol=0, atol=1e-9)


def test_validity_mask_parity(dataset, frame100):
    pts = frame100.points.astype(np.float64)
    T = dataset.transforms.velo_to_rect
    K = dataset.camera.intrinsics
    W, H = dataset.camera.width, dataset.camera.height

    uo, vo, do = numpy_project_oracle(pts, T, K)
    oracle_valid = ((uo >= 0) & (uo < W) & (vo >= 0) & (vo < H)
                    & (do > 0) & (do < 50))

    u, v, d = proj.project_velo_points(jnp.asarray(pts), jnp.asarray(T),
                                       jnp.asarray(K))
    valid = proj.point_validity(u, v, d, W, H, 0.0, 50.0)
    np.testing.assert_array_equal(np.asarray(valid), oracle_valid)
    # sanity: a real scan should have a healthy number of valid points
    assert oracle_valid.sum() > 10000


def test_round_half_even_matches_numpy():
    x = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5, 3.49999, 3.5])
    np.testing.assert_array_equal(np.asarray(jnp.round(x)),
                                  np.round(np.asarray(x)))
