import numpy as np

from lidar_object_detection_tpu.data import calib as calib_lib


def test_perspective_camera(kitti_root):
    cam = calib_lib.load_perspective_camera(kitti_root, 0)
    assert cam.width == 1408 and cam.height == 376
    assert cam.intrinsics.shape == (3, 3)
    # fx == fy == 552.554261 for cam0's P_rect (perspective.txt)
    assert np.isclose(cam.intrinsics[0, 0], 552.554261)
    assert np.isclose(cam.intrinsics[1, 1], 552.554261)
    assert np.isclose(cam.intrinsics[2, 2], 1.0)
    assert cam.rect.shape == (4, 4)
    assert np.allclose(cam.rect[3], [0, 0, 0, 1])
    # R_rect is a rotation
    r = cam.rect[:3, :3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_rigid_and_pose(kitti_root):
    import os

    t = calib_lib.load_calibration_rigid(
        os.path.join(kitti_root, "calibration", "calib_cam_to_velo.txt"))
    assert t.shape == (4, 4)
    assert np.allclose(t[3], [0, 0, 0, 1])
    poses = calib_lib.load_calibration_camera_to_pose(
        os.path.join(kitti_root, "calibration", "calib_cam_to_pose.txt"))
    assert set(poses) == {"image_00", "image_01", "image_02", "image_03"}
    for m in poses.values():
        r = m[:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_transform_chain(kitti_root):
    cam = calib_lib.load_perspective_camera(kitti_root, 0)
    chain = calib_lib.build_transform_chain(kitti_root, cam)
    assert np.allclose(chain.velo_to_cam @ chain.cam_to_velo, np.eye(4),
                       atol=1e-10)
    assert np.allclose(chain.velo_to_rect, cam.rect @ chain.velo_to_cam)


def test_cam2image_semantics(kitti_root):
    cam = calib_lib.load_perspective_camera(kitti_root, 0)
    pts = np.array([[0.0, 0.0, 10.0],
                    [1.0, -1.0, 5.0],
                    [0.0, 0.0, 0.0],     # zero depth -> -1e-6
                    [1.0, 1.0, -4.0]]).T  # behind camera
    u, v, depth = cam.cam2image(pts)
    K = cam.intrinsics
    assert u[0] == round(K[0, 2]) and v[0] == round(K[1, 2])
    assert depth[2] == -1e-6
    assert depth[3] == -4.0
    # behind-camera points divide by |z|
    assert u[3] == np.round((K[0, 0] * 1 + K[0, 2] * -4) / 4.0)
    # single-point (3,) input round-trips as scalars
    u1, v1, d1 = cam.cam2image(np.array([0.0, 0.0, 10.0]))
    assert np.isscalar(u1) or u1.ndim == 0
    assert d1 == 10.0


def test_tight_shapes(dataset):
    s = dataset.tight_shapes()
    assert s.max_points == 122880          # max scan 122,183 -> next 4096
    assert s.max_points % 4096 == 0
    batch = dataset.make_batch(dataset.load_frames([100]))
    assert batch.points.shape[1] == 131072  # default shapes unchanged
