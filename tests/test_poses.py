"""Pose parsing + multi-sweep aggregation (data/poses.py).

The pose files are reference fixtures the devkit reads but the reference
scripts never use (SURVEY.md §2.2); these tests pin our first-party
parsers against the raw file contents and the devkit's composition
convention, and check the aggregation semantics end to end on the
bundled drive-0000 sample.
"""

import os

import numpy as np
import pytest

from lidar_object_detection_tpu.data import calib as calib_lib
from lidar_object_detection_tpu.data.kitti360 import load_velodyne_scan
from lidar_object_detection_tpu.data.poses import (
    PoseTable, aggregate_sweeps, load_cam0_to_world, load_pose_table,
    load_poses_txt, velo_to_world)

DRIVE = "data_poses/2013_05_28_drive_0000_sync"


@pytest.fixture(scope="module")
def pose_paths(kitti_root):
    return (os.path.join(kitti_root, DRIVE, "poses.txt"),
            os.path.join(kitti_root, DRIVE, "cam0_to_world.txt"))


def test_parsers_shape_and_rigidity(pose_paths):
    for loader, path in zip((load_poses_txt, load_cam0_to_world),
                            pose_paths):
        frames, mats = loader(path)
        assert frames.ndim == 1 and mats.shape == (len(frames), 4, 4)
        assert (np.diff(frames) > 0).all()          # sorted, unique
        # rigid transforms: orthonormal rotation, det +1, last row [0,0,0,1]
        R = mats[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-4)
        assert (np.linalg.det(R) > 0.99).all()
        np.testing.assert_array_equal(
            mats[:, 3], np.tile([0.0, 0.0, 0.0, 1.0], (len(frames), 1)))


def test_first_row_values_match_file(pose_paths):
    """Bit-level pin of the parser against the first data row."""
    frames, mats = load_poses_txt(pose_paths[0])
    assert frames[0] == 1
    np.testing.assert_allclose(
        mats[0, 0], [-0.3800985754, -0.9246782129, -0.0222547866,
                     846.2467971])
    frames_c, mats_c = load_cam0_to_world(pose_paths[1])
    assert frames_c[0] == 1
    np.testing.assert_allclose(
        mats_c[0, 0], [-0.938425, 1.471056e-02, -0.345172, 8.456584e+02])


def test_cam0_to_world_composition_convention(kitti_root, pose_paths):
    """cam0_to_world == pose @ cam_to_pose[image_00] @ R_rect_00^T.

    This is the devkit convention the module docstring documents; the
    residual is the files' 6-significant-digit precision.
    """
    frames_p, poses = load_poses_txt(pose_paths[0])
    frames_c, c2w = load_cam0_to_world(pose_paths[1])
    cam2pose = calib_lib.load_calibration_camera_to_pose(
        os.path.join(kitti_root, "calibration",
                     "calib_cam_to_pose.txt"))["image_00"]
    cam = calib_lib.load_perspective_camera(kitti_root, 0)
    rect = cam.rect
    common = np.intersect1d(frames_p, frames_c)[:20]
    assert len(common) >= 10
    for f in common:
        p = poses[np.searchsorted(frames_p, f)]
        c = c2w[np.searchsorted(frames_c, f)]
        composed = p @ cam2pose @ rect.T
        np.testing.assert_allclose(composed, c, atol=2e-3)


def test_pose_table_lookup(pose_paths):
    table = PoseTable.from_file(pose_paths[1])
    f0 = int(table.frames[0])
    np.testing.assert_array_equal(table.lookup(f0), table.transforms[0])
    # nearest: a frame below the first snaps to the first
    np.testing.assert_array_equal(table.lookup(f0 - 1), table.transforms[0])
    # nearest between two keyframes picks the closer one
    f1 = int(table.frames[1])
    mid_lo = f0 + (f1 - f0) // 3
    np.testing.assert_array_equal(table.lookup(mid_lo),
                                  table.transforms[0 if (mid_lo - f0) <=
                                                   (f1 - mid_lo) else 1])
    with pytest.raises(KeyError):
        table.lookup(f0 - 1, nearest=False)


def test_aggregate_target_sweep_unchanged(dataset):
    """The target frame's own points come back numerically unchanged."""
    frames = dataset.frame_ids()[:1]
    agg = aggregate_sweeps(dataset, frames[0], frames)
    raw = load_velodyne_scan(dataset.scan_path(frames[0]))
    n = len(raw)
    assert agg.num_valid == n
    np.testing.assert_allclose(agg.points[:n, :3], raw[:, :3], atol=1e-5)
    np.testing.assert_array_equal(agg.points[:n, 3], raw[:, 3])
    assert (agg.sweep_id[:n] == 0).all()
    assert not agg.point_valid[n:].any()


def test_aggregate_multi_sweep_alignment(dataset):
    """3-sweep aggregate: all points land, and the composed transforms
    are exact (ego-origin displacement matches the world-frame poses)."""
    frames = dataset.frame_ids()[:3]
    agg = aggregate_sweeps(dataset, frames[0], frames)
    total = sum(len(load_velodyne_scan(dataset.scan_path(f)))
                for f in frames)
    assert agg.num_valid == min(total, len(agg.points))
    assert agg.points.shape[0] % 4096 == 0
    v = agg.point_valid
    # each sweep contributes, ids are per-source
    for s in range(3):
        assert (agg.sweep_id[v] == s).any()
    # exact composition check: each source sweep's sensor origin, mapped
    # into target coordinates, must sit exactly where the world-frame ego
    # displacement says (the sample frames are 75-130 m apart), and stay
    # at road height in the target's velodyne frame.
    table = load_pose_table(dataset.root, dataset.seq)
    v2r = dataset.transforms.velo_to_rect
    t_tgt = velo_to_world(table.lookup(frames[0]), v2r)
    t_tgt_inv = np.linalg.inv(t_tgt)
    for s, f in enumerate(frames):
        t_src = velo_to_world(table.lookup(f), v2r)
        origin_in_tgt = (t_tgt_inv @ t_src)[:3, 3]
        world_dist = np.linalg.norm(t_src[:3, 3] - t_tgt[:3, 3])
        assert abs(np.linalg.norm(origin_in_tgt) - world_dist) < 1e-3
        assert abs(origin_in_tgt[2]) < 3.0  # flat drive: sensor height
        # the sweep's points cluster around its own sensor origin
        p = agg.points[v & (agg.sweep_id == s)][:, :3]
        med = np.median(np.linalg.norm(p - origin_in_tgt, axis=1))
        assert med < 40.0


def test_aggregate_truncation_and_padding(dataset):
    frames = dataset.frame_ids()[:2]
    agg = aggregate_sweeps(dataset, frames[0], frames, max_points=4096)
    assert agg.points.shape == (4096, 4)
    assert agg.num_valid == 4096
    big = aggregate_sweeps(dataset, frames[0], frames, max_points=1 << 18)
    assert big.points.shape[0] == 1 << 18
    assert (big.sweep_id[~big.point_valid] == -1).all()


def test_load_pose_table_by_root(kitti_root):
    table = load_pose_table(kitti_root, seq=0)
    assert len(table) > 100
