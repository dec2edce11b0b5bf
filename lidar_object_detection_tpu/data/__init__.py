from lidar_object_detection_tpu.data.calib import (
    CameraCalibration,
    load_calibration_rigid,
    load_calibration_camera_to_pose,
    load_perspective_camera,
    build_transform_chain,
)
from lidar_object_detection_tpu.data.kitti360 import (
    Kitti360Dataset,
    FrameBatch,
    load_velodyne_scan,
    load_bounding_boxes,
)
from lidar_object_detection_tpu.data.poses import (
    PoseTable,
    SweepAggregate,
    aggregate_sweeps,
    load_cam0_to_world,
    load_pose_table,
    load_poses_txt,
    velo_to_world,
)

__all__ = [
    "CameraCalibration",
    "load_calibration_rigid",
    "load_calibration_camera_to_pose",
    "load_perspective_camera",
    "build_transform_chain",
    "Kitti360Dataset",
    "FrameBatch",
    "load_velodyne_scan",
    "load_bounding_boxes",
    "PoseTable",
    "SweepAggregate",
    "aggregate_sweeps",
    "load_cam0_to_world",
    "load_pose_table",
    "load_poses_txt",
    "velo_to_world",
]
