"""Failure handling, multi-camera support, jit-vs-eager parity."""

import numpy as np
import pytest

from lidar_object_detection_tpu.data import Kitti360Dataset


def test_corrupt_scan_skipped(kitti_root, tmp_path):
    """The reference skips unreadable scans and continues (V1:322-327);
    our loader returns None for them."""
    import shutil

    root = tmp_path / "kitti"
    shutil.copytree(kitti_root + "/calibration", root / "calibration")
    seq = "2013_05_28_drive_0000_sync"
    vdir = root / "data_3d_raw" / seq / "velodyne_points" / "data"
    vdir.mkdir(parents=True)
    bdir = root / "bboxes_3D_cam0"
    bdir.mkdir()
    # corrupt scan: byte count not divisible by 16
    (vdir / "0000000001.bin").write_bytes(b"\x00" * 13)
    (bdir / "BBoxes_1.json").write_text('[{"index": 0, "corners_cam0": ' +
                                        str([[0.0, 0.0, 5.0]] * 8) + "}]")
    ds = Kitti360Dataset(str(root))
    assert ds.load_frame(1) is None
    assert ds.load_frames() == []


def test_missing_boxes_skipped(dataset):
    """Frame 2717 exists (scan+image) but has no bbox JSON -> skipped,
    like the reference's empty-list continue (V1:331-332)."""
    assert 2717 in dataset.frame_ids()
    assert dataset.load_frame(2717) is None
    assert dataset.load_frame(2717, require_boxes=False) is not None
    loaded = {r.frame_id for r in dataset.load_frames()}
    assert 2717 not in loaded and len(loaded) == 19


def test_camera_1_pipeline(kitti_root):
    """cam_id=1 (right rectified camera) end-to-end: different intrinsics
    (P_rect_01 has a baseline term), image_01 images."""
    from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    ds0 = Kitti360Dataset(kitti_root, cam_id=0, shapes=cfg.shapes)
    ds1 = Kitti360Dataset(kitti_root, cam_id=1, shapes=cfg.shapes)
    assert not np.allclose(ds0.transforms.velo_to_rect,
                           ds1.transforms.velo_to_rect)
    # cam0's corner chain is the identity (reference parity); cam1's moves
    # corners into the rectified cam1 frame and back out through cam0.
    assert np.allclose(ds0.transforms.corners_cam0_to_cam, np.eye(4))
    assert not np.allclose(ds1.transforms.corners_cam0_to_cam, np.eye(4))
    # composing the two corner legs must give the cam0->velo chain
    np.testing.assert_allclose(
        ds1.transforms.corners_to_velo @ ds1.transforms.corners_cam0_to_cam,
        ds0.transforms.cam_to_velo, atol=1e-12)
    assert ds1.load_frame(100).image_path.endswith(
        "image_01/data_rect/0000000100.png")
    result1 = FusionPipeline(ds1, cfg).run([100])
    assert len(result1.frames) == 1
    assert result1.summary()["matched"] >= 1

    # corners_velo must be camera-independent: whatever camera projected
    # the boxes, the 3D wireframes live in the one velodyne frame.
    result0 = FusionPipeline(ds0, cfg).run([100])
    velo0 = {p["box_index"]: p["corners_velo"]
             for p in result0.frames[0].matched_pairs}
    velo1 = {p["box_index"]: p["corners_velo"]
             for p in result1.frames[0].matched_pairs}
    common = set(velo0) & set(velo1)
    assert common
    for g in common:
        np.testing.assert_allclose(np.asarray(velo0[g]),
                                   np.asarray(velo1[g]), atol=1e-3)


def test_fuse_frame_jit_eager_parity(dataset, frame100):
    """utils.debug.jit_eager_parity over the full fusion step."""
    import jax.numpy as jnp

    from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
    from lidar_object_detection_tpu.fusion import FusionParams
    from lidar_object_detection_tpu.fusion.associate import fuse_frame
    from lidar_object_detection_tpu.models.stub import StubDetector
    from lidar_object_detection_tpu.utils import jit_eager_parity

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    params = FusionParams.from_config(cfg)
    s = cfg.shapes
    det = StubDetector(dataset.camera).detect_records([frame100])
    pts = np.zeros((s.max_points, 4), np.float32)
    pts[:frame100.num_points] = frame100.points
    pm = np.zeros(s.max_points, bool)
    pm[:frame100.num_points] = True
    corners = np.zeros((s.max_boxes, 8, 3), np.float32)
    corners[:frame100.num_boxes] = frame100.corners_cam0
    bv = np.zeros(s.max_boxes, bool)
    bv[:frame100.num_boxes] = True

    # Compare the decision outputs; float pixel coords may differ by one
    # at exact half-pixel boundaries between jit (fused fma) and eager.
    def decisions(*a):
        out = fuse_frame(*a, params=params)
        return {k: out[k] for k in ("counts", "total_points", "best_box",
                                    "points_inside", "matched",
                                    "box_visible", "point_bits")}

    result = jit_eager_parity(
        decisions,
        jnp.asarray(pts), jnp.asarray(pm),
        jnp.asarray(det["mask_bits"][0]), jnp.asarray(det["det_valid"][0]),
        jnp.asarray(corners), jnp.asarray(bv),
        jnp.asarray(dataset.transforms.velo_to_rect, dtype=jnp.float32),
        jnp.asarray(dataset.transforms.cam_to_velo, dtype=jnp.float32),
        jnp.asarray(dataset.camera.intrinsics, dtype=jnp.float32),
        rtol=1e-6, atol=1e-5)
    assert result["ok"], result["mismatches"]
