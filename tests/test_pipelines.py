"""Pipeline-level tests: every public entry point on the real fixture with
the stub detector, CSV outputs, depth maps, kitti2d, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lidar_object_detection_tpu.config import PipelineVersion
from lidar_object_detection_tpu.pipelines import (
    csv_eval, run_kitti2d_eval, v1_pointwise, v3_erosion, v4_iou,
    v5_projected)


FRAMES = [100, 250]   # keep CPU compile/runtime small


def test_v1_pointwise_runs(kitti_root):
    pipe = v1_pointwise(kitti_root)
    result = pipe.run(FRAMES)
    assert len(result.frames) == 2
    assert result.summary()["matched"] >= 1
    for fr in result.frames:
        for pair in fr.matched_pairs:
            assert pair["corners_velo"].shape == (8, 3)
            assert pair["point_count"] >= 10   # min_points gate


def test_v3_matches_fewer_or_equal_points_than_v1(kitti_root):
    r1 = v1_pointwise(kitti_root).run(FRAMES)
    r3 = v3_erosion(kitti_root).run(FRAMES)
    t1 = sum(r.total_points for r in r1.csv_rows)
    t3 = sum(r.total_points for r in r3.csv_rows)
    assert 0 < t3 <= t1   # eroded masks only shrink point sets


def test_v4_greedy_and_v5_hungarian(kitti_root):
    r4 = v4_iou(kitti_root).run(FRAMES)
    r5 = v5_projected(kitti_root).run(FRAMES)
    # stub detections are GT projections -> nearly all should match
    n4 = sum(len(f.matched_pairs) for f in r4.frames)
    matched5 = [p for f in r5.frames for p in f.matched_pairs
                if not p.get("unmatched")]
    unmatched5 = [p for f in r5.frames for p in f.matched_pairs
                  if p.get("unmatched")]
    assert n4 >= 1 and len(matched5) >= 1
    for pair in matched5:
        assert pair["score"] >= 0.3 and pair["iou"] >= 0.15
    # V5 renders every unmatched GT box in gray (V5:408-414)
    assert unmatched5 and all(p["color"] == (0.7, 0.7, 0.7)
                              for p in unmatched5)
    total_boxes = sum(f.num_visible_boxes for f in r5.frames)
    assert len(matched5) + len(unmatched5) == total_boxes


def test_csv_eval_end_to_end(kitti_root, tmp_path):
    csv_path = str(tmp_path / "master_car_statistics.csv")
    # csv_eval runs all frames; restrict via a pipeline instance instead
    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)
    pipe.run(FRAMES, master_csv=csv_path)
    with open(csv_path) as f:
        header = f.readline().strip()
    assert header == ("frame,car_id,matched_bbox_id,total_points,"
                      "points_inside_bbox,points_outside_bbox,"
                      "inside_percentage,outside_percentage,is_matched,"
                      "timestamp")
    from lidar_object_detection_tpu.eval import analyze_master_csv
    stats = analyze_master_csv(csv_path)
    assert stats["total_frames"] == 2
    assert stats["matched"] >= 1


def test_depth_maps(kitti_root):
    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.DEPTH_MAPS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)
    maps = list(pipe.depth_maps([100]))
    assert maps
    for frame_id, car_id, dm, seg in maps:
        assert frame_id == 100 and car_id >= 1
        assert dm.shape == (376, 1408)
        assert dm.max() > 0
        assert (dm >= 0).all() and dm.max() < cfg.depth_max + 1e-5
        # the overlay panel must be the real segmented image, not black
        # (reference overlays depth on the seg image,
        # seg_with_pointcloud.py:173-194)
        assert seg is not None and seg.shape == (376, 1408, 3)
        assert seg.any()


def test_depth_map_figure_overlay(kitti_root, tmp_path):
    """The exported figure's lower panel blends depth over the segmented
    image -- non-black pixels must survive outside the depth-covered
    region (golden check for the CLI wiring fix)."""
    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline
    from lidar_object_detection_tpu.viz.overlay import depth_map_figure

    cfg = FusionConfig.for_version(PipelineVersion.DEPTH_MAPS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)
    frame_id, car_id, dm, seg = next(iter(pipe.depth_maps([100])))
    path = str(tmp_path / f"{frame_id:010d},depth_map_car_{car_id:02d}_.png")
    depth_map_figure(dm, seg, car_id, frame_id, path)
    black = str(tmp_path / "black.png")
    depth_map_figure(dm, np.zeros_like(seg), car_id, frame_id, black)
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.int32)
    ref = np.asarray(Image.open(black).convert("RGB"), np.int32)
    # the lower panel must blend the real segmented image: a large share
    # of pixels differs from the black-image figure (the old CLI bug)
    assert (np.abs(img - ref).sum(axis=-1) > 10).mean() > 0.1


def test_kitti2d_pipeline(tmp_path):
    """Synthesized KITTI_Selection tree + injected detections."""
    from PIL import Image

    root = tmp_path / "sel"
    for d in ("images", "labels", "calib"):
        (root / d).mkdir(parents=True)
    img = np.zeros((370, 1224, 3), np.uint8)
    Image.fromarray(img).save(root / "images" / "000001.png")
    (root / "labels" / "000001.txt").write_text(
        "Car 100 100 200 200 12.5\nCar 500 120 640 240 8.0\n")
    K = np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]])
    np.savetxt(root / "calib" / "000001.txt", K)

    dets = {"000001": np.array([[102, 98, 198, 203], [900, 50, 1000, 150]])}

    result = run_kitti2d_eval(
        str(root), detect_fn=lambda im, _d=dets: _d["000001"],
        output_dir=str(tmp_path / "out"))
    ev = result.evaluations["000001"]
    assert ev.tp == 1 and ev.fp == 1 and ev.fn == 1
    assert result.totals["precision"] == 0.5
    txt = (tmp_path / "out" / "results_000001.png.txt").read_text()
    assert txt.startswith("CAR ID: 1, YOLO distance:")
    assert "GT distance: 12.50m" in txt


def test_cli_run(kitti_root, tmp_path):
    # drives the real entry point, including the --platform backend pin
    # (the deployment sitecustomize ignores JAX_PLATFORMS once jax is up)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "lidar_object_detection_tpu",
         "--platform", "cpu",
         "run", "--dataset", str(kitti_root), "--version", "v1_pointwise",
         "--frames", "100", "--output", str(tmp_path), "--export-ply"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr
    assert "processed 1 frames" in out.stdout
    ply = tmp_path / "frame_0000000100.ply"
    assert ply.exists()
    head = ply.read_text().split("\n")[:3]
    assert head[0] == "ply"


def test_streaming_fusion(kitti_root, tmp_path, monkeypatch):
    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset, kitti360
    from lidar_object_detection_tpu.eval.store import MetricStore
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)
    # the batch runner's reference result, BEFORE scan reads are forbidden
    batch_run = pipe.run([100])

    # stream() must feed the device from the prefetcher's buffers only --
    # any scan re-read through the Python loaders is a bug
    def _no_reread(*a, **k):
        raise AssertionError("stream() re-read a scan outside the prefetcher")
    monkeypatch.setattr(kitti360, "load_velodyne_scan", _no_reread)
    monkeypatch.setattr(Kitti360Dataset, "load_frame", _no_reread)

    store = MetricStore(str(tmp_path / "stream.jsonl"))
    seen = []
    for fid, rows in pipe.stream([100, 250, 360], chunk=2, store=store):
        seen.append(fid)
    assert sorted(seen) == [100, 250, 360]
    assert store.frames == [100, 250, 360]
    # streaming (with host-side compaction) equals the batch runner exactly
    stream_rows = [r for r in store.rows() if r["frame"] == 100]
    batch_rows = [r for r in batch_run.csv_rows if r.frame == 100]
    assert len(stream_rows) == len(batch_rows) > 0
    for sr, br in zip(stream_rows, batch_rows):
        assert sr["total_points"] == br.total_points
        assert sr["points_inside_bbox"] == br.points_inside_bbox


def test_streaming_error_propagates(kitti_root, monkeypatch):
    """A producer-side IO failure must raise in the consumer, not end the
    stream early as if the run completed (silent short CSVs)."""
    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)

    def _boom(fid):
        raise OSError(f"synthetic box-load failure for frame {fid}")
    monkeypatch.setattr(ds, "load_boxes", _boom)
    with pytest.raises(OSError, match="synthetic box-load failure"):
        for _ in pipe.stream([100], chunk=1):
            pass


def test_streaming_abandoned_generator_unblocks_producer(kitti_root):
    """Closing the stream() generator early must let the producer thread
    exit instead of wedging on the bounded queue forever."""
    import threading
    import time as _time

    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)
    before = {t.ident for t in threading.enumerate()}
    gen = pipe.stream([100, 250, 360], chunk=1)
    next(gen)           # producer is now running ahead
    gen.close()         # abandon mid-stream
    deadline = _time.monotonic() + 10.0
    while _time.monotonic() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        _time.sleep(0.1)
    assert not extra, f"producer thread leaked: {extra}"


def test_compaction_exactness(dataset, frame100):
    """Host-culled points give bit-identical fusion outputs: the cull is
    conservative (margin + depth slack) and the device's exact validity
    masks the leftovers."""
    import jax.numpy as jnp

    from lidar_object_detection_tpu.config import FusionConfig
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.data.native import load_scan_compacted
    from lidar_object_detection_tpu.fusion import FusionParams, fuse_frame
    from lidar_object_detection_tpu.models.stub import StubDetector
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    cfg = FusionConfig.for_version(PipelineVersion.V3_EROSION)
    params = FusionParams.from_config(cfg)
    s = cfg.shapes
    pipe = FusionPipeline(
        Kitti360Dataset(dataset.root, shapes=s), cfg)
    spec = pipe.compaction_spec()
    det = StubDetector(dataset.camera).detect_records([frame100])
    calib = (jnp.asarray(dataset.transforms.velo_to_rect, jnp.float32),
             jnp.asarray(dataset.transforms.cam_to_velo, jnp.float32),
             jnp.asarray(dataset.camera.intrinsics, jnp.float32))
    corners = np.zeros((s.max_boxes, 8, 3), np.float32)
    corners[:frame100.num_boxes] = frame100.corners_cam0
    bv = np.zeros(s.max_boxes, bool)
    bv[:frame100.num_boxes] = True

    def run(pts, pv):
        out = fuse_frame(jnp.asarray(pts), jnp.asarray(pv),
                         jnp.asarray(det["mask_bits"][0]),
                         jnp.asarray(det["det_valid"][0]),
                         jnp.asarray(corners), jnp.asarray(bv),
                         *calib, params)
        return {k: np.asarray(out[k]) for k in
                ("counts", "total_points", "best_box", "points_inside",
                 "matched")}

    full_pts = np.zeros((s.max_points, 4), np.float32)
    full_pts[:frame100.num_points] = frame100.points
    full_pv = np.zeros(s.max_points, bool)
    full_pv[:frame100.num_points] = True
    cpts, cpv, n = load_scan_compacted(
        dataset.scan_path(frame100.frame_id), spec)
    assert 0 < n < frame100.num_points // 2   # the cull actually culls
    ref = run(full_pts, full_pv)
    got = run(cpts, cpv)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_convert_weights_cli_roundtrip(tmp_path):
    """convert-weights: synthetic state dict -> orbax -> loadable by
    _build_detector (the --weights dir path)."""
    import torch

    from lidar_object_detection_tpu.models.yolo.model import Yolo11, YoloConfig
    from tests.test_yolo import _synthesize_torch_state_dict
    import jax
    import jax.numpy as jnp

    cfg = YoloConfig(scale="n")
    model = Yolo11(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = _synthesize_torch_state_dict(variables)
    sd_path = str(tmp_path / "sd.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               sd_path)

    from lidar_object_detection_tpu.pipelines.cli import main
    rc = main(["convert-weights", "--state-dict", sd_path,
               "--output", str(tmp_path / "ckpt"), "--scale", "n",
               "--image-shape", "64", "64"])
    assert rc == 0

    import orbax.checkpoint as ocp
    from lidar_object_detection_tpu.parallel.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    restored = mgr._mgr.restore(
        mgr.latest_step(),
        args=ocp.args.StandardRestore({"variables": variables}))
    k = np.asarray(restored["variables"]["params"]["layer0"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        k, np.transpose(sd["model.0.conv.weight"], (2, 3, 1, 0)))


def test_stub_recording_roundtrip(dataset, tmp_path):
    from lidar_object_detection_tpu.models.stub import StubDetector

    stub = StubDetector(dataset.camera)
    records = dataset.load_frames([100, 250])
    det = stub.detect_records(records)
    path = str(tmp_path / "rec.npz")
    StubDetector.save_recording(path, det, np.asarray([100, 250]))
    # replay reordered
    replay = StubDetector.load_recording(path, frame_ids=[250, 100])
    np.testing.assert_array_equal(replay["mask_bits"][1], det["mask_bits"][0])
    np.testing.assert_array_equal(replay["boxes"][0], det["boxes"][1])


def test_run_empty_frames(kitti_root):
    result = v1_pointwise(kitti_root).run([999999])
    assert result.frames == [] and result.csv_rows == []


def test_cli_build_detector_resolves_guarded_serving(tmp_path):
    """The CLI's detector builder resolves the committed sidecar's
    guarded-shrink serving point, and the explicit flags override it
    (pipelines/cli.py _build_detector -> models/yolo/serving.py)."""
    import argparse

    from lidar_object_detection_tpu.pipelines.cli import _build_detector

    class _Cam:
        height, width = 376, 1408

    class _DS:
        camera = _Cam()

    ckpt = "checkpoints/yolo11n_seg_distill.msgpack"
    base = dict(detector="yolo", weights=ckpt, yolo_scale=None, conf=None,
                mask_thr=None, mask_floor=None, mask_min_pixels=None)
    det = _build_detector(argparse.Namespace(**base), _DS())
    assert det.params.mask_threshold == 0.99        # sidecar serving block
    assert det.params.mask_threshold_floor == 0.5
    assert det.params.mask_min_pixels == 200

    det2 = _build_detector(
        argparse.Namespace(**{**base, "mask_thr": 0.9, "mask_floor": 0.6,
                              "mask_min_pixels": 50}), _DS())
    assert det2.params.mask_threshold == 0.9        # explicit flags win
    assert det2.params.mask_threshold_floor == 0.6
    assert det2.params.mask_min_pixels == 50
