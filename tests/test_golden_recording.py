"""Drift-pinning golden test over recorded detections.

VERDICT r1 item 4: real yolo11x-seg weights are unobtainable in this
environment (zero egress; no checkpoint in the image), so absolute parity
with the reference's master_car_statistics.csv.xlsx rows cannot be
reproduced here -- that gap is documented in BASELINE.md/ROADMAP.md.  What
this test pins instead: a recorded detection set replayed through
``StubDetector.load_recording`` (the same path a real-weights recording
would use, models/stub.py) must keep producing bit-identical fusion
statistics.  Any numerical drift in projection, masks, erosion, counting,
or the CSV math fails this test.
"""

import dataclasses
import json
import os

import numpy as np

from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
from lidar_object_detection_tpu.data import Kitti360Dataset
from lidar_object_detection_tpu.models.stub import StubDetector
from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_recorded_detections_reproduce_pinned_statistics(kitti_root):
    with open(os.path.join(FIXTURES,
                           "stub_detections_v1_expected.json")) as f:
        expected = json.load(f)
    frames = expected["frames"]
    det = StubDetector.load_recording(
        os.path.join(FIXTURES, "stub_detections_v1.npz"), frames)

    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    res = FusionPipeline(ds, cfg).run(frames, detections=det)
    got = [dataclasses.asdict(r) for r in res.csv_rows]
    assert len(got) == len(expected["rows"])
    for g, e in zip(got, expected["rows"]):
        for k, v in e.items():
            if isinstance(v, float):
                assert abs(g[k] - v) < 1e-9, (k, g, e)
            else:
                assert g[k] == v, (k, g, e)


def test_recording_reorder_replay(kitti_root):
    """load_recording re-orders to the requested frame list."""
    path = os.path.join(FIXTURES, "stub_detections_v1.npz")
    fwd = StubDetector.load_recording(path, [100, 250, 570])
    rev = StubDetector.load_recording(path, [570, 100, 250])
    np.testing.assert_array_equal(rev["mask_bits"][1], fwd["mask_bits"][0])
    np.testing.assert_array_equal(rev["boxes"][0], fwd["boxes"][2])
