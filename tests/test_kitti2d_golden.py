"""Golden-file parity against the reference's shipped KITTI-2D outputs.

The reference repo bundles its actual run artifacts: 20
``results_<image>.png.txt`` files (ObjectDetection_final.py:194 writer).
Real yolo11 weights and the KITTI_Selection images/calibration are not in
this environment, but each line carries the full (YoloBB, GT_BB) pair plus
the IoU the reference computed and both distances -- enough to verify,
against the reference's own published numbers:

* our 2D IoU (``geom.boxes.iou_2d_matrix``) reproduces every printed IoU,
* our first-match-wins pairing (``eval.kitti2d.evaluate_image``) reproduces
  the reference's (det, gt) assignment and CAR ID numbering,
* our result-line writer reproduces every file byte-for-byte.

The monocular distances themselves need the per-image intrinsics from
KITTI_Selection/calib (not shipped); they are replayed as recorded values
through the writer, which still pins the exact float formatting.
"""

import glob
import os
import re

import numpy as np
import pytest

RESULTS_DIR = os.path.join(
    "/root/reference", "ObjectDetection_YOLO", "objectiondetection",
    "results")

LINE_RE = re.compile(
    r"CAR ID: (\d+), YOLO distance: ([\d.]+|inf)m, "
    r"GT distance: ([\d.]+|inf)m, "
    r"IoU Between YoloBB \[([\d, .-]+)\] and GT_BB \[([\d, .-]+)\]: "
    r"([\d.]+)")


def _parse(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            m = LINE_RE.fullmatch(line)
            assert m, f"unparseable reference line: {line!r}"
            rows.append({
                "car_id": int(m.group(1)),
                "yolo_dist": float(m.group(2)),
                "gt_dist": float(m.group(3)),
                "det": [int(x) for x in m.group(4).split(",")],
                "gt": [int(x) for x in m.group(5).split(",")],
                "iou_text": m.group(6),
                "line": line,
            })
    return rows


def _result_files():
    files = sorted(glob.glob(os.path.join(RESULTS_DIR, "results_*.png.txt")))
    if not files:
        pytest.skip("reference result texts not available")
    return files


def test_reference_results_parse():
    files = _result_files()
    assert len(files) == 20
    total = sum(len(_parse(f)) for f in files)
    assert total == 77


def test_iou_matches_every_reference_line():
    from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix
    import jax.numpy as jnp

    checked = 0
    for path in _result_files():
        for row in _parse(path):
            iou = float(iou_2d_matrix(
                jnp.asarray([row["det"]], jnp.float64),
                jnp.asarray([row["gt"]], jnp.float64))[0, 0])
            assert f"{iou:.2f}" == row["iou_text"], (path, row["line"])
            checked += 1
    assert checked == 77


def test_pairing_and_result_lines_byte_exact():
    """Replaying each file's boxes through evaluate_image must reproduce the
    reference's det->gt assignment, CAR ID numbering, and -- with the
    recorded distances substituted -- the exact bytes of every file."""
    from lidar_object_detection_tpu.eval.kitti2d import evaluate_image

    dummy_K = np.asarray([[700.0, 0, 600], [0, 700, 180], [0, 0, 1]])
    for path in _result_files():
        rows = _parse(path)
        det_boxes = [r["det"] for r in rows]
        gt_boxes, gt_dists = [], []
        for r in rows:   # first-appearance order, deduplicated
            if r["gt"] not in gt_boxes:
                gt_boxes.append(r["gt"])
                gt_dists.append(r["gt_dist"])
        ev = evaluate_image(det_boxes, gt_boxes, gt_dists, dummy_K)
        assert ev.tp == len(rows), path
        # substitute the recorded distances (intrinsics are not shipped)
        for m, r in zip(ev.matches, rows):
            assert m.car_id == r["car_id"]
            assert [int(x) for x in m.det_box] == r["det"], path
            assert [int(x) for x in m.gt_box] == r["gt"], path
            m.yolo_distance = r["yolo_dist"]
            m.gt_distance = r["gt_dist"]
        got = "".join(line + "\n" for line in ev.result_lines())
        with open(path) as f:
            want = f.read()
        assert got == want, path
