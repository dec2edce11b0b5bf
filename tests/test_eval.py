import numpy as np
import pytest

from lidar_object_detection_tpu.eval import (
    CarStatistics,
    analyze_master_csv,
    append_to_master_csv,
    evaluate_image,
    frame_statistics,
    monocular_distance,
    summarize,
)


def test_frame_statistics_rows():
    total = np.array([100, 0, 50, 30])
    best = np.array([2, -1, -1, 5])
    inside = np.array([85, 0, 0, 25])
    matched = np.array([True, False, False, True])
    det_valid = np.array([True, True, True, True])
    vis = np.zeros(8, bool)
    vis[[0, 2, 5]] = True      # padded idx 2 -> filtered pos 1, 5 -> pos 2

    rows = frame_statistics(7, total, best, inside, matched, det_valid, vis)
    # car 1 skipped (0 points)
    assert [r.car_id for r in rows] == [0, 2, 3]
    r0 = rows[0]
    assert (r0.matched_bbox_id, r0.total_points, r0.points_inside_bbox,
            r0.points_outside_bbox) == (1, 100, 85, 15)
    assert r0.inside_percentage == 85.0 and r0.outside_percentage == 15.0
    r1 = rows[1]
    assert r1.matched_bbox_id == -1 and r1.points_inside_bbox == 0
    assert r1.inside_percentage == 0.0 and r1.outside_percentage == 100.0
    assert rows[2].matched_bbox_id == 2


def test_csv_roundtrip(tmp_path):
    path = str(tmp_path / "results" / "master_car_statistics.csv")
    rows = [CarStatistics(100, 0, 1, 2994, 2552, 442, 85.24, 14.76),
            CarStatistics(100, 1, -1, 55, 0, 55, 0.0, 100.0)]
    append_to_master_csv(rows, path, timestamp="2026-01-01T00:00:00")
    append_to_master_csv([CarStatistics(110, 0, 0, 500, 400, 100, 80.0, 20.0)],
                         path, timestamp="2026-01-01T00:00:01")
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("frame,car_id,matched_bbox_id,total_points")
    assert len(lines) == 4
    assert lines[1] == ("100,0,1,2994,2552,442,85.24,14.76,True,"
                        "2026-01-01T00:00:00")

    stats = analyze_master_csv(path)
    assert stats["total_frames"] == 2
    assert stats["total_detections"] == 3
    assert stats["matched"] == 2
    assert np.isclose(stats["avg_inside_pct"], (85.24 + 80.0) / 2)


def test_summarize():
    rows = [CarStatistics(1, 0, 0, 100, 80, 20, 80.0, 20.0),
            CarStatistics(1, 1, -1, 10, 0, 10, 0.0, 100.0)]
    s = summarize(rows)
    assert s["matched"] == 1 and s["unmatched"] == 1
    assert s["total_points"] == 100 and s["total_inside"] == 80
    assert np.isclose(s["avg_inside_pct"], 80.0)


def test_monocular_distance_oracle():
    """calculate_distance_aligned (ObjectDetection_final.py:80-112) parity."""
    K = np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]])
    bbox = [500, 180, 600, 260]
    h = 1.65
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    pts = [(500, 180), (600, 180), (600, 260), (500, 260),
           (550, 180), (600, 220), (550, 260), (500, 220)]
    dists = []
    for (u, v) in pts:
        Y = (h * fy) / (v - cy)
        X = (u - cx) * Y / fx
        dists.append(np.sqrt(X ** 2 + h ** 2 + Y ** 2))
    oracle = min(dists)
    got = float(monocular_distance(K, np.array([bbox], dtype=np.float64))[0])
    assert np.isclose(got, oracle, rtol=1e-12)


def test_evaluate_image_first_match_semantics():
    K = np.array([[700.0, 0, 600], [0, 700, 170], [0, 0, 1]])
    # det0 overlaps both gt0 and gt1 above threshold -> matches gt0 (first)
    det = [[100, 100, 200, 200], [400, 100, 500, 200], [900, 0, 950, 50]]
    gt = [[105, 105, 205, 205], [110, 100, 210, 200], [405, 105, 505, 205]]
    gt_dist = [10.0, 11.0, 20.0]
    ev = evaluate_image(det, gt, gt_dist, K)
    assert ev.tp == 2 and ev.fp == 1 and ev.fn == 1
    assert np.isclose(ev.precision, 2 / 3)
    assert np.isclose(ev.recall, 2 / 3)
    assert ev.matches[0].gt_distance == 10.0   # first match wins
    lines = ev.result_lines()
    assert lines[0].startswith("CAR ID: 1, YOLO distance:")
    assert "IoU Between YoloBB" in lines[0]


def test_erosion_study_join_and_analyze():
    from lidar_object_detection_tpu.eval.erosion_study import (
        analyze, join_runs)

    raw = [CarStatistics(100, 0, 1, 3000, 2550, 450, 85.0, 15.0),
           CarStatistics(100, 1, -1, 50, 0, 50, 0.0, 100.0),     # unmatched
           CarStatistics(110, 0, 2, 1000, 600, 400, 60.0, 40.0)]
    ero = [CarStatistics(100, 0, 1, 2930, 2530, 400, 86.35, 13.65),
           CarStatistics(110, 0, 2, 980, 640, 340, 65.31, 34.69),
           CarStatistics(110, 1, 3, 200, 150, 50, 75.0, 25.0)]   # only in ero

    rows = join_runs(raw, ero)
    assert len(rows) == 2          # joined on matched-in-both
    res = analyze(rows)
    assert res.mean_inside_pct_eroded == pytest.approx((86.35 + 65.31) / 2)
    assert res.mean_inside_pct_raw == pytest.approx((85.0 + 60.0) / 2)
    # improvements: (86.35-85)/85*100, (65.31-60)/60*100
    imp = ((86.35 - 85) / 85 * 100 + (65.31 - 60) / 60 * 100) / 2
    assert res.mean_pct_improvement == pytest.approx(imp)
    # the workbook's 5.87 is STDEV.S over the inside-PERCENTAGE
    # differences (Ero_vs_NoERo col C = A-B), not the point counts
    diffs = np.array([86.35 - 85.0, 65.31 - 60.0], float)
    assert res.std_inside_pct_diff == pytest.approx(diffs.std(ddof=1))


def test_erosion_study_end_to_end(kitti_root, tmp_path):
    from lidar_object_detection_tpu.eval.erosion_study import run_erosion_study

    res = run_erosion_study(kitti_root, frame_ids=[100],
                            output_csv=str(tmp_path / "study.csv"))
    assert res.rows, "expected joined matched cars on frame 100"
    s = res.summary()
    assert 0 < s["mean_inside_pct_eroded"] <= 100
    lines = (tmp_path / "study.csv").read_text().strip().split("\n")
    assert lines[0].startswith("frame,car_id,total_points_raw")
    assert len(lines) == len(res.rows) + 1


def test_format_summary_table():
    from lidar_object_detection_tpu.eval import format_summary_table

    rows = [CarStatistics(1, 0, 2, 100, 80, 20, 80.0, 20.0),
            CarStatistics(1, 1, -1, 10, 0, 10, 0.0, 100.0)]
    table = format_summary_table(rows)
    assert "SUMMARY STATISTICS" in table
    assert "Successfully matched: 1" in table
    assert "TOTAL" in table and "80.0" in table


def test_monocular_distance_bottom_center():
    from lidar_object_detection_tpu.eval.kitti2d import (
        monocular_distance_bottom_center)

    K = np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]])
    bbox = np.array([[500.0, 180, 600, 260]])
    h = 1.65
    u, v = 550.0, 260.0
    Z = h * K[1, 1] / (v - K[1, 2])
    X = (u - K[0, 2]) * Z / K[0, 0]
    oracle = np.sqrt(X ** 2 + h ** 2 + Z ** 2)
    got = float(monocular_distance_bottom_center(K, bbox)[0])
    assert np.isclose(got, oracle, rtol=1e-12)
