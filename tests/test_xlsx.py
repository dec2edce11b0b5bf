"""Dependency-free xlsx export (eval/xlsx.py) -- the erosion workbook.

The reference artifact is ``master_car_statistics.csv.xlsx``; these tests
pin our writer's sheet names / layout / formulas against that file's
actual structure (unzipped) and round-trip the cell values.
"""

import re
import zipfile

import numpy as np
import pytest

from lidar_object_detection_tpu.eval.erosion_study import analyze, join_runs
from lidar_object_detection_tpu.eval.statistics import CarStatistics
from lidar_object_detection_tpu.eval.xlsx import (
    Formula, export_erosion_workbook, read_xlsx, write_xlsx)

REF_XLSX = "/root/reference/master_car_statistics.csv.xlsx"


def _study_fixture():
    raw = [CarStatistics(100, 0, 2, 2994, 2552, 442, 85.24, 14.76),
           CarStatistics(100, 1, 5, 557, 477, 80, 85.64, 14.36),
           CarStatistics(100, 2, -1, 40, 0, 40, 0.0, 100.0)]
    ero = [CarStatistics(100, 0, 2, 2926, 2526, 400, 86.33, 13.67),
           CarStatistics(100, 1, 5, 522, 466, 56, 89.27, 10.73),
           CarStatistics(100, 2, -1, 38, 0, 38, 0.0, 100.0)]
    rows = join_runs(raw, ero)
    return raw, ero, analyze(rows)


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, [("s1", [["a", 1, 2.5, None, Formula("SUM(B1:C1)", 3.5)],
                              [True, "x<y&z"]]),
                      ("s2", [[42]])])
    got = read_xlsx(path)
    assert set(got) == {"s1", "s2"}
    assert got["s1"]["A1"] == "a"
    assert got["s1"]["B1"] == 1
    assert got["s1"]["C1"] == 2.5
    assert "D1" not in got["s1"]
    assert got["s1"]["E1"] == 3.5           # cached formula value
    assert got["s1"]["A2"] == 1             # bool -> int
    assert got["s1"]["B2"] == "x<y&z"       # xml-escaped round trip
    assert got["s2"]["A1"] == 42
    # valid zip with the mandatory OOXML parts
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/worksheets/sheet1.xml"} <= names


def test_workbook_matches_reference_structure(tmp_path):
    raw, ero, study = _study_fixture()
    path = str(tmp_path / "wb.xlsx")
    export_erosion_workbook(path, raw, ero, study)
    got = read_xlsx(path)

    # identical sheet names (order included) vs the reference workbook
    with zipfile.ZipFile(REF_XLSX) as z:
        ref_names = re.findall(r'<sheet name="([^"]+)"',
                               z.read("xl/workbook.xml").decode())
    ours = list(got.keys())
    assert [n.strip() for n in ours] == [n.strip() for n in ref_names]

    master = got["master_car_statistics"]
    # row 2 headers, no-erosion block A..H and erosion block J..Q
    assert master["A2"] == "frame"
    assert master["F2"] == "inside_percentage_withoutErosion"
    assert master["J2"] == "frame"
    assert master["Q2"] == "is_matched"
    # frame-100 car-0 row mirrors the xlsx row-3 layout
    assert master["A3"] == 100 and master["C3"] == 2994
    assert master["D3"] == 2552 and master["F3"] == 85.24
    assert master["L3"] == 2926 and master["O3"] == 86.33
    assert master["H3"] == 1 and master["Q3"] == 1
    # unmatched car present with is_matched 0
    assert master["H5"] == 0

    vs = got["Ero_vs_NoERo"]
    assert vs["A2"] == 86.33 and vs["B2"] == 85.24
    assert vs["C2"] == pytest.approx(86.33 - 85.24)
    assert vs["E2"] == pytest.approx(study.std_inside_pct_diff)
    assert vs["G2"] == pytest.approx(study.mean_pct_improvement)

    stats = got["Ero_stats"]
    assert stats["A2"] == 2526 and stats["B2"] == 400
    assert stats["D2"] == 86.33
    assert stats["G2"] == pytest.approx(study.mean_inside_pct_eroded)

    # formulas present with the reference's expressions
    with zipfile.ZipFile(path) as z:
        vs_xml = z.read("xl/worksheets/sheet2.xml").decode()
        st_xml = z.read("xl/worksheets/sheet3.xml").decode()
    n = len(study.rows) + 1
    assert f"_xlfn.STDEV.S(C2:C{n})" in vs_xml
    assert f"AVERAGE(F2:F{n})" in vs_xml
    assert f"AVERAGE(D2:D{n})" in st_xml


def test_reference_aggregates_reproduce_from_reference_cells():
    """Our formulas, applied to the reference's own cell values, must give
    the published 74.48 / +7.67 / 5.87 -- proving the aggregation code
    (not just the writer) matches the workbook."""
    with zipfile.ZipFile(REF_XLSX) as z:
        vs = z.read("xl/worksheets/sheet2.xml").decode()
        st = z.read("xl/worksheets/sheet3.xml").decode()

    # direct extraction: A/B columns of Ero_vs_NoERo
    pat = re.compile(r'<c r="([A-Z]+)(\d+)"[^>]*>(?:<f>[^<]*</f>)?'
                     r'<v>([^<]*)</v></c>')
    A, B = {}, {}
    for col, row, val in pat.findall(vs):
        if col == "A":
            A[int(row)] = float(val)
        elif col == "B":
            B[int(row)] = float(val)
    rows = sorted(r for r in A if r in B and r >= 2)
    assert len(rows) == 61
    diff = np.array([A[r] - B[r] for r in rows])
    assert float(np.std(diff, ddof=1)) == pytest.approx(5.87, abs=0.005)
    imp = np.array([(A[r] - B[r]) / B[r] * 100.0 for r in rows])
    assert float(imp.mean()) == pytest.approx(7.667382257320186, abs=1e-9)

    D = {int(r): float(v) for c, r, v in pat.findall(st) if c == "D"}
    inside = np.array([D[r] for r in sorted(D) if r >= 2])
    assert len(inside) == 61
    assert float(inside.mean()) == pytest.approx(74.48131147540984,
                                                 abs=1e-9)


def test_run_erosion_study_writes_workbook(kitti_root, tmp_path):
    from lidar_object_detection_tpu.eval.erosion_study import (
        run_erosion_study)

    out = str(tmp_path / "wb.xlsx")
    res = run_erosion_study(kitti_root, frame_ids=[100], output_xlsx=out)
    got = read_xlsx(out)
    assert len(got["Ero_vs_NoERo"]) > 1
    assert got["Ero_vs_NoERo"]["G2"] == pytest.approx(
        res.mean_pct_improvement)
    assert got["Ero_stats"]["G2"] == pytest.approx(
        res.mean_inside_pct_eroded)
