"""Unit tests for the leave-one-frame-out threshold-CV selection logic
(examples/quality_threshold_cv.py) — the methodology behind the round-5
quality headline (76.47/78.27 held-out vs the reference's 74.48,
PERFORMANCE.md).  The expensive network/fusion machinery is not touched:
these feed hand-built per-car rows through the pure selection functions
and pin the properties the headline claim rests on."""

import os
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from quality_threshold_cv import cv_aggregate, select_threshold  # noqa: E402


@dataclass
class Row:
    frame: int
    inside_pct_eroded: float
    inside_pct_raw: float = 0.0
    inside_pct_diff: float = 0.0


def _rows(*triples):
    """triples: (frame, eroded%, count) -> count identical rows."""
    out = []
    for frame, pct, count in triples:
        out.extend(Row(frame, pct, pct - 5.0, 5.0 + 0.1 * i)
                   for i in range(count))
    return out


def test_argmax_uses_only_train_frames():
    # thr 0.9 is best on frame 2's rows, thr 0.5 on frame 1's; selection
    # restricted to train={1} must follow frame 1 and ignore frame 2
    rows_by_thr = {
        0.5: _rows((1, 90.0, 2), (2, 10.0, 2)),
        0.9: _rows((1, 20.0, 2), (2, 95.0, 2)),
    }
    assert select_threshold(rows_by_thr, [0.5, 0.9], {1}, "argmax", 2) == 0.5
    assert select_threshold(rows_by_thr, [0.5, 0.9], {2}, "argmax", 2) == 0.9


def test_guarded_rule_excludes_car_dropping_thresholds():
    # thr 0.99 scores higher but drops 3 of 5 matched cars on the train
    # frames; guard=2 must reject it, guard=3 may take it
    rows_by_thr = {
        0.5: _rows((1, 70.0, 5)),
        0.99: _rows((1, 99.0, 2)),
    }
    assert select_threshold(rows_by_thr, [0.5, 0.99], {1}, "guarded", 2) == 0.5
    assert select_threshold(rows_by_thr, [0.5, 0.99], {1}, "guarded", 3) == 0.99
    # argmax ignores the matched-count guard entirely
    assert select_threshold(rows_by_thr, [0.5, 0.99], {1}, "argmax", 2) == 0.99


def test_guarded_rule_falls_back_when_all_excluded():
    # every non-default threshold drops too many cars AND the default
    # frame has no train rows in some fold -> candidates fall back to the
    # full grid rather than erroring
    rows_by_thr = {
        0.5: _rows((1, 70.0, 5)),
        0.9: _rows((2, 80.0, 1)),
    }
    # train={2}: thr 0.5 has 0 rows there, 0.9 has 1 >= 0 - guard, both
    # candidates survive; best mean on train rows is 0.9
    assert select_threshold(rows_by_thr, [0.5, 0.9], {2}, "guarded", 2) == 0.9


def test_cv_holds_out_the_scored_frame():
    # Per-fold pick must come from the OTHER frames: frame 1's rows make
    # 0.5 look best, frame 2's make 0.9 look best -> fold 1 (trained on
    # frame 2) picks 0.9, fold 2 picks 0.5, i.e. the picks CROSS.  The
    # held-out aggregate then scores each frame at the crossed pick.
    rows_by_thr = {
        0.5: _rows((1, 90.0, 2), (2, 10.0, 2)),
        0.9: _rows((1, 20.0, 2), (2, 95.0, 2)),
    }
    res = cv_aggregate(rows_by_thr, [0.5, 0.9], [1, 2], "argmax", 2)
    assert res["fold_picks"] == {"1": 0.9, "2": 0.5}
    # frame 1 scored at 0.9 (20.0), frame 2 at 0.5 (10.0) -> mean 15.0;
    # the in-sample cherry-pick (90/95 -> 92.5) is NOT reachable
    assert res["mean_inside_pct_eroded"] == 15.0
    assert res["matched_cars"] == 4


def test_cv_counts_union_of_heldout_rows():
    # matched_cars follows the per-fold pick's row count for the held-out
    # frame (62-vs-63-vs-61 in the real run), not any single threshold's
    rows_by_thr = {
        0.5: _rows((1, 50.0, 3), (2, 50.0, 3)),
        0.9: _rows((1, 60.0, 1), (2, 60.0, 1)),
    }
    res = cv_aggregate(rows_by_thr, [0.5, 0.9], [1, 2], "argmax", 2)
    assert res["fold_picks"] == {"1": 0.9, "2": 0.9}
    assert res["matched_cars"] == 2
    assert res["mean_inside_pct_eroded"] == 60.0


def test_coverage_rule_requires_max_matched_cars():
    # config "g" keeps all 5 cars at a lower mean; "hi" scores higher but
    # drops 2 -- coverage must take "g", argmax must take "hi".  Keys are
    # strings: the rule must work for non-float config keys (the mixed
    # plain+guarded grid).
    rows_by_cfg = {
        "g": _rows((1, 75.0, 5)),
        "hi": _rows((1, 99.0, 3)),
    }
    assert select_threshold(rows_by_cfg, ["g", "hi"], {1},
                            "coverage", 2) == "g"
    assert select_threshold(rows_by_cfg, ["g", "hi"], {1},
                            "argmax", 2) == "hi"


def test_coverage_rule_breaks_ties_on_mean():
    # both configs keep every car on the train frames; coverage then
    # reduces to argmax among them
    rows_by_cfg = {
        "a": _rows((1, 70.0, 4)),
        "b": _rows((1, 80.0, 4)),
    }
    assert select_threshold(rows_by_cfg, ["a", "b"], {1},
                            "coverage", 2) == "b"
