"""Held-out train/eval split plumbing for the PointPillars path
(pipelines.pointpillars.spatial_split / pack_frames / evaluate_bev's
matched_gt) -- the real-dataset gate replacing the 4-frame overfit gate."""

import numpy as np
import pytest

from lidar_object_detection_tpu.data.kitti360 import Kitti360Dataset
from lidar_object_detection_tpu.pipelines import pointpillars as pp

ROOT = "/root/reference/KITTI360_sample"


@pytest.fixture(scope="module")
def dataset():
    return Kitti360Dataset(ROOT)


def test_spatial_split_auto(dataset):
    s = pp.spatial_split(dataset, n_eval=2)
    usable = [f for f in dataset.frame_ids()
              if dataset.load_bboxes_exists(f)]
    assert sorted(s.train + s.eval) == sorted(usable)
    assert not set(s.train) & set(s.eval)
    assert len(s.eval) == 2
    # deterministic
    s2 = pp.spatial_split(dataset, n_eval=2)
    assert s2.eval == s.eval
    # the sample's most ego-separated pair is the east end of the loop
    assert s.eval == [2903, 2939]
    assert s.min_separation_m > 100.0


def test_spatial_split_explicit_and_leakage(dataset):
    s = pp.spatial_split(dataset, eval_frames=[100, 250])
    assert s.eval == [100, 250]
    assert 100 not in s.train and 250 not in s.train
    # leakage accounting: masks align with per-frame GT counts and sum to
    # the reported overlapped total; with a +-102.4 m grid over a ~500 m
    # loop some overlap is unavoidable but it must not be total
    assert set(s.overlap_masks) == {100, 250}
    total = sum(len(m) for m in s.overlap_masks.values())
    assert total == s.eval_gt_total > 0
    assert sum(int(m.sum()) for m in s.overlap_masks.values()) \
        == s.eval_gt_overlapped
    assert 0 < s.eval_gt_overlapped < s.eval_gt_total


def test_spatial_split_pinned_train(dataset):
    # post-hoc protocol: leakage/separation vs the ACTUAL (4-frame)
    # training set of a committed checkpoint, not usable-minus-eval
    gate = dataset.frame_ids()[:4]
    s = pp.spatial_split(dataset, eval_frames=[2903, 2939],
                         train_frames=gate)
    assert s.train == sorted(gate)
    assert s.eval == [2903, 2939]
    # a 4-frame train footprint can only shrink the leakage vs full train
    full = pp.spatial_split(dataset, eval_frames=[2903, 2939])
    assert s.eval_gt_total == full.eval_gt_total
    assert s.eval_gt_overlapped <= full.eval_gt_overlapped
    for f in (2903, 2939):
        assert not np.any(s.overlap_masks[f] & ~full.overlap_masks[f])
    # auto selection picks from frames outside the pinned train set and
    # measures separation against the pinned set only
    auto = pp.spatial_split(dataset, train_frames=gate, n_eval=2)
    assert not set(auto.eval) & set(gate)
    assert auto.train == sorted(gate) and auto.min_separation_m > 0
    with pytest.raises(ValueError):
        pp.spatial_split(dataset, eval_frames=[gate[0]], train_frames=gate)
    with pytest.raises(ValueError):
        pp.spatial_split(dataset, eval_frames=[2903], train_frames=[2717])


def test_spatial_split_rejects_bad_eval(dataset):
    with pytest.raises(ValueError):
        pp.spatial_split(dataset, eval_frames=[2717])   # no-bbox frame
    usable = [f for f in dataset.frame_ids()
              if dataset.load_bboxes_exists(f)]
    with pytest.raises(ValueError):
        pp.spatial_split(dataset, eval_frames=usable)   # nothing to train


def test_pack_frames_shapes():
    frames = [(np.ones((10, 4), np.float32), np.ones((3, 7), np.float32)),
              (np.ones((100, 4), np.float32), np.ones((70, 7), np.float32))]
    pts, pv, gt, gcls, gv = pp.pack_frames(frames, num_points=32, max_gt=64)
    assert pts.shape == (2, 32, 4) and gt.shape == (2, 64, 7)
    assert pv[0].sum() == 10 and pv[1].sum() == 32       # capped
    assert gv[0].sum() == 3 and gv[1].sum() == 64        # capped
    assert gcls.dtype == np.int32


def test_evaluate_bev_matched_gt_mask():
    # two GT boxes; one detection sitting exactly on gt[1]
    gt = np.zeros((4, 7), np.float32)
    gt[0] = [0, 0, 0, 1.6, 3.9, 1.5, 0.0]
    gt[1] = [10, 0, 0, 1.6, 3.9, 1.5, 0.0]
    gt_valid = np.array([True, True, False, False])
    det = {"boxes7": np.asarray([[10, 0, 0, 1.6, 3.9, 1.5, 0.0]],
                                np.float32),
           "valid": np.asarray([True])}
    r = pp.evaluate_bev(det, gt, gt_valid, iou_threshold=0.5, exact=True)
    assert r.matched == 1 and r.total_gt == 2
    np.testing.assert_array_equal(r.matched_gt,
                                  [False, True, False, False])
